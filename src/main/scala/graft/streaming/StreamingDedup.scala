package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.io.Sinks
import graft.ops.Dedup

/** Streaming ingest wired to incremental near-dup dedup: a foreachBatch
  * sink that runs every arriving micro-batch of documents through
  * [[Dedup.incrementalNearDupCapped]] against the PERSISTED LSH band
  * index, and maintains the persisted shingle-df table epoch by epoch —
  * the daily-increment shape the dedup scaladocs describe, wired end to
  * end (reference has no streaming at all; this extends the §2.10
  * north-star family).
  *
  * State layout under `stateDir` (all parquet, all written with
  * [[Sinks]] — the artifacts round-trip through storage, never live only
  * in memory):
  *
  *   - `corpus/`     append-only (doc_id, text, epoch) — the archive
  *   - `index/`      append-only (doc_id, band, bh, epoch) — LSH band
  *                   index rows of every ingested doc
  *   - `shingle_df/epoch=N/` per-epoch snapshot of the (shingle, df)
  *                   table (vocabulary-sized, not corpus-sized)
  *   - `pairs/`      append-only (id1, id2, jaccard, epoch) — every
  *                   near-dup pair discovered, tagged with the epoch
  *                   whose batch surfaced it
  *
  * Epoch discipline (the [[Dedup.shingleDfTable]] contract): batch N's
  * df contribution is merged into the table FIRST, the epoch-N snapshot
  * is written, and then BOTH the cap on the batch substrate and the cap
  * on the batch's new index rows are served from the READ-BACK epoch-N
  * snapshot — index and batch never disagree on which shingles are hot,
  * and the increment equals the equivalent batch-mode loop bit for bit
  * (pinned in StreamingSpec).
  *
  * Scale shape per micro-batch: work ∝ batch + its collisions (the
  * [[Dedup.incrementalNearDup]] guarantee — the archive is re-read only
  * for candidate docs); state growth per batch is batch-sized corpus/
  * index appends plus one vocabulary-sized df snapshot. No driver-side
  * state: the ONLY driver scalar is the epoch counter, recovered from
  * the directory listing (restart-safe).
  */
object StreamingDedup {

  /** Tuning knobs, fixed for the lifetime of a state directory (an index
    * probed with different k/numPerm/bands/rows than it was built with
    * is garbage — same caller contract as [[Dedup.incrementalNearDup]]). */
  final case class Config(stateDir: String, maxDf: Long = Dedup.DefaultMaxDf,
                          k: Int = 3, numPerm: Int = 64,
                          bands: Int = 16, rows: Int = 4, thr: Double = 0.8)

  private def dfSnapshotDir(cfg: Config, epoch: Long) =
    s"${cfg.stateDir}/shingle_df/epoch=$epoch"

  /** Highest epoch with a written shingle-df snapshot; -1 before init. */
  def latestEpoch(cfg: Config): Long = {
    val base = new java.io.File(s"${cfg.stateDir}/shingle_df")
    Option(base.listFiles()).toSeq.flatten
      .flatMap(f => StreamingStats.epochOf(f.getName))
      .foldLeft(-1L)(math.max)
  }

  /** Initialize state at epoch 0 from an (optionally empty) starting
    * archive. The corpus/index/df-table triple lands on disk exactly as
    * a batch pipeline would have left it: index rows capped against the
    * archive's own df table. */
  def init(spark: SparkSession, cfg: Config, archive: DataFrame): Unit = {
    require(latestEpoch(cfg) < 0, s"state at ${cfg.stateDir} already initialized")
    // repartition(1) so an EMPTY archive still writes a schema-bearing
    // part file (zero-partition writes leave nothing to read back)
    val docs = archive.select(col("doc_id"), col("text"))
      .repartition(1).localCheckpoint()
    val dfTable = Dedup.shingleDfTable(Dedup.shingleDF(docs, k = cfg.k))
    Sinks.parquet(dfTable.repartition(1), dfSnapshotDir(cfg, 0))
    val dfBack = spark.read.parquet(dfSnapshotDir(cfg, 0))
    Sinks.parquet(
      Dedup.lshBandIndexCapped(docs, dfBack, cfg.maxDf,
        cfg.k, cfg.numPerm, cfg.bands, cfg.rows)
        .withColumn("epoch", lit(0L)).repartition(1),
      s"${cfg.stateDir}/index")
    Sinks.parquet(docs.withColumn("epoch", lit(0L)).repartition(1),
      s"${cfg.stateDir}/corpus")
  }

  /** The foreachBatch body — also the batch-mode loop body (the parity
    * StreamingSpec pins is exactly "stream replay == calling this once
    * per batch"). Steps, in self-read-hazard-free order:
    *  1. merge the batch's shingle-df contribution, write epoch N+1's
    *     snapshot, read it back (every cap below serves from storage);
    *  2. run the batch against the persisted corpus+index, append the
    *     discovered pairs;
    *  3. append the batch's index rows (capped against the SAME epoch
    *     snapshot) and the batch docs themselves. */
  def processBatch(spark: SparkSession, cfg: Config, batch: DataFrame): Unit = {
    val epoch = latestEpoch(cfg)
    require(epoch >= 0, s"state at ${cfg.stateDir} not initialized — call init() first")
    // snapshot the micro-batch once: it feeds the df merge, the dedup
    // probe, and two appends — a lazy stream batch would re-read the
    // source per consumer
    val docs = batch.select(col("doc_id"), col("text")).localCheckpoint()
    val merged = Dedup.mergeShingleDf(Seq(
      spark.read.parquet(dfSnapshotDir(cfg, epoch)),
      Dedup.shingleDfTable(Dedup.shingleDF(docs, k = cfg.k))))
    Sinks.parquet(merged.repartition(1), dfSnapshotDir(cfg, epoch + 1))
    val dfBack = spark.read.parquet(dfSnapshotDir(cfg, epoch + 1))

    val corpus = spark.read.parquet(s"${cfg.stateDir}/corpus").select("doc_id", "text")
    val index = spark.read.parquet(s"${cfg.stateDir}/index").select("doc_id", "band", "bh")
    val pairs = Dedup.incrementalNearDupCapped(docs, corpus, index, dfBack,
      cfg.maxDf, cfg.k, cfg.numPerm, cfg.bands, cfg.rows, cfg.thr)
    Sinks.parquet(pairs.withColumn("epoch", lit(epoch + 1)),
      s"${cfg.stateDir}/pairs", mode = "append")

    Sinks.parquet(
      Dedup.lshBandIndexCapped(docs, dfBack, cfg.maxDf,
        cfg.k, cfg.numPerm, cfg.bands, cfg.rows)
        .withColumn("epoch", lit(epoch + 1)),
      s"${cfg.stateDir}/index", mode = "append")
    Sinks.parquet(docs.withColumn("epoch", lit(epoch + 1)),
      s"${cfg.stateDir}/corpus", mode = "append")
  }

  /** Attach the sink to a document stream (columns doc_id, text). Start
    * with `.start()` / await as usual; each micro-batch runs
    * [[applyBatch]]. */
  def attach(stream: DataFrame, cfg: Config): DataStreamWriter[org.apache.spark.sql.Row] =
    // admission-guarded like every batch pipeline write (StreamGuard is
    // PlanGuard's ingest twin): an unbounded-state shape upstream of the
    // sink is refused BEFORE start(), not discovered at 3am
    StreamGuard.admit(stream).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => applyBatch(batch, cfg, id) }

  /** [[processBatch]] with CRASH-REPLAY protection: on recovery Spark
    * replays the last un-committed micro-batch, and an epoch-append fold
    * is not idempotent — the replay would land as a duplicate epoch.
    * Applied batch ids are recorded as `_applied/` markers after a
    * successful fold and a marked id is skipped (marker not atomic with
    * the multi-artifact fold — the standard foreachBatch trade, same as
    * [[graft.pipeline.IncrementalIngest.applyBatch]]). */
  def applyBatch(batch: DataFrame, cfg: Config, batchId: Long): Unit =
    Replay.runOnce(batch.sparkSession, cfg.stateDir, batchId) {
      processBatch(batch.sparkSession, cfg, batch)
    }

  /** Every near-dup pair discovered so far (id1, id2, jaccard, epoch). */
  def pairs(spark: SparkSession, cfg: Config): DataFrame = {
    val dir = new java.io.File(s"${cfg.stateDir}/pairs")
    if (dir.isDirectory) spark.read.parquet(dir.toString)
    else spark.emptyDataFrame
  }

  /** Shingle-df snapshot GC: keep the newest `keepLast` `shingle_df/`
    * epochs, delete the rest (corpus/index/pairs are append-only DATA —
    * they never get GC'd here; only the vocab-sized per-epoch df
    * snapshots are redundant history). Same safety argument as
    * [[StreamingStats.retain]]: the serving pointer is the MAX epoch,
    * old deletions never move it, crash mid-GC only leaves orphans for
    * the next sweep. Returns the dropped epoch ids. */
  def retain(spark: SparkSession, cfg: Config, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val latest = latestEpoch(cfg)
    require(latest >= 0, s"state at ${cfg.stateDir} not initialized")
    val cutoff = latest - keepLast + 1
    val base = new org.apache.hadoop.fs.Path(s"${cfg.stateDir}/shingle_df")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dropped = scala.collection.mutable.SortedSet.empty[Long]
    if (fs.exists(base)) fs.listStatus(base).foreach { st =>
      StreamingStats.epochOf(st.getPath.getName).filter(_ < cutoff).foreach { ep =>
        dropped += ep
        fs.delete(st.getPath, true)
      }
    }
    dropped.toSeq
  }
}
