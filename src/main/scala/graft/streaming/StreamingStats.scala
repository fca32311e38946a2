package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.io.Sinks
import graft.ops.Merge

/** Streaming ingest wired to incremental AGGREGATION maintenance: a
  * foreachBatch sink that folds every arriving micro-batch into the full
  * mergeable-state family of [[Merge]] — algebraic count/sum/min/max,
  * value-histogram quantiles, distinct sets, integer power-sum moments,
  * value frequencies, and (opt-in) a bottom-k-by-hash uniform audit
  * sample — persisted epoch by epoch as parquet. The
  * "p95 doc length + unique sources + top tokens, updated nightly"
  * dashboard, maintained without ever rescanning history (the batch
  * sibling of [[StreamingDedup]]; reference has no streaming at all).
  *
  * State layout under `stateDir` (all parquet, written with [[Sinks]]):
  * one `family/epoch=N/` snapshot per state family per epoch. Snapshots
  * are STATE-sized (key × value-cardinality for histograms, key count
  * for the rest), never data-sized, so a snapshot per epoch stays cheap
  * at any corpus scale.
  *
  * Epoch discipline (same as [[StreamingDedup]]): epoch N+1's snapshot
  * = merge(read-back epoch-N snapshot, batch partial) — merges always
  * serve from storage, so restart after any fully-written epoch resumes
  * exactly, and the ONLY driver scalar is the epoch counter recovered
  * from the directory listing. Batches must be row-disjoint (the
  * counting-state contract); the distinct state is additionally safe
  * under value overlap by construction.
  */
object StreamingStats {

  /** Column roles, fixed for the lifetime of a state directory.
    * `valueCol` feeds stats/quantile/moment states (moment contract:
    * integral values, |v| ≤ 55,000 — see [[Merge.partialMomentState]]);
    * `distinctCol` the distinct state; `freqCol` the frequency state.
    * `sampleIdCols` (optional) enables the uniform-sample family: a
    * per-key bottom-`sampleK`-by-xxhash64 audit sample maintained with
    * the same merge discipline ([[Merge.partialSampleState]] — the id
    * columns must make the priority injective per key). */
  final case class Config(stateDir: String, keys: Seq[String],
                          valueCol: String, distinctCol: String, freqCol: String,
                          sampleIdCols: Seq[String] = Nil, sampleK: Int = 64,
                          kmvK: Int = 0, bloomBits: Long = 0L, bloomHashes: Int = 2,
                          cmsWidth: Long = 0L, cmsDepth: Int = 3,
                          hllLgK: Int = 0) {
    require(kmvK == 0 || keys.size == 1,
      "the kmv family (cross-key overlap) needs exactly one key column")
  }

  /** The five always-on state families. */
  val Families: Seq[String] = Seq("stats", "quantile", "distinct", "moment", "freq")

  /** The families a given config maintains (+"sample" when id columns
    * are configured; +"kmv"/"bloom" when their sizes are set — both fold
    * the `distinctCol` values and, unlike the counting states, tolerate
    * value overlap across batches by construction; +"cms" when
    * `cmsWidth` is set — point frequency estimates over `freqCol` with
    * grid-sized state, the U22 counting sketch: row-disjoint batches
    * only, like freq/stats; +"hll" when `hllLgK` is set — the
    * production distinct path for unbounded-cardinality `distinctCol`
    * values, 2^lgK registers per key regardless of cardinality, overlap-
    * tolerant like distinct/kmv/bloom). */
  def families(cfg: Config): Seq[String] =
    Families ++
      (if (cfg.sampleIdCols.nonEmpty) Seq("sample") else Nil) ++
      (if (cfg.kmvK > 0) Seq("kmv") else Nil) ++
      (if (cfg.bloomBits > 0) Seq("bloom") else Nil) ++
      (if (cfg.cmsWidth > 0) Seq("cms") else Nil) ++
      (if (cfg.hllLgK > 0) Seq("hll") else Nil)

  private def bloomPos(cfg: Config) =
    Merge.bloomPositionsFast(col(cfg.distinctCol).cast("string"),
      cfg.bloomBits, cfg.bloomHashes)

  private def cmsPos(cfg: Config) =
    Merge.bloomPositionsFast(col(cfg.freqCol).cast("string"),
      cfg.cmsWidth, cfg.cmsDepth)

  private def snapDir(cfg: Config, family: String, epoch: Long) =
    s"${cfg.stateDir}/$family/epoch=$epoch"

  /** Parse an `epoch=N` snapshot dir name; None for anything else,
    * including a malformed suffix (`epoch=tmp` from an interrupted
    * write) — malformed names must never abort a GC sweep. */
  private[streaming] def epochOf(name: String): Option[Long] =
    if (name.startsWith("epoch=")) name.stripPrefix("epoch=").toLongOption
    else None

  /** Highest epoch with a written stats snapshot; -1 before init. The
    * stats family is written LAST in [[processBatch]], so its presence
    * marks the whole epoch complete (a crash mid-epoch leaves the
    * previous epoch authoritative and the next run overwrites the
    * partial one). */
  def latestEpoch(cfg: Config): Long = {
    val base = new java.io.File(s"${cfg.stateDir}/stats")
    Option(base.listFiles()).toSeq.flatten
      .flatMap(f => epochOf(f.getName))
      .foldLeft(-1L)(math.max)
  }

  private def partials(df: DataFrame, cfg: Config): Seq[(String, DataFrame)] =
    (if (cfg.sampleIdCols.nonEmpty)
      Seq("sample" -> Merge.partialSampleState(df, cfg.keys,
        Merge.samplePriorityFast(cfg.sampleIdCols), cfg.sampleK))
    else Nil) ++
    (if (cfg.kmvK > 0)
      Seq("kmv" -> Merge.kmvState(df, cfg.keys.head,
        Merge.samplePriorityFast(Seq(cfg.distinctCol)), cfg.kmvK))
    else Nil) ++
    (if (cfg.bloomBits > 0)
      Seq("bloom" -> Merge.bloomState(df, cfg.keys, bloomPos(cfg)))
    else Nil) ++
    (if (cfg.cmsWidth > 0)
      Seq("cms" -> Merge.cmsState(df, cfg.keys, cmsPos(cfg)))
    else Nil) ++
    (if (cfg.hllLgK > 0)
      Seq("hll" -> Merge.hllDistinctState(df, cfg.keys, cfg.distinctCol, cfg.hllLgK))
    else Nil) ++ Seq(
    "quantile" -> Merge.partialQuantileState(df, cfg.keys, cfg.valueCol),
    "distinct" -> Merge.partialDistinctState(df, cfg.keys, cfg.distinctCol),
    "moment"   -> Merge.partialMomentState(df, cfg.keys, cfg.valueCol),
    "freq"     -> Merge.partialFreqState(df, cfg.keys, cfg.freqCol),
    // stats last — it is the epoch-completeness marker (see latestEpoch)
    "stats"    -> Merge.partialStats(df, cfg.keys, cfg.valueCol))

  private def mergeFamily(cfg: Config, family: String,
                          states: Seq[DataFrame]): DataFrame = family match {
    case "stats"    => Merge.mergeStats(states, cfg.keys)
    case "quantile" => Merge.mergeQuantileStates(states, cfg.keys)
    case "distinct" => Merge.mergeDistinctStates(states)
    case "moment"   => Merge.mergeMomentStates(states, cfg.keys)
    case "freq"     => Merge.mergeFreqStates(states, cfg.keys)
    case "sample"   => Merge.mergeSampleStates(states, cfg.keys, cfg.sampleK)
    case "kmv"      => Merge.mergeKmvStates(states, cfg.keys.head, cfg.kmvK)
    case "bloom"    => Merge.mergeBloomStates(states, cfg.keys)
    case "cms"      => Merge.mergeCmsStates(states, cfg.keys)
    case "hll"      => Merge.mergeHllDistinctStates(states, cfg.keys)
  }

  /** Initialize state at epoch 0 from an (optionally empty) starting
    * archive — the snapshots land exactly as a batch job over the
    * archive would have left them. */
  def init(spark: SparkSession, cfg: Config, archive: DataFrame): Unit = {
    require(latestEpoch(cfg) < 0, s"state at ${cfg.stateDir} already initialized")
    // repartition(1): snapshots are state-sized; one file each, and an
    // EMPTY archive still writes a schema-bearing part file
    val src = archive.localCheckpoint()
    partials(src, cfg).foreach { case (family, st) =>
      Sinks.parquet(st.repartition(1), snapDir(cfg, family, 0))
    }
  }

  /** The foreachBatch body — also the batch-mode loop body (StreamStatsSpec
    * pins "stream replay == calling this once per batch"). Each family:
    * merge(epoch-N read-back, batch partial) → epoch N+1 snapshot. */
  def processBatch(spark: SparkSession, cfg: Config, batch: DataFrame): Unit = {
    val epoch = latestEpoch(cfg)
    require(epoch >= 0, s"state at ${cfg.stateDir} not initialized — call init() first")
    // snapshot the micro-batch once; it feeds every family's partial
    val src = batch.localCheckpoint()
    partials(src, cfg).foreach { case (family, part) =>
      val prev = spark.read.parquet(snapDir(cfg, family, epoch))
      Sinks.parquet(
        mergeFamily(cfg, family, Seq(prev, part)).repartition(1),
        snapDir(cfg, family, epoch + 1))
    }
  }

  /** Attach the sink to a stream carrying the configured columns. */
  def attach(stream: DataFrame, cfg: Config): DataStreamWriter[org.apache.spark.sql.Row] =
    // StreamGuard-admitted, like every attach funnel (see StreamingDedup)
    StreamGuard.admit(stream).writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => applyBatch(batch, cfg, id) }

  /** [[processBatch]] with crash-replay protection: counting states are
    * not idempotent, so a replayed micro-batch id is skipped via an
    * `_applied/` marker recorded after a successful fold (same contract
    * and marker-race caveat as
    * [[graft.pipeline.IncrementalIngest.applyBatch]]). */
  def applyBatch(batch: DataFrame, cfg: Config, batchId: Long): Unit =
    Replay.runOnce(batch.sparkSession, cfg.stateDir, batchId) {
      processBatch(batch.sparkSession, cfg, batch)
    }

  /** Latest snapshot of one state family, read back from storage. */
  def state(spark: SparkSession, cfg: Config, family: String): DataFrame = {
    require(families(cfg).contains(family),
      s"unknown state family '$family' (configured: ${families(cfg).mkString(",")})")
    val epoch = latestEpoch(cfg)
    require(epoch >= 0, s"state at ${cfg.stateDir} not initialized")
    spark.read.parquet(snapDir(cfg, family, epoch))
  }

  /** The dashboard: per-key count/sum/avg/min/max + distinct count +
    * variance/skew/kurtosis + wide quantile columns (q50, q95, …),
    * finalized from the latest snapshots. State-sized work throughout. */
  def dashboard(spark: SparkSession, cfg: Config,
                ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val k = cfg.keys
    val stats = Merge.finalizeStats(state(spark, cfg, "stats"), k)
    val dist = Merge.finalizeDistinct(state(spark, cfg, "distinct"), k)
    val mom = Merge.finalizeMoments(state(spark, cfg, "moment"), k)
      .drop("n", "mean_v") // cnt/avg_v already on the stats side
    val qLong = Merge.finalizeQuantiles(state(spark, cfg, "quantile"), k, ps)
    val qAggs = ps.map(p =>
      max(when(col("p") === p, col("q"))).as(s"q${math.round(p * 100)}"))
    val qWide = qLong.groupBy(k.map(col): _*).agg(qAggs.head, qAggs.tail: _*)
    stats.join(dist, k).join(mom, k).join(qWide, k)
  }

  /** Top-k frequent values per key from the latest frequency snapshot. */
  def topValues(spark: SparkSession, cfg: Config, k: Int): DataFrame =
    Merge.finalizeTopK(state(spark, cfg, "freq"), cfg.keys, k)

  /** The maintained per-key audit sample (priority-ranked), from the
    * latest sample snapshot — exactly the rows a bottom-k pass over
    * everything ever ingested would draw. */
  def auditSample(spark: SparkSession, cfg: Config): DataFrame =
    Merge.finalizeSample(state(spark, cfg, "sample"), cfg.keys)

  /** Cross-key distinct-overlap estimates from the latest KMV snapshot
    * (per key pair: l, matches, jaccard_est — see
    * [[Merge.kmvPairwiseJaccard]]). Sketch-sized work. */
  def overlapMatrix(spark: SparkSession, cfg: Config): DataFrame =
    Merge.kmvPairwiseJaccard(state(spark, cfg, "kmv"), cfg.keys.head, cfg.kmvK)

  /** Probe candidates against the latest Bloom snapshot: probes' columns
    * + `maybe_member`. Probes must carry the key columns and the
    * configured `distinctCol`. NO false negatives against everything
    * ever ingested (pinned in StreamStatsSpec). */
  def mightContain(spark: SparkSession, cfg: Config, probes: DataFrame): DataFrame =
    Merge.bloomProbe(state(spark, cfg, "bloom"), probes, cfg.keys, bloomPos(cfg))

  /** Point frequency estimates against the latest CMS snapshot: probes'
    * columns + `est_count` (min over depths; never undercounts the true
    * count of everything ever ingested). Probes must carry the key
    * columns and the configured `freqCol`. */
  def estimateCounts(spark: SparkSession, cfg: Config, probes: DataFrame): DataFrame =
    Merge.cmsEstimate(state(spark, cfg, "cms"), probes, cfg.keys, cmsPos(cfg))

  /** Per-key distinct-count ESTIMATES from the latest HLL snapshot —
    * the production path when `distinctCol`'s cardinality outgrows the
    * exact set state (state = 2^lgK registers per key, not one row per
    * value). */
  def estimateDistinct(spark: SparkSession, cfg: Config): DataFrame =
    Merge.finalizeHllDistinct(state(spark, cfg, "hll"), cfg.keys)

  /** Right-to-be-forgotten over EVERY state family, landing as the next
    * epoch (so time travel, [[retain]], and crash recovery see erasure
    * as one more fold). `forgotten` = the rows to erase (must be rows
    * previously folded in); `survivors` = the retained corpus — in the
    * composed ingest story, the post-forget `archive/` that
    * [[graft.pipeline.IncrementalIngest.forget]] maintains.
    *
    * Retractability policy, per family (the honest-capacity-planning
    * map of [[Merge]]'s retraction section, now EXECUTED not just
    * documented):
    *
    *  - `stats`     — abelian count/sum subtract; min/max repaired by
    *                  rescanning ONLY the dirty keys of `survivors`
    *                  ([[Merge.retractStats]]);
    *  - `quantile`/`freq` — per-bin subtraction, exact, no rescan
    *                  ([[Merge.retractHistState]]);
    *  - `moment`    — power sums subtract, exact, no rescan
    *                  ([[Merge.retractMomentState]]);
    *  - `cms`       — LINEAR sketch: cell-wise subtraction, exact from
    *                  state alone — the forgotten value's counts leave
    *                  every estimate ([[Merge.retractCmsState]]);
    *  - `distinct`  — deleted (key, v) pairs leave iff no survivor
    *                  carries them (dirty-pair sliver check,
    *                  [[Merge.retractDistinctState]]);
    *  - `sample`/`kmv` — bottom-k can't retract from state alone (no
    *                  recorded runner-up): dirty KEYS are re-sketched
    *                  from their `survivors` sliver
    *                  ([[Merge.retractBottomKState]]);
    *  - `bloom`/`hll` — IRREVERSIBLE by construction (bit-or /
    *                  register-max cannot subtract): rebuilt from the
    *                  full surviving corpus — the one family pair whose
    *                  erasure costs a corpus pass. Without this rebuild
    *                  a forgotten id keeps answering `maybe_member =
    *                  true` and its cardinality contribution persists —
    *                  a membership leak, not just staleness. Deployments
    *                  that cannot afford the pass per request should
    *                  batch erasures and rotate the epoch on a bounded
    *                  schedule (the documented staleness trade).
    *
    * Post-forget, EVERY family serves exactly as if the surviving
    * corpus had been folded from scratch (StreamStatsSpec pins each);
    * erasure of rows never folded in trips the retraction guards. */
  def forget(spark: SparkSession, cfg: Config,
             forgotten: DataFrame, survivors: DataFrame): Long = {
    val epoch = latestEpoch(cfg)
    require(epoch >= 0, s"state at ${cfg.stateDir} not initialized")
    val fg = forgotten.localCheckpoint()
    def cur(family: String) = spark.read.parquet(snapDir(cfg, family, epoch))
    val next: Seq[(String, DataFrame)] =
      (if (cfg.sampleIdCols.nonEmpty)
        Seq("sample" -> Merge.retractBottomKState(cur("sample"), fg, survivors, cfg.keys)(
          Merge.partialSampleState(_, cfg.keys,
            Merge.samplePriorityFast(cfg.sampleIdCols), cfg.sampleK)))
      else Nil) ++
      (if (cfg.kmvK > 0)
        Seq("kmv" -> Merge.retractBottomKState(cur("kmv"), fg, survivors, Seq(cfg.keys.head))(
          Merge.kmvState(_, cfg.keys.head,
            Merge.samplePriorityFast(Seq(cfg.distinctCol)), cfg.kmvK)))
      else Nil) ++
      (if (cfg.bloomBits > 0)
        Seq("bloom" -> Merge.bloomState(survivors, cfg.keys, bloomPos(cfg)))
      else Nil) ++
      (if (cfg.cmsWidth > 0)
        Seq("cms" -> Merge.retractCmsState(cur("cms"),
          Merge.cmsState(fg, cfg.keys, cmsPos(cfg)), cfg.keys))
      else Nil) ++
      (if (cfg.hllLgK > 0)
        Seq("hll" -> Merge.hllDistinctState(survivors, cfg.keys, cfg.distinctCol, cfg.hllLgK))
      else Nil) ++ Seq(
      "quantile" -> Merge.retractHistState(cur("quantile"),
        Merge.partialQuantileState(fg, cfg.keys, cfg.valueCol), cfg.keys),
      "distinct" -> Merge.retractDistinctState(cur("distinct"), fg, survivors,
        cfg.keys, cfg.distinctCol),
      "moment"   -> Merge.retractMomentState(cur("moment"),
        Merge.partialMomentState(fg, cfg.keys, cfg.valueCol), cfg.keys),
      "freq"     -> Merge.retractHistState(cur("freq"),
        Merge.partialFreqState(fg, cfg.keys, cfg.freqCol), cfg.keys),
      // stats last — the epoch-completeness marker, as in processBatch
      "stats"    -> Merge.retractStats(cur("stats"), fg, survivors,
        cfg.keys, cfg.valueCol))
    next.foreach { case (family, st) =>
      graft.io.Sinks.parquet(st.repartition(1), snapDir(cfg, family, epoch + 1))
    }
    epoch + 1
  }

  /** Epoch-snapshot GC: keep the newest `keepLast` epochs per family,
    * delete the rest. Snapshots are state-sized but one lands per family
    * per micro-batch — a month of minutely batches is ~43k dirs per
    * family without retention. Safe by construction: [[latestEpoch]]
    * reads the MAX stats epoch, so deleting OLD epochs never moves the
    * serving pointer; only epochs strictly below `latest − keepLast + 1`
    * go; a crash mid-GC leaves older orphans the next retain sweeps;
    * `_applied/` replay markers guard batch ids, not epochs, and are
    * untouched. Returns the dropped epoch ids. Hadoop FS API, so
    * local/HDFS/S3A share the code (the compactParquet discipline). */
  def retain(spark: SparkSession, cfg: Config, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val latest = latestEpoch(cfg)
    require(latest >= 0, s"state at ${cfg.stateDir} not initialized")
    val cutoff = latest - keepLast + 1
    val dropped = scala.collection.mutable.SortedSet.empty[Long]
    val conf = spark.sparkContext.hadoopConfiguration
    // enumerate ON-DISK family dirs, not families(cfg): a family later
    // disabled in the config (cms turned off) would otherwise never be
    // GC'd; config-unknown dirs (`_applied`, stray files) are skipped
    // because only `epoch=N` children are touched
    val root = new org.apache.hadoop.fs.Path(cfg.stateDir)
    val fs = root.getFileSystem(conf)
    val onDisk =
      if (fs.exists(root))
        fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
          .filterNot(_.startsWith("_")).toSeq
      else Seq.empty
    (onDisk ++ families(cfg)).distinct.foreach { family =>
      val base = new org.apache.hadoop.fs.Path(s"${cfg.stateDir}/$family")
      if (fs.exists(base)) fs.listStatus(base).foreach { st =>
        epochOf(st.getPath.getName).filter(_ < cutoff).foreach { ep =>
          dropped += ep
          fs.delete(st.getPath, true)
        }
      }
    }
    dropped.toSeq
  }
}
