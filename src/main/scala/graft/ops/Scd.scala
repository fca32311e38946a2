package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) support: build a versioned
  * interval table from an attribute changelog, and join facts to the
  * dimension version that was valid at each fact's own time — the
  * point-in-time ("as-was") join that keeps a backfilled training set
  * from leaking future attribute values into past examples.
  *
  * The reference has no dimension-versioning story (its pipeline
  * overwrites attributes in place, `src/data_processing/
  * spark_processor.py` — every historical row silently adopts today's
  * attributes); SCD-2 is the standard warehouse correction, and for an
  * LLM-data pipeline it is what makes "rebuild last year's corpus
  * exactly as it looked last year" possible.
  *
  * Scale design: [[buildScd2]] is one window over the CHANGELOG
  * (change-sized, not corpus-sized). [[pointInTime]] is an equi-join
  * on the dimension key followed by an interval filter — it inflates
  * each fact row by versions-per-key (dimension histories are
  * few-versions-per-key by construction) before filtering to exactly
  * one match, so the shuffle is fact-sized, never a range-join
  * explosion, and AQE broadcasts the dimension when it is small.
  */
object Scd {

  /** Build the SCD-2 interval table from a changelog with one row per
    * attribute version: `keys` identify the entity, `effCol` is the
    * instant the version took effect. When `seqCol` is given, the
    * highest sequence number wins among same-instant duplicates
    * (ingest replays); otherwise (keys, eff) must be unique. Output
    * carries every changelog column plus `valid_from` / `valid_to`
    * (null = still current) / `is_current`; intervals are
    * [valid_from, valid_to) half-open, so consecutive versions tile
    * time with no gaps or overlaps. */
  def buildScd2(changelog: DataFrame, keys: Seq[String], effCol: String,
                seqCol: Option[String] = None): DataFrame = {
    val kcols = keys.map(col)
    val deduped = seqCol match {
      case Some(sc) =>
        val w = Window.partitionBy((kcols :+ col(effCol)): _*).orderBy(col(sc).desc)
        changelog.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", sc)
      case None => changelog
    }
    val w = Window.partitionBy(kcols: _*).orderBy(col(effCol))
    deduped
      .withColumn("valid_from", col(effCol))
      .withColumn("valid_to", lead(col(effCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(effCol)
  }

  /** Incrementally fold a new changelog batch into an existing SCD-2
    * interval table: only the batch's keys are re-windowed (their old
    * versions are reconstructed from `valid_from` and unioned with the
    * batch), every other key passes through untouched — work ∝ the
    * affected keys' version history, never the dimension. A batch row
    * at an instant the key already has REPLACES that version
    * (correction/replay semantics, batch wins). Equivalence with a
    * from-scratch [[buildScd2]] over the concatenated changelog is
    * pinned in ScdSpec. */
  def updateScd2(existing: DataFrame, batch: DataFrame, keys: Seq[String],
                 effCol: String): DataFrame = {
    val affected = batch.select(keys.map(col): _*).distinct()
    existing.join(affected, keys, "leftanti")
      .unionByName(updateScd2Delta(existing, batch, keys, effCol))
  }

  /** The CHANGED-ROWS form of [[updateScd2]]: the affected keys' rebuilt
    * interval rows only (rows ∝ those keys' version history). Versions
    * never vanish under the update — a same-instant correction keeps its
    * `valid_from` — so applying these as upserts keyed
    * (keys…, valid_from) over the previous table reproduces
    * [[updateScd2]] exactly; that makes the persisted dimension a
    * delta-sized [[graft.io.Versioned]] artifact, the label-table
    * discipline applied to dimension history. */
  def updateScd2Delta(existing: DataFrame, batch: DataFrame, keys: Seq[String],
                      effCol: String): DataFrame = {
    val affected = batch.select(keys.map(col): _*).distinct()
    val oldVersions = existing.join(affected, keys, "leftsemi")
      .drop("valid_to", "is_current")
      .withColumnRenamed("valid_from", effCol)
      .withColumn("__gen", lit(0L))
    buildScd2(
      oldVersions.unionByName(batch.withColumn("__gen", lit(1L))),
      keys, effCol, seqCol = Some("__gen"))
  }

  /** Bootstrap a PERSISTED SCD-2 dimension from an initial changelog:
    * full v1 snapshot under `root` via [[graft.io.Versioned]]. */
  def init(changelog: DataFrame, root: String, keys: Seq[String],
           effCol: String): Unit =
    graft.io.Versioned.write(buildScd2(changelog, keys, effCol), root)

  /** Streaming SCD-2 maintenance: a dimension-changelog stream folds
    * into the persisted interval table via [[applyBatch]] — each
    * micro-batch lands as a DELTA version carrying only the affected
    * keys' rebuilt rows. The consumer's [[pointInTime]] reads
    * `Versioned.read(root)`; time travel answers "join against the
    * dimension as we believed it last week". */
  def attach(stream: DataFrame, root: String, keys: Seq[String],
             effCol: String, checkpointEvery: Int = 16):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, id: Long) =>
        applyBatch(batch, root, id, keys, effCol, checkpointEvery)
    }

  /** The foreachBatch body, crash-replay-guarded like every state sink
    * ([[graft.streaming.Replay.runOnce]]): an interval rebuild is not
    * idempotent across the delta-version append, so replayed ids skip.
    * Checkpoints the delta chain back to a full snapshot every
    * `checkpointEvery` versions (the [[graft.pipeline.IncrementalIngest]]
    * read-bound/GC contract). */
  def applyBatch(batch: DataFrame, root: String, batchId: Long,
                 keys: Seq[String], effCol: String,
                 checkpointEvery: Int = 16): Unit =
    graft.streaming.Replay.runOnce(batch.sparkSession, root, batchId) {
      val spark = batch.sparkSession
      if (!batch.isEmpty) {
        val existing = graft.io.Versioned.read(spark, root).localCheckpoint()
        val delta = updateScd2Delta(existing, batch, keys, effCol)
          .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
        graft.io.Versioned.writeDelta(delta, root,
          keys = keys :+ "valid_from")
        if (graft.io.Versioned.chainLength(spark, root) >= checkpointEvery)
          graft.io.Versioned.checkpoint(spark, root)
      }
    }

  /** Point-in-time (as-was) left join: each fact row picks up the
    * dimension version whose [valid_from, valid_to) interval contains
    * the fact's `factTimeCol`; facts before the entity's first version
    * (or with no entity at all) keep null dimension columns. `keys`
    * maps fact column → dimension column. Half-open intervals
    * guarantee at most one match per fact row — no fan-out. */
  def pointInTime(fact: DataFrame, dim: DataFrame, keys: Seq[(String, String)],
                  factTimeCol: String): DataFrame = {
    val d = dim.drop("is_current")
    val keyCond = keys.map { case (f, dk) => fact(f) === d(dk) }.reduce(_ && _)
    val cond = keyCond &&
      d("valid_from") <= fact(factTimeCol) &&
      (d("valid_to").isNull || fact(factTimeCol) < d("valid_to"))
    fact.join(d, cond, "left")
      .drop(keys.map(_._2): _*)
      .drop("valid_from", "valid_to")
  }
}
