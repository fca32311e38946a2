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
    val untouched = existing.join(affected, keys, "leftanti")
    val oldVersions = existing.join(affected, keys, "leftsemi")
      .drop("valid_to", "is_current")
      .withColumnRenamed("valid_from", effCol)
      .withColumn("__gen", lit(0L))
    val rebuilt = buildScd2(
      oldVersions.unionByName(batch.withColumn("__gen", lit(1L))),
      keys, effCol, seqCol = Some("__gen"))
    untouched.unionByName(rebuilt)
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
