package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify rows as added / removed / changed between two
  * versions of a keyed table. The pipeline-regression primitive a 100 TB
  * engine needs around reprocessing: "what did the new code change?"
  * answered as data, not as a diff of job logs.
  *
  * Scale shape: ONE full-outer shuffle join on the key set; the value
  * comparison rides the same join. [[snapshotDiff]] compares value structs
  * directly (null-safe, exact — the oracle-friendly form);
  * [[snapshotDiffHashed]] first collapses the non-key columns to an
  * 8-byte xxhash64, so wide rows shuffle 8 bytes of payload instead of
  * the row body — the 100 TB default, at the price of a 2⁻⁶⁴ per-pair
  * false-"unchanged" rate (collisions can only HIDE a change, never
  * invent one). */
object Diff {

  private def classified(o: DataFrame, n: DataFrame, keys: Seq[String]): DataFrame =
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__ov").isNull, "added")
          .when(col("__nv").isNull, "removed")
          .when(!(col("__ov") <=> col("__nv")), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(col) :+ col("change"): _*)

  /** Exact struct comparison. Requires identical column sets; `keys` must
    * uniquely identify rows in each snapshot (a keyed table's contract). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valCols = oldDf.columns.filterNot(keys.contains).sorted.toIndexedSeq
    require(valCols.nonEmpty, "no non-key columns to compare")
    val o = oldDf.select(keys.map(col) :+ struct(valCols.map(col): _*).as("__ov"): _*)
    val n = newDf.select(keys.map(col) :+ struct(valCols.map(col): _*).as("__nv"): _*)
    classified(o, n, keys)
  }

  /** Hash-compressed comparison (see object doc). Same output as
    * [[snapshotDiff]] modulo hash collisions — parity pinned in DiffSpec. */
  def snapshotDiffHashed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valCols = oldDf.columns.filterNot(keys.contains).sorted.toIndexedSeq
    require(valCols.nonEmpty, "no non-key columns to compare")
    val o = oldDf.select(keys.map(col) :+ xxhash64(valCols.map(col): _*).as("__ov"): _*)
    val n = newDf.select(keys.map(col) :+ xxhash64(valCols.map(col): _*).as("__nv"): _*)
    classified(o, n, keys)
  }
}
