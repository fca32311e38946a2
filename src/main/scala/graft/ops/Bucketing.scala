package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the "minimize shuffles" lever for
  * repeated fact⋈fact joins (brief: "repartition()/bucketing for
  * co-located joins").
  *
  * Writing both join sides bucketed (and sorted) on the join key lets
  * Spark plan a sort-merge join with NO Exchange on either side — at
  * 100 TB that deletes the dominant cost of every recurring join on that
  * key. The price is paid once at write time (the bucketing shuffle).
  * Requires equal bucket counts on both sides;
  * spark.sql.sources.bucketing.enabled is on by default.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table at `path`.
    * Buckets = hash(key) % n, one file group per bucket. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key. The physical plan
    * must show SortMergeJoin with no Exchange (asserted in BucketingSpec
    * — not just eyeballed). */
  def cooperativeJoin(spark: SparkSession, leftTable: String, rightTable: String,
                      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
