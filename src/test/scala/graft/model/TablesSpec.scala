package graft.model

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the widen-cache staleness stamp (Tables.widened): the cache key
  * must re-derive when the dataset changes at the same path — including
  * the partitioned-DIRECTORY layout where the root's getFileStatus is
  * blind to rewrites inside partition subdirs (a dir's getLen is 0 and
  * its mtime moves only on direct-child add/remove — r13 advice). */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("directory-layout stamp: growth inside a partition subdir re-derives the widen decision") {
    val root = Files.createTempDirectory("graft-tables").toString
    val path = s"$root/docs.parquet"
    // tiny partitioned dataset: two partition subdirs, well under the
    // 64 KB widen floor -> first decision is "don't widen"
    Seq((1L, "a", 0), (2L, "b", 1)).toDF("id", "v", "p")
      .write.partitionBy("p").parquet(path)
    val before = Tables.widened(spark, root, "docs")
    val target = spark.sparkContext.defaultParallelism
    assert(before.rdd.getNumPartitions < target,
      s"tiny table should not widen to $target partitions")
    // grow the dataset INSIDE an existing partition subdir: the root dir's
    // direct children are unchanged (p=0 and p=1 both exist), so a
    // (mtime,len)-of-root stamp would keep the stale "don't widen" entry
    spark.range(20000).select(col("id"),
      lpad(col("id").cast("string"), 32, "x").as("v"))
      .coalesce(1).write.mode("append").parquet(s"$path/p=1")
    val after = Tables.widened(spark, root, "docs")
    assert(after.rdd.getNumPartitions == target,
      s"grown table (now past the widen floor) still read with " +
        s"${after.rdd.getNumPartitions} partitions — stale widen-cache entry?")
  }
}
