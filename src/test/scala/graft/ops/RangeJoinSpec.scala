package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 99.5), (6L, -3.0))
    .toDF("pid", "v")
  private def intervals = Seq(
    ("a", 0.0, 10.0),    // catches 1, 2 (10.0 excluded: hi-exclusive)
    ("b", 5.0, 30.0),    // catches 2, 3, 4
    ("c", 90.0, 100.0),  // catches 5
    ("d", -10.0, 0.0))   // catches 6 (0.0 goes to "a": lo-inclusive)
    .toDF("band", "lo", "hi")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("grid join matches hand-checked inclusive-lo/exclusive-hi semantics") {
    val got = pairs(RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 7.0))
    assert(got == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "b"),
      (5L, "c"), (6L, "d")))
  }

  test("grid join equals the naive nested-loop join for any bucket width") {
    val naive = pairs(RangeJoin.pointInIntervalNaive(points, intervals, "v", "lo", "hi"))
    for (w <- Seq(0.5, 1.0, 7.0, 10.0, 1000.0)) {
      assert(pairs(RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", w)) == naive,
        s"width $w diverged")
    }
  }

  test("grid join parity on real data: order prices vs per-priority bands") {
    val orders = graft.model.Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val bands = graft.model.Tables.orders(spark, TestSpark.sfDir)
      .groupBy(col("o_orderpriority").as("band"))
      .agg((avg("o_totalprice") * 0.8).as("lo"), (avg("o_totalprice") * 1.2).as("hi"))
    val grid = RangeJoin.pointInInterval(orders, bands, "v", "lo", "hi", 10000.0)
      .groupBy("band").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val naive = RangeJoin.pointInIntervalNaive(orders, bands, "v", "lo", "hi")
      .groupBy("band").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(grid == naive && grid.nonEmpty)
  }
}
