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

  private def leftIv = Seq(
    ("u1", 1L, 0.0, 10.0), ("u1", 2L, 12.0, 20.0), ("u2", 3L, 5.0, 15.0),
    ("u2", 4L, 30.0, 31.0), ("u1", 5L, 9.0, 12.5), ("u3", 6L, 7.0, 7.0))
    .toDF("lk", "lid", "llo", "lhi")
  private def rightIv = Seq(
    ("u1", 11L, 9.5, 13.0), ("u1", 12L, 20.0, 25.0), ("u2", 13L, 14.0, 40.0),
    ("u3", 14L, 0.0, 50.0), ("u2", 15L, 15.0, 15.0))
    .toDF("rk", "rid", "rlo", "rhi")

  private def ovPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("interval overlap: hand-checked half-open keyed semantics, empty intervals match nothing") {
    val got = ovPairs(RangeJoin.intervalOverlap(leftIv, rightIv,
      "llo", "lhi", "rlo", "rhi", 4.0, keys = Seq("lk" -> "rk"))).toSet
    // (1,11): [0,10)∩[9.5,13) per u1; (2,11): [12,20)∩[9.5,13);
    // (5,11): [9,12.5)∩[9.5,13); (3,13): [5,15)∩[14,40) per u2;
    // (4,13): [30,31)∩[14,40); NOT (2,12): [12,20) vs [20,25) touch at
    // the open edge; NOT (6,14): left interval [7,7) is empty;
    // NOT (3,15): right empty
    assert(got == Set((1L, 11L), (2L, 11L), (5L, 11L), (3L, 13L), (4L, 13L)))
  }

  test("interval overlap: exactly-once emission and naive parity for any bucket width") {
    val naive = ovPairs(RangeJoin.intervalOverlapNaive(leftIv, rightIv,
      "llo", "lhi", "rlo", "rhi", keys = Seq("lk" -> "rk"))).sorted
    for (w <- Seq(0.5, 1.0, 4.0, 16.0, 1000.0)) {
      val got = ovPairs(RangeJoin.intervalOverlap(leftIv, rightIv,
        "llo", "lhi", "rlo", "rhi", w, keys = Seq("lk" -> "rk")))
      // Seq (not Set) comparison: a pair spanning several shared cells
      // must be emitted exactly once, not deduped away by the assertion
      assert(got.sorted == naive, s"width $w diverged or duplicated pairs")
    }
  }

  test("interval overlap: keyless form equals naive on real data (order fulfillment windows)") {
    def win(k: String, lo: String, hi: String) =
      graft.model.Tables.orders(spark, TestSpark.sfDir)
        .filter(col("o_orderkey") % 11 === 0) // sliver: keyless form is quadratic by design
        .select(col("o_orderkey").as(k),
          // the fixture's o_orderdate is TIMESTAMP_NTZ — cast to date
          // explicitly so datediff resolves instead of nulling out
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).cast("double").as(lo))
        .withColumn(hi, col(lo) + (col(k) % 30 + 1).cast("double"))
    val l = win("k1", "lo1", "hi1"); val r = win("k2", "lo2", "hi2")
    val grid = ovPairs(RangeJoin.intervalOverlap(l, r, "lo1", "hi1", "lo2", "hi2", 16.0)
      .filter(col("k1") < col("k2")).withColumnRenamed("k1", "lid").withColumnRenamed("k2", "rid")).sorted
    val naive = ovPairs(RangeJoin.intervalOverlapNaive(l, r, "lo1", "hi1", "lo2", "hi2")
      .filter(col("k1") < col("k2")).withColumnRenamed("k1", "lid").withColumnRenamed("k2", "rid")).sorted
    assert(grid == naive && grid.nonEmpty)
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
