package graft.ops

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asofBackward: greatest right ts <= left ts per key; inclusive at equality") {
    val purchases = Seq(
      (1L, 100L, ts(15)), (2L, 100L, ts(20)), (3L, 100L, ts(5)),
      (4L, 200L, ts(50))).toDF("id", "k", "t")
    val clicks = Seq((100L, ts(10)), (100L, ts(20)), (300L, ts(1))).toDF("k", "ct")

    val got = AsOf.asofBackward(purchases, clicks, "k", "t", "ct")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.getTime / 1000)).toMap

    assert(got(1L) == Some(10L)) // click@10 <= purchase@15
    assert(got(2L) == Some(20L)) // equality is inclusive
    assert(got(3L) == None)      // no click yet
    assert(got(4L) == None)      // key 200 has no clicks at all
  }

  test("asofBackward preserves every left row and all left columns") {
    val l = Seq((1L, 9L, ts(1), "x")).toDF("id", "k", "t", "payload")
    val r = Seq((9L, ts(1))).toDF("k", "ct")
    val out = AsOf.asofBackward(l, r, "k", "t", "ct")
    assert(out.columns.toSeq == Seq("id", "k", "t", "payload", "asof_ts"))
    assert(out.count() == 1)
  }

  test("asofBackward payload: matched row's columns ride along; ties pick the struct-greatest payload") {
    val purchases = Seq((1L, 100L, ts(15)), (2L, 100L, ts(5))).toDF("id", "k", "t")
    val clicks = Seq(
      (100L, ts(10), "chA"), (100L, ts(10), "chB"), // tie at ts(10)
      (100L, ts(2), "chZ")).toDF("k", "ct", "channel")
    val got = AsOf.asofBackward(purchases, clicks, "k", "t", "ct", "bk",
      payloadCols = Seq("channel"))
    assert(got.columns.toSeq == Seq("id", "k", "t", "bk", "channel"))
    val m = got.collect().map(r => r.getLong(0) ->
      (Option(r.getTimestamp(3)).map(_.getTime / 1000), Option(r.getString(4)))).toMap
    assert(m(1L) == (Some(10L), Some("chB"))) // tie: greatest payload, deterministically
    assert(m(2L) == (Some(2L), Some("chZ")))  // payload tracks the matched row, not the max
    // payload-name collision fails fast
    intercept[IllegalArgumentException](AsOf.asofBackward(
      purchases, clicks.withColumnRenamed("channel", "id"), "k", "t", "ct",
      payloadCols = Seq("id")))
  }

  test("asofForward: smallest right ts >= left ts per key; inclusive at equality") {
    val clicks = Seq(
      (1L, 100L, ts(15)), (2L, 100L, ts(20)), (3L, 100L, ts(30)),
      (4L, 200L, ts(50))).toDF("id", "k", "t")
    val purchases = Seq((100L, ts(20)), (100L, ts(25)), (300L, ts(99))).toDF("k", "pt")

    val got = AsOf.asofForward(clicks, purchases, "k", "t", "pt")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.getTime / 1000)).toMap

    assert(got(1L) == Some(20L)) // purchase@20 >= click@15
    assert(got(2L) == Some(20L)) // equality is inclusive
    assert(got(3L) == None)      // nothing after 30 for key 100
    assert(got(4L) == None)      // key 200 has no purchases at all
  }

  test("asofForward tolerance nulls matches beyond the bound, keeps those at it") {
    val clicks = Seq((1L, 7L, ts(10)), (2L, 7L, ts(90))).toDF("id", "k", "t")
    val purchases = Seq((7L, ts(40)), (7L, ts(200))).toDF("k", "pt")
    val got = AsOf.asofForward(clicks, purchases, "k", "t", "pt",
      toleranceSeconds = Some(30L))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3)).map(_.getTime / 1000)).toMap
    assert(got(1L) == Some(40L)) // gap 30 == tolerance: kept (inclusive)
    assert(got(2L) == None)      // next is @200, gap 110 > 30: nulled
  }

  test("asofNearest picks the closer side; exact ties prefer backward; one-sided rows fall through") {
    val l = Seq((1L, 9L, ts(100)), (2L, 9L, ts(10)), (3L, 9L, ts(500)), (4L, 8L, ts(50)))
      .toDF("id", "k", "t")
    val r = Seq((9L, ts(90)), (9L, ts(103)), (9L, ts(5)), (9L, ts(15))).toDF("k", "rt")
    val got = AsOf.asofNearest(l, r, "k", "t", "rt")
      .collect().map(x => x.getLong(0) -> Option(x.getTimestamp(3)).map(_.getTime / 1000)).toMap
    assert(got(1L) == Some(103L)) // fw gap 3 < bk gap 10
    assert(got(2L) == Some(5L))   // bk gap 5 == fw gap 5: tie → backward
    assert(got(3L) == Some(103L)) // nothing after: backward fallback
    assert(got(4L) == None)       // key 8 has no right rows
  }

  test("asofForward mirrors the brute-force per-row definition on real data") {
    import org.apache.spark.sql.functions._
    val ev = graft.model.Tables.events(spark, TestSpark.sfDir)
      .filter(col("user_id").isNotNull && col("user_id") % 7 === 0)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), date_trunc("second", col("ts")).as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("second", col("ts")).as("pts"))
    val got = AsOf.asofForward(c, p, "user_id", "cts", "pts", "nxt")
      .select("event_id", "nxt").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val brute = c.join(p.withColumnRenamed("user_id", "pu"),
        col("user_id") === col("pu") && col("pts") >= col("cts"), "left")
      .groupBy("event_id").agg(min(col("pts")).as("nxt"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got == brute && got.nonEmpty)
    assert(got.values.exists(_.isDefined))
  }
}
