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
}
