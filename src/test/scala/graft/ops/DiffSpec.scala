package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DiffSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "a", Some(1.0)),
    (2L, "b", Some(2.0)),
    (3L, "c", Some(3.0)),
    (5L, "e", None: Option[Double])).toDF("k", "name", "v")

  private def newSnap = Seq(
    (2L, "b", Some(2.5)),      // changed
    (3L, "c", Some(3.0)),      // unchanged
    (4L, "d", Some(4.0)),      // added
    (5L, "e", None: Option[Double])).toDF("k", "name", "v") // null == null: unchanged

  test("snapshotDiff classifies added/removed/changed; null-safe on value columns") {
    val got = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("null → value and value → null are changes, not matches") {
    val o = Seq((1L, Some(1.0)), (2L, None: Option[Double])).toDF("k", "v")
    val n = Seq((1L, None: Option[Double]), (2L, Some(2.0))).toDF("k", "v")
    val got = Diff.snapshotDiff(o, n, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("hashed variant matches the exact variant on the same snapshots") {
    val exact = Diff.snapshotDiff(oldSnap, newSnap, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val hashed = Diff.snapshotDiffHashed(oldSnap, newSnap, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hashed == exact)
  }

  test("schema mismatch and key-only schemas are rejected loudly") {
    val o = Seq((1L, "a")).toDF("k", "x")
    val n = Seq((1L, "a")).toDF("k", "y")
    intercept[IllegalArgumentException](Diff.snapshotDiff(o, n, Seq("k")))
    val keyOnly = Seq(Tuple1(1L)).toDF("k")
    intercept[IllegalArgumentException](Diff.snapshotDiff(keyOnly, keyOnly, Seq("k")))
  }
}
