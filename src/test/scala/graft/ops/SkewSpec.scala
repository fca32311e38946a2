package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed: 900 rows of key 1, a few of keys 2/3
  private def big = (Seq.fill(900)(1) ++ Seq(2, 2, 3)).zipWithIndex
    .map { case (k, i) => (k, i) }.toDF("k", "payload")
  private def small = Seq((1, "one"), (2, "two"), (4, "four")).toDF("k", "name")

  test("saltedJoin returns exactly the unsalted join result") {
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin left join preserves unmatched big-side rows") {
    val salted = Skew.saltedJoin(big, small, "k", salts = 4, joinType = "left")
    assert(salted.count() == big.count()) // key 3 survives with null name
    assert(salted.filter($"k" === 3 && $"name".isNull).count() == 1)
  }

  // Long-keyed twin for the targeted form (corpus join keys are BIGINT)
  private def bigL = (Seq.fill(900)(1L) ++ Seq(2L, 2L, 3L)).zipWithIndex
    .map { case (k, i) => (k, i) }.toDF("k", "payload")
  private def smallL = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")

  test("saltedJoinHot equals the plain join while salting only the hot key") {
    val plain = bigL.join(smallL, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoinHot(bigL, smallL, "k", hotKeys = Seq(1L), salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    // the non-hot side replicates ONLY the hot rows: 1 hot key × 8 salts
    // + 2 cold rows = 10 build rows (vs 24 under whole-side saltedJoin)
    val build = smallL.withColumn("__salts",
        org.apache.spark.sql.functions.when($"k".isInCollection(Seq(1L)),
          org.apache.spark.sql.functions.sequence(
            org.apache.spark.sql.functions.lit(0), org.apache.spark.sql.functions.lit(7)))
          .otherwise(org.apache.spark.sql.functions.array(org.apache.spark.sql.functions.lit(0))))
    assert(build.selectExpr("size(__salts)").collect().map(_.getInt(0)).sum == 10)
  }

  test("saltedJoinHot left join preserves unmatched big-side rows") {
    val salted = Skew.saltedJoinHot(bigL, smallL, "k", Seq(1L), salts = 4, joinType = "left")
    assert(salted.count() == bigL.count())
    assert(salted.filter($"k" === 3L && $"name".isNull).count() == 1)
  }

  test("saltedJoinHot with no hot keys is the plain join") {
    val plain = bigL.join(smallL, Seq("k")).select("k", "payload", "name")
    val salted = Skew.saltedJoinHot(bigL, smallL, "k", Nil, salts = 8)
      .select("k", "payload", "name")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("hotKeys detects the hub key and respects minShare") {
    val hot = Skew.hotKeys(bigL, "k", minShare = 0.5, sampleFraction = 1.0)
    assert(hot == Seq(1L))
    val none = Skew.hotKeys(bigL, "k", minShare = 0.999, sampleFraction = 1.0)
    assert(none.isEmpty)
  }

  test("saltedCount equals plain groupBy count") {
    val plain = big.groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(big, "k", salts = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
