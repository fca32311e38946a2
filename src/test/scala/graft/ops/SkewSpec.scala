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

  test("saltedCount equals plain groupBy count") {
    val plain = big.groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(big, "k", salts = 8).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
