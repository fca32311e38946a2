package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Temperature-scaled source mixture: quota arithmetic, the low-resource
  * floor, draw determinism, and the α=1 natural-distribution identity. */
class MixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // skewed corpus: big 100 docs, mid 25, tiny 4
  private def corpus = (
    (1 to 100).map(i => (i.toLong, "big")) ++
    (101 to 125).map(i => (i.toLong, "mid")) ++
    (126 to 129).map(i => (i.toLong, "tiny"))
  ).toDF("doc_id", "source")

  test("quotas follow n^alpha: sqrt-weights upsample small sources vs natural share") {
    val q = Mixture.temperatureQuotas(corpus, budget = 60L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(q.keySet == Set("big", "mid", "tiny"))
    // integer replica of the engine arithmetic
    val w = Map("big" -> 100, "mid" -> 25, "tiny" -> 4).map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    }
    val totalW = w.values.sum
    q.foreach { case (s, (n, quota)) =>
      assert(quota == math.max(60L * w(s) / totalW, 1L),
        s"quota at $s: got $quota (n=$n)")
    }
    // temperature flattens: tiny's quota share (2/17 of weight) exceeds its
    // 4/129 natural share; big's share shrinks below 100/129
    val shares = q.view.mapValues(_._2.toDouble / q.values.map(_._2).sum).toMap
    assert(shares("tiny") > 4.0 / 129)
    assert(shares("big") < 100.0 / 129)
  }

  test("alpha=1 reproduces the natural distribution; every source keeps >= 1 doc") {
    val q1 = Mixture.temperatureQuotas(corpus, budget = 129L, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // w = n·10⁶ exactly, so quota = budget·n div N = n at budget = N
    assert(q1 == Map("big" -> 100L, "mid" -> 25L, "tiny" -> 4L))
    // a 3-doc budget still keeps one doc of every source (the floor)
    val qFloor = Mixture.temperatureQuotas(corpus, budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(qFloor.values.forall(_ >= 1L))
    assert(qFloor("tiny") == 1L)
  }

  test("draw is deterministic, quota-bounded, and hash-order independent of partitioning") {
    val once = Mixture.temperatureMixture(corpus, budget = 60L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val again = Mixture.temperatureMixture(corpus.repartition(13), budget = 60L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(once == again, "mixture draw depends on partitioning")
    val bycnt = once.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val quotas = Mixture.temperatureQuotas(corpus, budget = 60L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    bycnt.foreach { case (s, c) =>
      assert(c == math.min(quotas(s), corpus.filter(col("source") === s).count()),
        s"draw at $s took $c docs, quota ${quotas(s)}")
    }
    // production xxhash64 draw: same quota counts, different order key
    val prod = Mixture.temperatureMixture(corpus, budget = 60L,
      hashOrder = Some(xxhash64(col("doc_id"))))
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prod == bycnt)
  }

  test("guards: positive budget, alpha in (0,1]") {
    intercept[IllegalArgumentException](Mixture.temperatureQuotas(corpus, 0L))
    intercept[IllegalArgumentException](Mixture.temperatureQuotas(corpus, 10L, alpha = 0.0))
    intercept[IllegalArgumentException](Mixture.temperatureQuotas(corpus, 10L, alpha = 1.5))
  }
}
