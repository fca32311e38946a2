package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(pairs: Seq[(Long, Long)], iters: Int = 20): Map[Long, Double] =
    Graph.pageRank(pairs.toDF("id1", "id2"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("star graph: the hub outranks every leaf; ranks sum to node count") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = ranksOf(star)
    assert((1L to 4L).forall(l => r(0L) > r(l)))
    assert(math.abs(r.values.sum - 5.0) < 1e-9) // conserved per iteration
    // leaves are symmetric — identical ranks
    assert((2L to 4L).forall(l => math.abs(r(l) - r(1L)) < 1e-12))
  }

  test("path graph: middle node outranks the endpoints, symmetric ends match") {
    val path = Seq((1L, 2L), (2L, 3L))
    val r = ranksOf(path)
    assert(r(2L) > r(1L) && r(2L) > r(3L))
    assert(math.abs(r(1L) - r(3L)) < 1e-12)
  }

  test("rank is partitioning-independent and deterministic across runs") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = ranksOf(pairs)
    val b = Graph.pageRank(pairs.toDF("id1", "id2").repartition(7), iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    // exact decimal sums aren't used here (pure double), but the join/agg
    // tree is value-deterministic on this scale; allow only float dust
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-9) }
  }

  test("fixed-point ranks track the double ranks within truncation dust") {
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (2L, 3L), (5L, 6L))
    val fp = Graph.pageRankFixedPoint(pairs.toDF("id1", "id2"), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dbl = ranksOf(pairs, iters = 10)
    assert(fp.keySet == dbl.keySet)
    // each DIV truncation loses < 1 picorank per edge per round; 10 rounds
    // of damped accumulation stay well under 1e-9 of a unit rank
    fp.foreach { case (k, v) =>
      assert(math.abs(v / 1e12 - dbl(k)) < 1e-9, s"node $k: fp=$v dbl=${dbl(k)}")
    }
    // deterministic and partitioning-independent: BIT-equal, not approximate
    val again = Graph.pageRankFixedPoint(
      pairs.toDF("id1", "id2").repartition(7), iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == fp)
  }

  test("near-dup graph: every cluster's top-ranked member is in that cluster's pair set") {
    val pairs = Dedup.minhashNearDup(
      graft.model.Tables.documents(spark, TestSpark.sfDir))
    val ranked = Graph.pageRank(pairs, iters = 10)
    assert(ranked.count() > 0)
    val ids = pairs.select(col("id1").as("id"))
      .unionByName(pairs.select(col("id2").as("id")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ranked.collect().map(_.getLong(0)).toSet == ids)
  }
}
