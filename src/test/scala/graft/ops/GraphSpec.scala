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

  private def tset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Naive all-wedge 3-way join — reference semantics for [[Graph.triangles]]. */
  private def naiveTriangles(pairs: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val e = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    (for {
      (a, b) <- e; (b2, c) <- e if b2 == b; if e.contains((a, c))
    } yield (a, b, c)).toSet
  }

  test("triangles: hand-checked shapes — K4 has 4, a square has 0, K3 plus tail has 1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tset(Graph.triangles(k4.toDF("id1", "id2"))) ==
      Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tset(Graph.triangles(square.toDF("id1", "id2"))).isEmpty)
    val k3tail = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L))
    assert(tset(Graph.triangles(k3tail.toDF("id1", "id2"))) == Set((1L, 2L, 3L)))
  }

  test("triangles: duplicates, reversed orientation, and self-loops are absorbed; each triangle exactly once") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 2L), (1L, 2L))
    val got = Graph.triangles(messy.toDF("id1", "id2")).collect()
    assert(got.length == 1 && (got.head.getLong(0), got.head.getLong(1), got.head.getLong(2)) == (1L, 2L, 3L))
  }

  test("triangles: degree-ordered plan equals the naive wedge join on a random graph, incl. a hub") {
    val rnd = new scala.util.Random(42)
    // 40-node random graph + a 30-edge hub at node 0 (the skew the
    // orientation exists to survive)
    val pairs = (Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      (1L to 30L).map(i => (0L, i))).filter { case (a, b) => a != b }
    assert(tset(Graph.triangles(pairs.toDF("id1", "id2"))) == naiveTriangles(pairs))
  }

  test("triangleCounts: per-node participation sums to 3× triangle count; degree matches") {
    val k4tail = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 9L))
    val got = Graph.triangleCounts(k4tail.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (3L, 3L) && got(2L) == (3L, 3L) && got(3L) == (3L, 3L))
    assert(got(4L) == (3L, 4L)) // in all 3 of its K4 triangles, deg 4 with the tail
    assert(got(9L) == (0L, 1L)) // tail node: no triangles, left-join keeps it
    assert(got.values.map(_._1).sum == 4 * 3)
  }

  test("kCore: cascading peel — triangle + pendant collapse, the clique-side survives") {
    // triangle 1-2-3 with pendant 4, bridged by 1-5 to a K4 {5,6,7,8}:
    // peeling deg<3 removes 2 and 4, the cascade then takes 1 and 3,
    // and only the K4 survives with core degree 3 each
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 5L),
      (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L)
    ).toDF("id1", "id2")
    val got = Graph.kCore(edges, k = 3, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 3L, 6L -> 3L, 7L -> 3L, 8L -> 3L))
    // k=1 keeps everything (every endpoint has degree >= 1)
    assert(Graph.kCore(edges, k = 1, iters = 3).count() == 8)
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

  test("linkCandidates: path and square shapes score hand-checked Jaccards; adjacent pairs excluded") {
    // path a-b-c: (a,c) share {b}; both endpoints have degree 1 → J = 1/(1+1-1) = 1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val got = Graph.linkCandidates(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set((1L, 3L, 1L, 1.0)))
    // square a-b-c-d-a: diagonals share 2 neighbors, all degrees 2 → J = 2/(2+2-2) = 1;
    // the four existing edges never appear
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id1", "id2")
    val got2 = Graph.linkCandidates(square)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got2 == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
    // K3: every pair adjacent → no candidates
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2")
    assert(Graph.linkCandidates(k3).count() == 0)
  }

  test("linkCandidates: maxDegree drops hub-centered wedges (bounded work, documented recall trade)") {
    // star: 5 leaves through center 9 → 10 leaf-pair candidates, all via the hub
    val star = (1L to 5L).map(i => (9L, i)).toDF("id1", "id2")
    assert(Graph.linkCandidates(star).count() == 10)
    assert(Graph.linkCandidates(star, maxDegree = 4).count() == 0)
    // duplicate + reversed edges don't inflate common counts
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val got = Graph.linkCandidates(noisy)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 1L)))
  }
}
