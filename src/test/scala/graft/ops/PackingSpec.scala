package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docsToks = graft.model.Tables.documents(spark, TestSpark.sfDir)
    .select(col("doc_id"), TextOps.tokenCount(col("text")).as("toks"))

  test("distributed prefix sum equals the naive single-partition global window") {
    val naive = docsToks.withColumn("__prior",
      coalesce(sum("toks").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "__prior")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Packing.prefixSum(docsToks, "doc_id", "toks")
      .select("doc_id", "__prior")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == naive)
  }

  test("prefix sum is partition-count independent") {
    val a = Packing.prefixSum(docsToks, "doc_id", "toks", partitions = 3)
      .select("doc_id", "__prior").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Packing.prefixSum(docsToks, "doc_id", "toks", partitions = 17)
      .select("doc_id", "__prior").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("packByBudget: every shard but the last opens under budget; ids are contiguous from 0") {
    val packed = Packing.packByBudget(docsToks, "doc_id", "toks", budget = 2000L)
    val shards = packed.groupBy("shard_id")
      .agg(sum("toks").as("total"), count(lit(1)).as("n"))
      .orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = shards.map(_._1)
    assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    // docs are contiguous in doc_id order, so the cumulative token total
    // through shard i equals the prior-sum of shard i+1's first doc, which
    // by construction is >= (i+1)*budget — every shard except the last
    // accumulated past its own boundary
    val cumTotals = shards.map(_._2).scanLeft(0L)(_ + _).tail
    cumTotals.init.zipWithIndex.foreach { case (cum, i) =>
      assert(cum >= (i + 1) * 2000L,
        s"shard $i closed at $cum tokens, before its ${(i + 1) * 2000L} boundary")
    }
    assert(packed.count() == docsToks.count())
  }

  test("packByBudget rejects a non-positive budget") {
    intercept[IllegalArgumentException](
      Packing.packByBudget(docsToks, "doc_id", "toks", budget = 0L))
  }

  test("composite-key packing yields a quality-monotone curriculum across shards") {
    val docs = graft.model.Tables.documents(spark, graft.TestSpark.sfDir)
      .select(col("doc_id"),
        TextOps.qualityScore(col("text"), TextOps.corpusStopwords).as("quality"),
        TextOps.tokenCount(col("text")).as("toks"))
      .withColumn("negq", -col("quality"))
    val shards = Packing.packByBudget(docs, Seq("negq", "doc_id"), "toks",
        budget = 2000L, partitions = 0)
      .groupBy("shard_id")
      .agg(min("quality").as("minq"), max("quality").as("maxq"))
      .orderBy("shard_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(shards.length > 1)
    // descending-quality order ⇒ shard i's min quality >= shard i+1's max
    shards.sliding(2).foreach {
      case Array((_, minPrev, _), (sid, _, maxNext)) =>
        assert(minPrev >= maxNext,
          s"curriculum broken at shard $sid: prev min $minPrev < next max $maxNext")
      case _ => ()
    }
  }

  test("chunkByTokens: full coverage, stride overlap, tail length, short-doc totality") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, size 4 stride 3
      (2L, "a b"),                                    // shorter than size → 1 chunk
      (3L, "x y z w"),                                // exactly size → 1 chunk
      (4L, "a b c d e")                               // short tail chunk
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: ceil((10-4)/3)+1 = 3 chunks — the last start (6) reaches the
    // end, so no redundant 9-start tail is emitted
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._3).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L))
    // consecutive chunks overlap by size - stride = 1 token
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b", 2L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "x y z w", 4L)))
    assert(out.filter(_._1 == 4L).toSeq ==
      Seq((4L, 0L, "a b c d", 4L), (4L, 1L, "d e", 2L)))
    // coverage: concatenating each chunk's first `stride` tokens (all of
    // the last chunk) in chunk order reconstructs every doc exactly
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.groupBy(_._1).foreach { case (id, chunks) =>
      val ordered = chunks.sortBy(_._2)
      val rebuilt = ordered.zipWithIndex.flatMap { case ((_, _, txt, _), i) =>
        val toks = txt.split(" ")
        if (i == ordered.length - 1) toks else toks.take(3)
      }.mkString(" ")
      assert(rebuilt == texts(id), s"doc $id not covered: $rebuilt")
    }
    // zero-shuffle claim: the plan has no Exchange
    val plan = Packing.chunkByTokens(docs, size = 4, stride = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking plan shuffles:\n$plan")
  }

  test("chunkByTokens rejects bad size/stride") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Packing.chunkByTokens(docs, 0, 1))
    intercept[IllegalArgumentException](Packing.chunkByTokens(docs, 4, 0))
    intercept[IllegalArgumentException](Packing.chunkByTokens(docs, 4, 5))
  }
}
