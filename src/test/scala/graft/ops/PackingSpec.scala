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
}
