package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Persisted PQ layout: init+ingest parity with a joint encode under the
  * frozen codebooks, served-layout recall through the refined query path,
  * and the refresh/recover staged-swap contract (shared with the IVF
  * layout via StagedSwap — the swap windows themselves are pinned in
  * StagedSwapSpec; here the index-shaped end state is). */
class PqIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  // the production operating point (PqIndex defaults): m=32 subspaces on
  // dim-64 — SimilaritySpec measures refined recall 1.0 there, vs ~0.6 at
  // m=8 where the coarser ADC drops true neighbors from the shortlist
  private val M = 32

  private def emb = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") =!= 0)
  private def query = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") === 0).select(col("embedding").as("qe"))

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-pqidx").toString + "/idx"
    val p = PqIndex.init(spark, emb.filter(col("vec_id") % 5 =!= 0), r, m = M)
    PqIndex.ingest(spark, emb.filter(col("vec_id") % 5 === 0), r, m = M)
    assert(p.root == r)
    r
  }

  private def codePairs(dir: String): Set[(Long, Seq[Byte])] =
    spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1))).toSet

  test("init+ingest == one joint encode under the frozen codebooks") {
    // encoding is a pure function of (vector, codebooks), so two
    // increments equal a joint encode bit for bit
    val served = codePairs(s"$root/codes")
    val joint = Similarity.pqEncode(emb,
      Similarity.loadPqCodebooks(spark, s"$root/codebooks"), M)
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1))).toSet
    assert(served == joint && served.size == emb.count())
  }

  test("served-layout refined topK: recall@10 >= 0.9 and exact-cosine ordering on the shortlist") {
    val got = PqIndex.topK(spark, root, emb, query, k = 10, m = M)
    val ids = got.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(emb, query, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ids & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall through the served PQ layout")
    // the re-rank is exact cosine: scores descend
    val scores = got.select("cosine").collect().map(_.getDouble(0)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("refresh retrains on the supplied float corpus and swaps; rows unchanged; recover heals a crashed swap") {
    import java.nio.file.{Files, Paths}
    val r = Files.createTempDirectory("graft-pqidx-refresh").toString + "/idx"
    PqIndex.init(spark, emb, r, m = M)
    val before = codePairs(s"$r/codes").map(_._1)
    PqIndex.refresh(spark, emb, r, m = M)
    assert(codePairs(s"$r/codes").map(_._1) == before)
    assert(!new java.io.File(s"$r.refresh-staging").exists() &&
      !new java.io.File(s"$r.refresh-retired").exists())
    // post-refresh the layout still serves: codebooks readable, topK sane
    assert(PqIndex.topK(spark, r, emb, query, k = 10, m = M).count() == 10)

    // crash window: live retired, complete staging -> recover promotes it
    val fresh = codePairs(s"$r/codes")
    Files.move(Paths.get(r), Paths.get(s"$r.refresh-retired"))
    PqIndex.init(spark, emb, s"$r.refresh-staging", m = M)
    assert(PqIndex.recover(spark, r))
    assert(codePairs(s"$r/codes") == fresh) // same corpus, same frozen-encode rows
    assert(!PqIndex.recover(spark, r)) // healed root: no-op
  }
}
