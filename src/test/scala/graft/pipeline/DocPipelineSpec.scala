package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DocPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val longText = (1 to 60).map(i => s"w$i").mkString(" ")

  test("cleanCorpus: quality filter, min-id exact dedup, higher-id near-dup drop") {
    val docs = Seq(
      (1L, longText, "en", "s1"),                       // survives
      (2L, longText, "en", "s2"),                       // exact dup of 1 → dropped
      (3L, "the the the the", "en", "s3"),              // all-stopword short → quality 0
      (4L, longText.replace("w60", "x60"), "en", "s4"), // near-dup of 1 → dropped (higher id)
      (5L, (1 to 60).map(i => s"z$i").mkString(" "), "de", "s5")) // distinct → survives
      .toDF("doc_id", "text", "lang", "source")

    val out = DocPipeline.cleanCorpus(docs, minQuality = 60.0, nearDupThr = 0.8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList.sortBy(_._1)
    assert(out.map(_._1) == List(1L, 5L))
    assert(out.head._3 == 60L) // n_tokens carried through
  }

  test("cleanCorpus plumbs maxDf into the near-dup stage (cap changes the outcome)") {
    // two long docs share ONLY a ubiquitous boilerplate block (a hot
    // shingle source); their unique halves are unrelated. Uncapped, the
    // shared block pushes Jaccard over threshold → doc 2 dropped as a
    // near-dup. With a tiny df-cap the boilerplate shingles are excluded
    // → no pair → both survive. If maxDf ever stops reaching
    // Dedup.minhashNearDup, the capped run loses a doc and this fails.
    val boiler = (1 to 57).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3", "en", "s1"),
      (2L, s"$boiler v1 v2 v3", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val uncapped = DocPipeline.cleanCorpus(docs).count()
    val capped = DocPipeline.cleanCorpus(docs, maxDf = Some(1L)).count()
    assert(uncapped == 1L, s"expected boilerplate overlap to drop doc 2, kept $uncapped")
    assert(capped == 2L, s"expected the df-cap to suppress the boilerplate pair, kept $capped")
  }

  test("cleanCorpus: the drop-set anti-join carries NO static broadcast hint") {
    // the drop set is 10-30% of the corpus at web dup rates — a forced
    // broadcast() OOMs the driver at exactly the scale the pipeline is
    // for. The strategy must be left to AQE (runtime-sized decision).
    // Only the ROOT of the anti-join's right side matters: hints deeper
    // inside (minhashNearDup's candidate-sliver semi-join) are sized by
    // construction and stay.
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    val plan = DocPipeline.cleanCorpus(docs).queryExecution.analyzed
    val anti = plan.collectFirst { case j: Join if j.joinType == LeftAnti => j }
    assert(anti.nonEmpty, "expected the drop-set anti-join in the plan")
    assert(!anti.get.right.isInstanceOf[ResolvedHint],
      s"drop side is statically hinted: ${anti.get.right.nodeName}")
  }

  test("cleanCorpus is idempotent: re-cleaning the survivors drops nothing") {
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    val once = DocPipeline.cleanCorpus(docs)
    val surviving = docs.join(once.select("doc_id"), "doc_id")
    assert(DocPipeline.cleanCorpus(surviving).count() == once.count())
  }
}
