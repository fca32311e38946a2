package graft.pipeline

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.VectorIndex
import graft.streaming.StreamingStats

/** The composed right-to-be-forgotten cascade ([[Gdpr.cascade]]): one
  * erasure request reaches the ingest artifacts, EVERY maintained state
  * family — including the irreversible bloom/hll sketches, the round-9
  * membership-leak gap — and the vector index, leaving each artifact as
  * if the forgotten docs had never been ingested. */
class GdprSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
  private def emb = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") =!= 0)

  // the state rows the stats family was fed with: integral doc length
  // (|v| ≤ 55k moment contract holds for the fixture corpus)
  private def prep(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("source"), col("lang"),
      col("n_chars").cast("long").as("len"))

  test("cascade: erasure reaches ingest artifacts, every state family, and the vector index") {
    val root = Files.createTempDirectory("graft-gdpr").toString
    val ingestRoot = s"$root/ingest"
    val vecRoot = s"$root/vec"

    // system of record + dedup artifacts
    val p = IncrementalIngest.init(spark, docs.filter(col("doc_id") % 3 =!= 2),
      ingestRoot)
    IncrementalIngest.ingest(spark, docs.filter(col("doc_id") % 3 === 2), ingestRoot)

    // maintained state over the SAME archive rows (incl. the
    // irreversible families), folded in two epochs like production
    val cfg = StreamingStats.Config(s"$root/stats", keys = Seq("source"),
      valueCol = "len", distinctCol = "doc_id", freqCol = "lang",
      sampleIdCols = Seq("doc_id"), sampleK = 4,
      bloomBits = 8192L, cmsWidth = 512L, hllLgK = 12)
    StreamingStats.init(spark, cfg, prep(docs.filter(col("doc_id") % 3 =!= 2)))
    StreamingStats.processBatch(spark, cfg, prep(docs.filter(col("doc_id") % 3 === 2)))

    // vector index keyed by the same id space (the composed contract)
    VectorIndex.init(spark, emb, vecRoot, k = 4)

    val forgetIds = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    val res = Gdpr.cascade(spark, forgetIds,
      ingestRoot = Some(ingestRoot),
      stats = Some((cfg, prep)),
      vectorRoot = Some(vecRoot))

    val survivors = docs.join(forgetIds, Seq("doc_id"), "left_anti")

    // leg 1 — ingest artifacts: archive purged, nothing forgotten remains
    assert(res.ingest.exists(_.forgotten == forgetIds.count()))
    val archive = spark.read.parquet(p.archive)
    assert(archive.join(forgetIds, Seq("doc_id"), "left_semi").isEmpty)
    assert(archive.count() == survivors.count())

    // leg 2 — state families: every family == a from-scratch fold over
    // the survivors; the bloom/hll sketches no longer answer for the
    // forgotten ids beyond what a never-saw-them state would
    assert(res.statsEpoch.contains(2L))
    val fresh = cfg.copy(stateDir = s"$root/stats_rebuild")
    StreamingStats.init(spark, fresh, prep(survivors))
    StreamingStats.families(cfg).filterNot(_ == "hll").foreach { f =>
      val got = StreamingStats.state(spark, cfg, f)
        .collect().map(_.toSeq: Seq[Any]).toSet
      val want = StreamingStats.state(spark, fresh, f)
        .collect().map(_.toSeq: Seq[Any]).toSet
      assert(got == want, s"family '$f' != from-scratch fold over survivors")
    }
    def hllEst(c: StreamingStats.Config) =
      StreamingStats.estimateDistinct(spark, c)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hllEst(cfg) == hllEst(fresh))
    def probe(c: StreamingStats.Config) =
      StreamingStats.mightContain(spark, c,
        docs.select("source", "doc_id").distinct())
        .collect().map(_.toSeq: Seq[Any]).toSet
    assert(probe(cfg) == probe(fresh))

    // leg 3 — vector index: forgotten ids gone, survivors intact
    assert(res.vectorIndexTouched)
    val idx = spark.read.parquet(s"$vecRoot/index")
    assert(idx.join(forgetIds.withColumnRenamed("doc_id", "vec_id"),
      Seq("vec_id"), "left_semi").isEmpty)
    val expectVecs = emb.join(forgetIds.withColumnRenamed("doc_id", "vec_id"),
      Seq("vec_id"), "left_anti").count()
    assert(idx.count() == expectVecs)

    // the dashboard keeps serving from the post-forget epoch
    val dash = StreamingStats.dashboard(spark, cfg)
    assert(dash.count() == survivors.select("source").distinct().count())
  }

  test("stats leg without an ingest root is refused") {
    val cfg = StreamingStats.Config("/tmp/none", Seq("source"),
      "len", "doc_id", "lang")
    intercept[IllegalArgumentException] {
      Gdpr.cascade(spark, docs.limit(1).select("doc_id"),
        ingestRoot = None, stats = Some((cfg, identity[DataFrame] _)))
    }
  }
}
