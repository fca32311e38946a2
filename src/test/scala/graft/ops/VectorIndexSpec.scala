package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Persisted incremental IVF index: init+ingest parity with a one-shot
  * assignment, probe-all == brute force, recall at production nprobe, and
  * storage-layer partition pruning on the probe path. */
class VectorIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def emb = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") =!= 0)
  private def query = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    .filter(col("vec_id") === 0).select(col("embedding").as("qe"))

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-vecidx").toString + "/idx"
    val p = VectorIndex.init(spark, emb.filter(col("vec_id") % 5 =!= 0), r, k = 8)
    VectorIndex.ingest(spark, emb.filter(col("vec_id") % 5 === 0), r)
    assert(p.root == r)
    r
  }

  test("init+ingest == one-shot assignment under the frozen quantizer; probe-all == brute force") {
    // the index holds every vector exactly once, assigned as a pure
    // function of (vector, frozen centroids) — so two increments equal
    // one joint assignment bit for bit
    // cid round-trips as a partition-directory value (int-inferred), so
    // compare through Number
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).toSet
    val idx = pairs(spark.read.parquet(s"$root/index").select("vec_id", "cid"))
    val direct = pairs(Similarity.ivfAssign(
      emb, Similarity.loadIvfCentroids(spark, s"$root/centroids")))
    assert(idx == direct)

    // probing every centroid degrades to exact brute force
    val got = VectorIndex.topK(spark, root, query, k = 10, nprobe = 8)
      .collect().map(_.toSeq).toSeq
    val exact = Similarity.cosineTopK(emb, query, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(got == exact)
  }

  test("recall@10 at production nprobe") {
    val ann = VectorIndex.topK(spark, root, query, k = 10, nprobe = 6)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(emb, query, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall at nprobe=6/8")
  }

  test("probe path prunes at the storage layer: scan reads only the probed partitions") {
    val all = VectorIndex.topK(spark, root, query, k = 10, nprobe = 8)
    val two = VectorIndex.topK(spark, root, query, k = 10, nprobe = 2)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      // descend through AQE wrappers and subqueries to the leaf scans
      def scans(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      val ss = scans(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.exists(_.toString.contains("/idx/index")))
      assert(ss.nonEmpty,
        s"no index scan in the probe plan:\n${df.queryExecution.executedPlan.toString}")
      ss.map(_.metrics("numFiles").value).sum
    }
    val allFiles = filesRead(all)
    val twoFiles = filesRead(two)
    assert(twoFiles < allFiles,
      s"nprobe=2 read $twoFiles files vs $allFiles at nprobe=8 — probe is not pruning")
    // and the pruning is DYNAMIC (runtime subquery on the partition
    // column), not a hand-collected literal filter
    assert(two.queryExecution.executedPlan.toString.toLowerCase
      .contains("dynamicpruning"),
      "expected a dynamic-partition-pruning subquery on the index scan")
  }
}
