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

  test("streaming attach behind the admission guard == batch ingest of the guard's survivors") {
    import spark.implicits._
    def ts(h: Int, m: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    def v(xs: Float*) = xs.toArray
    val archive = Seq(
      (1L, v(1f, 0f, 0f, 0f), 0),
      (2L, v(0f, 1f, 0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val b1 = Seq(
      (100L, v(0.9f, 0.1f, 0f, 0f), 1, ts(8)),
      (101L, v(0f, 0.9f, 0.1f, 0f), 1, ts(10))).toDF("vec_id", "embedding", "label", "ts")
    val b2 = Seq(
      (100L, v(0.9f, 0.1f, 0f, 0f), 1, ts(9, 30)), // redelivery — guard kills
      (103L, v(0f, 0f, 1f, 0f), 1, ts(10, 30))).toDF("vec_id", "embedding", "label", "ts")
    val b3 = Seq(
      (102L, v(0f, 0f, 0f, 1f), 1, ts(7, 30)),     // straggler — guard drops
      (104L, v(0.5f, 0.5f, 0f, 0f), 1, ts(11))).toDF("vec_id", "embedding", "label", "ts")

    val base = java.nio.file.Files.createTempDirectory("graft-vecidx-stream").toString
    val src = new java.io.File(s"$base/src"); src.mkdirs()
    Seq((b1, "b1", 1000000L), (b2, "b2", 2000000L), (b3, "b3", 3000000L)).foreach {
      case (df, name, mtime) =>
        val tmp = s"$base/tmp_$name"
        df.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime)
    }

    VectorIndex.init(spark, archive, s"$base/idx_stream", k = 2)
    val guarded = graft.streaming.Admission.guard(
      spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString),
      tsCol = "ts", delay = "2 hours", idCols = Seq("vec_id"))
    val q = VectorIndex.attach(guarded, s"$base/idx_stream").start()
    try q.processAllAvailable() finally q.stop()

    VectorIndex.init(spark, archive, s"$base/idx_batch", k = 2)
    VectorIndex.ingest(spark, b1.drop("ts"), s"$base/idx_batch")
    VectorIndex.ingest(spark, b2.filter(col("vec_id") === 103L).drop("ts"), s"$base/idx_batch")
    VectorIndex.ingest(spark, b3.filter(col("vec_id") === 104L).drop("ts"), s"$base/idx_batch")

    def content(r: String) = spark.read.parquet(s"$r/index")
      .select("vec_id", "cid").collect()
      .map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue)).toSet
    assert(content(s"$base/idx_stream") == content(s"$base/idx_batch"))
    assert(content(s"$base/idx_stream").map(_._1) == Set(1L, 2L, 100L, 101L, 103L, 104L))
    // and the served index answers exactly like brute force over survivors
    val qv = Seq(Tuple1(v(1f, 0f, 0f, 0f))).toDF("qe")
    val got = VectorIndex.topK(spark, s"$base/idx_stream", qv, k = 3, nprobe = 2)
      .collect().map(_.toSeq).toSeq
    val survivors = archive.unionByName(b1.drop("ts"))
      .unionByName(b2.filter(col("vec_id") === 103L).drop("ts"))
      .unionByName(b3.filter(col("vec_id") === 104L).drop("ts"))
    val exact = Similarity.cosineTopK(survivors, qv, k = 3)
      .collect().map(_.toSeq).toSeq
    assert(got == exact)
  }

  test("crash-replayed micro-batch ids are skipped: applyBatch appends once per id") {
    import spark.implicits._
    def v(xs: Float*) = xs.toArray
    val archive = Seq((1L, v(1f, 0f), 0), (2L, v(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val b = Seq((100L, v(0.9f, 0.1f), 1)).toDF("vec_id", "embedding", "label")
    val r = java.nio.file.Files.createTempDirectory("graft-vecidx-replay").toString + "/idx"
    VectorIndex.init(spark, archive, r, k = 2)
    VectorIndex.applyBatch(b, r, batchId = 0)
    assert(spark.read.parquet(s"$r/index").count() == 3)
    VectorIndex.applyBatch(b, r, batchId = 0) // crash replay: no double append
    assert(spark.read.parquet(s"$r/index").count() == 3)
    VectorIndex.applyBatch(
      Seq((101L, v(0.5f, 0.5f), 1)).toDF("vec_id", "embedding", "label"), r, batchId = 1)
    assert(spark.read.parquet(s"$r/index").count() == 4)
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

  test("refresh re-trains on the drifted corpus and atomic-swaps: rows unchanged, imbalance back in trigger, recall held, forget still correct") {
    // the r16 ask: the remedy ANN_RECALL names, implemented and measured.
    // Stress-drifted corpus (AnnRecall's deterministic mean-shift — the
    // new-data-mode the frozen centroids don't cover): train on replica 0
    // only, ingest the drifted mass against the frozen quantizer
    val src = graft.model.Tables.embeddings(spark, TestSpark.sfDir)
    val drifted = graft.tools.AnnRecall.driftedCorpus(src, factor = 10, shiftStep = 0.12)
      .localCheckpoint()
    val stride = graft.tools.AnnRecall.Stride
    val r = java.nio.file.Files.createTempDirectory("graft-vecidx-refresh")
      .toString + "/idx"
    VectorIndex.init(spark, drifted.filter(col("vec_id") < stride), r, k = 8)
    VectorIndex.ingest(spark, drifted.filter(col("vec_id") >= stride), r)

    def cellRows(): Map[Long, Long] = spark.read.parquet(s"$r/index")
      .groupBy("cid").count().collect()
      .map(x => x.getAs[Number]("cid").longValue -> x.getLong(1)).toMap
    def imbalance(m: Map[Long, Long]): Double =
      m.values.max.toDouble / (m.values.sum.toDouble / 8)
    def ids(): Set[Long] = spark.read.parquet(s"$r/index")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val idsBefore = ids()
    val imbBefore = imbalance(cellRows())
    assert(imbBefore > 2.0,
      f"precondition: stress drift must concentrate the served mass past the 2x trigger, got $imbBefore%.2f")

    VectorIndex.refresh(spark, r, k = 8)

    // same rows, new assignment; the drifted mass is now spread by
    // centroids trained on it
    assert(ids() == idsBefore)
    val imbAfter = imbalance(cellRows())
    assert(imbAfter <= 2.0 && imbAfter < imbBefore,
      f"refresh must pull imbalance back inside the trigger: $imbBefore%.2f -> $imbAfter%.2f")
    // staging/retired trees are gone — the swap completed and cleaned up
    assert(!new java.io.File(s"$r.refresh-staging").exists())
    assert(!new java.io.File(s"$r.refresh-retired").exists())

    // recall@10 at production nprobe vs brute force over the same corpus,
    // for a drifted-band query (the production query distribution)
    val qid = 5L + 7L * stride
    val qv = drifted.filter(col("vec_id") === qid).select(col("embedding").as("qe"))
    val base = drifted.filter(col("vec_id") =!= qid)
    val ann = VectorIndex.topK(spark, r, qv, k = 10, nprobe = 6)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.cosineTopK(base, qv, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"post-refresh recall@10 = $recall at nprobe=6/8")

    // forget still correct against the refreshed layout
    val gone = drifted.select("vec_id").filter(col("vec_id") % 7 === 0)
    VectorIndex.forget(spark, gone, r)
    val goneIds = gone.collect().map(_.getLong(0)).toSet
    assert(ids() == idsBefore -- goneIds)
    val top = VectorIndex.topK(spark, r, qv, k = 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(top.intersect(goneIds).isEmpty)
  }

  test("refresh crash recovery: a swap that died between its two renames is promoted back to a serving index") {
    // r17 advice (medium): the scaladoc promised this recovery; now the
    // code implements it. Both crash windows:
    //  (a) after rename #1 with a COMPLETE staging -> promote staging
    //      (the new index, one rename short of serving);
    //  (b) live absent with an INCOMPLETE staging but intact retired ->
    //      promote retired (the old index survives the failed refresh).
    import java.nio.file.{Files, Paths}
    def build(tag: String): String = {
      val r = Files.createTempDirectory(s"graft-vecidx-$tag").toString + "/idx"
      VectorIndex.init(spark, emb, r, k = 4)
      r
    }
    def ids(r: String): Set[Long] = spark.read.parquet(s"$r/index")
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // (a) crash after the first rename: live -> retired happened, staging
    // is a complete freshly-built index (simulate with a second init)
    val ra = build("recov-a")
    val before = ids(ra)
    VectorIndex.init(spark, spark.read.parquet(s"$ra/index").drop("cid"),
      s"$ra.refresh-staging", k = 4)
    Files.move(Paths.get(ra), Paths.get(s"$ra.refresh-retired"))
    assert(VectorIndex.recover(spark, ra))
    assert(ids(ra) == before)
    assert(!new java.io.File(s"$ra.refresh-staging").exists() &&
      !new java.io.File(s"$ra.refresh-retired").exists())
    // a healed root recovers to false on the next call (live exists)
    assert(!VectorIndex.recover(spark, ra))
    // and refresh itself runs clean on the healed root
    VectorIndex.refresh(spark, ra, k = 4)
    assert(ids(ra) == before)

    // (b) incomplete staging (build died mid-write): promote retired
    val rb = build("recov-b")
    val beforeB = ids(rb)
    Files.createDirectories(Paths.get(s"$rb.refresh-staging/centroids"))
    Files.move(Paths.get(rb), Paths.get(s"$rb.refresh-retired"))
    assert(VectorIndex.recover(spark, rb))
    assert(ids(rb) == beforeB)
    assert(!new java.io.File(s"$rb.refresh-staging").exists())

    // nothing recoverable: loud failure, not a silent absent index
    val rc = Files.createTempDirectory("graft-vecidx-recov-c").toString + "/idx"
    intercept[IllegalStateException](VectorIndex.recover(spark, rc))
  }

  test("forget erases ids partition-locally: index == rebuild over survivors; idempotent; emptied partitions cleared") {
    import spark.implicits._
    // dedicated index (the shared lazy `root` must stay intact for the
    // other cases)
    val r = java.nio.file.Files.createTempDirectory("graft-vecidx-forget").toString + "/idx"
    VectorIndex.init(spark, emb, r, k = 8)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getAs[Number](0).longValue, x.getAs[Number](1).longValue)).toSet
    val before = pairs(spark.read.parquet(s"$r/index").select("vec_id", "cid"))

    // forget every 7th vector + one unknown id (ignored)
    val gone = emb.select("vec_id").filter(col("vec_id") % 7 === 0)
    VectorIndex.forget(spark, gone.unionByName(Seq(999999L).toDF("vec_id")), r)
    val after = pairs(spark.read.parquet(s"$r/index").select("vec_id", "cid"))
    val goneIds = gone.collect().map(_.getLong(0)).toSet
    assert(after == before.filterNot { case (v, _) => goneIds(v) })
    // survivors' assignments are untouched (pure function of the frozen
    // quantizer) and probes no longer surface forgotten ids
    val top = VectorIndex.topK(spark, r, query, k = 10, nprobe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(top.intersect(goneIds).isEmpty)
    // idempotent replay
    VectorIndex.forget(spark, gone, r)
    assert(pairs(spark.read.parquet(s"$r/index").select("vec_id", "cid")) == after)

    // empty a whole partition: forget every remaining member of one cid
    val idx = spark.read.parquet(s"$r/index")
    val victim = idx.select("cid").limit(1).collect().head.getAs[Number](0).longValue
    val members = idx.filter(col("cid") === victim).select("vec_id")
    VectorIndex.forget(spark, members, r)
    val left = spark.read.parquet(s"$r/index")
    assert(left.filter(col("cid") === victim).count() == 0)
    // the directory itself is gone, not just empty
    assert(!new java.io.File(s"$r/index/cid=$victim").exists())
    // untouched partitions survive byte-count-wise
    assert(pairs(left.select("vec_id", "cid")) ==
      after.filterNot { case (_, c) => c == victim })
  }
}
