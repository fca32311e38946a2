package graft

import org.scalatest.funsuite.AnyFunSuite

/** O3 invariants (SURVEY.md §7.4.6): seeded sampling is excluded from the
  * oracle set by design — pinned here instead. */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sample = SparkEntry.specs.find(_.name == "o3_seeded_sample").get

  test("same seed + same input ⇒ identical sample across runs") {
    val a = sample.run(spark, TestSpark.sfDir).collect().toSet
    val b = sample.run(spark, TestSpark.sfDir).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("sample size is within a loose CI of fraction·n") {
    val n = graft.model.Tables.lineitem(spark, TestSpark.sfDir).count()
    val k = sample.run(spark, TestSpark.sfDir).count()
    val expected = 0.01 * n
    val tol = 5 * math.sqrt(expected) // ±5σ of Binomial(n, 0.01)
    assert(k > expected - tol && k < expected + tol, s"sampled $k of $n")
  }

  test("sample rows are a subset of the input") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val s = sample.run(spark, TestSpark.sfDir)
    assert(s.exceptAll(li).count() == 0)
  }

  test("exact-n sample: exactly n rows, deterministic across runs, subset of input") {
    val exact = SparkEntry.specs.find(_.name == "o3b_exact_n_sample").get
    val a = exact.run(spark, TestSpark.sfDir).collect()
    assert(a.length == 500, s"expected exactly 500 rows, got ${a.length}")
    val b = exact.run(spark, TestSpark.sfDir).collect()
    assert(a.toSeq == b.toSeq) // order included: the sort is total
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    assert(exact.run(spark, TestSpark.sfDir).exceptAll(li).count() == 0)
  }

  test("weighted sample: exact n, deterministic, subset, heavy rows oversampled") {
    val ws = SparkEntry.specs.find(_.name == "o9_weighted_sample").get
    val a = ws.run(spark, TestSpark.sfDir).collect()
    assert(a.length == 500)
    assert(a.toSeq == ws.run(spark, TestSpark.sfDir).collect().toSeq)
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 0)
    assert(ws.run(spark, TestSpark.sfDir).exceptAll(li).count() == 0)
    // weight-proportionality: the sampled mean quantity must exceed the
    // population mean (heavier rows are preferentially selected). The gap
    // is large by construction (P ∝ w over w ∈ 1..50), so this is a
    // deterministic property of the seeded sample, not a flaky CI bound.
    val popMean = li.agg(org.apache.spark.sql.functions.avg("l_quantity"))
      .head().getDouble(0)
    val sampleMean = a.map(_.getAs[Double]("l_quantity")).sum / a.length
    assert(sampleMean > popMean * 1.2,
      f"weighted sample mean $sampleMean%.2f not above population mean $popMean%.2f")
  }

  test("stratified sample: deterministic, per-stratum fractions within CI, subset") {
    val strat = SparkEntry.specs.find(_.name == "o7_stratified_sample").get
    val a = strat.run(spark, TestSpark.sfDir).collect().toSet
    assert(a == strat.run(spark, TestSpark.sfDir).collect().toSet && a.nonEmpty)

    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val byFlag = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotByFlag = a.groupBy(_.getAs[String]("l_returnflag")).view.mapValues(_.size).toMap
    // hash-threshold fractions are exact in hex space: '008' = 8/4096, '052' = 82/4096
    for ((flag, frac) <- Map("N" -> 8.0 / 4096, "A" -> 82.0 / 4096, "R" -> 82.0 / 4096)) {
      val expected = frac * byFlag(flag)
      val tol = 5 * math.sqrt(expected max 1.0)
      val got = gotByFlag.getOrElse(flag, 0).toDouble
      assert(got > expected - tol && got < expected + tol,
        s"stratum $flag sampled $got, expected ~$expected")
    }
    // the majority stratum is actually downsampled relative to the others
    assert(gotByFlag.getOrElse("N", 0) <
      gotByFlag.getOrElse("A", 0) + gotByFlag.getOrElse("R", 0))

    val s = strat.run(spark, TestSpark.sfDir)
    assert(s.exceptAll(li.select(s.columns.map(org.apache.spark.sql.functions.col): _*)).count() == 0)
  }

  test("cluster-holdout split: every near-dup cluster lands wholly in one split (no leakage)") {
    import org.apache.spark.sql.functions._
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    val labels = graft.ops.Dedup.connectedComponents(graft.ops.Dedup.minhashNearDup(docs))
    assert(labels.count() > 0, "fixture must contain near-dup clusters for this spec to bite")
    // the o13 split rule, applied per doc THROUGH its cluster group
    val split = labels
      .select(col("doc_id"), col("cluster"),
        when(substring(md5(col("cluster").cast("string")), 1, 2) < "cc", "train")
          .otherwise("test").as("split"))
    val perCluster = split.groupBy("cluster")
      .agg(countDistinct("split").as("n_splits"))
    assert(perCluster.filter(col("n_splits") =!= 1).count() == 0,
      "a cluster straddles train/test — the leakage the operator exists to prevent")
    // contrast: the per-doc o11-style rule DOES split at least one cluster
    // on this fixture (otherwise the group key adds nothing here)
    val naive = labels
      .select(col("cluster"),
        when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cc", "train")
          .otherwise("test").as("split"))
      .groupBy("cluster").agg(countDistinct("split").as("n_splits"))
    assert(naive.filter(col("n_splits") > 1).count() > 0)
  }

  test("cluster-holdout production variant (persisted labels, xxhash buckets) conserves docs and groups") {
    import org.apache.spark.sql.functions._
    val spec = graft.SparkEntry.specs.find(_.name == "o13_cluster_holdout").get
    spec.prepare.foreach(_(spark, TestSpark.sfDir))
    val out = spec.production(spark, TestSpark.sfDir).collect()
    val docs = graft.model.Tables.documents(spark, TestSpark.sfDir)
    assert(out.map(_.getLong(1)).sum == docs.count())
    val labels = graft.ops.Dedup.connectedComponents(graft.ops.Dedup.minhashNearDup(docs))
    val nGroups = docs.join(labels, Seq("doc_id"), "left")
      .select(coalesce(col("cluster"), col("doc_id"))).distinct().count()
    assert(out.map(_.getLong(2)).sum == nGroups)
  }

  test("stratified k-fold: every (stratum, fold) cell exactly balanced; assignment partition-independent") {
    val kfold = SparkEntry.specs.find(_.name == "o14_stratified_kfold").get
    val out = kfold.run(spark, TestSpark.sfDir)
    val cells = out.groupBy("lang", "fold").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // round-robin over a total order: per-stratum fold sizes differ by <= 1
    cells.keys.map(_._1).toSet.foreach { lang: String =>
      val sizes = cells.collect { case ((l, _), n) if l == lang => n }
      assert(sizes.max - sizes.min <= 1, s"unbalanced folds for $lang: $sizes")
    }
    assert(out.select("fold").distinct().count() == 5)
    // pure function of (doc_id, stratum population): repartitioning the
    // input must not move any doc to a different fold
    val again = kfold.run(spark, TestSpark.sfDir)
      .repartition(7).collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val first = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again == first)
  }
}
