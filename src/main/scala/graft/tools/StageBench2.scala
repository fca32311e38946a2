package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-2 stage probes: llm1 / u19 / dd8 decomposition (guide §1). */
object StageBench2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, TextOps}

    def docsW = graft.model.Tables.widened(spark, sfDir, "documents")
    def docs = graft.model.Tables.documents(spark, sfDir)

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"stagebench2: $name")
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"STAGE $name%-38s median ${ts(ts.size / 2)}%7.3f s  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // warm-up
    graft.pipeline.DocPipeline.cleanCorpus(docsW, maxDf = Some(Dedup.DefaultMaxDf))
      .write.mode("overwrite").format("noop").save()

    // ---- llm1 decomposition
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text").orderBy("doc_id")
    def scored = docsW.withColumn("quality",
      TextOps.qualityScore(col("text"), TextOps.corpusStopwords))
      .filter(col("quality") >= 60.0)
    def dedupedLazy = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    time("llm1_quality_filter")(scored)
    time("llm1_window_dedup")(dedupedLazy)
    time("llm1_neardup_of_deduped") {
      val deduped = dedupedLazy.localCheckpoint()
      Dedup.minhashNearDup(deduped, maxDf = Some(Dedup.DefaultMaxDf))
    }
    time("llm1_full")(
      graft.pipeline.DocPipeline.cleanCorpus(docsW, maxDf = Some(Dedup.DefaultMaxDf)))

    // ---- u19 decomposition (production shape)
    def u19sliced = graft.ops.Merge.kmvStateSliced(
      docsW.select(col("source"), (col("doc_id") % 2).as("__slice"),
          col("text"), Dedup.tokens(col("text")).as("__ws"))
        .select(col("source"), col("__slice"),
          explode(Dedup.shinglesFromTokens(col("text"), col("__ws"))).as("g")),
      "source", "__slice", xxhash64(col("g")), k = 256)
    time("u19_sliced_state")(u19sliced)
    time("u19_merged")(
      graft.ops.Merge.mergeKmvStates(Seq(u19sliced.drop("__slice")), "source", k = 256))
    time("u19_full")(
      graft.ops.Merge.kmvPairwiseJaccard(
        graft.ops.Merge.mergeKmvStates(Seq(u19sliced.drop("__slice")), "source", k = 256),
        "source", k = 256))

    // ---- dd8 decomposition
    val split = docs.agg(max("doc_id")).head.getLong(0) * 4 / 5
    def corpus = docsW.filter(col("doc_id") < split)
    def batch = docsW.filter(col("doc_id") >= split)
    time("dd8_index_build")(Dedup.lshBandIndex(corpus))
    time("dd8_labels_cc") {
      val index = Dedup.lshBandIndex(corpus).localCheckpoint()
      Dedup.connectedComponents(
        Dedup.minhashNearDupFromBands(Dedup.shingleDF(corpus), index))
    }
    time("dd8_full") {
      val index = Dedup.lshBandIndex(corpus).localCheckpoint()
      val labels = Dedup.connectedComponents(
        Dedup.minhashNearDupFromBands(Dedup.shingleDF(corpus), index))
      val newPairs = Dedup.incrementalNearDup(batch, corpus, index).select("id1", "id2")
      Dedup.updateClusters(labels, newPairs)
    }
    spark.stop()
  }
}
