package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level breakdown of the hot dedup/graph pipelines (guide §1:
  * measure first, empirically — find WHERE the seconds go before touching
  * anything). Times cumulative prefixes of the minhashNearDup production
  * pipeline plus the CC fold, each through the noop sink, median of N.
  *
  * Usage: runMain graft.tools.StageBench <sfDir> [reps]
  */
object StageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup

    def docs = graft.model.Tables.documents(spark, sfDir)
    def docsW = graft.model.Tables.widened(spark, sfDir, "documents")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"stagebench: $name")
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"STAGE $name%-38s median ${ts(ts.size / 2)}%7.3f s  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // warm-up: full pipeline once, untimed
    Dedup.minhashNearDup(docs, maxDf = Some(Dedup.DefaultMaxDf))
      .write.mode("overwrite").format("noop").save()
    Dedup.connectedComponents(
        Dedup.minhashNearDup(docsW, maxDf = Some(Dedup.DefaultMaxDf)))
      .write.mode("overwrite").format("noop").save()

    time("shingleDF")(Dedup.shingleDF(docs))
    time("shingleDF_widened")(Dedup.shingleDF(docsW))
    time("signatures_uncapped")(Dedup.minhashSignatures(Dedup.shingleDF(docs)))
    time("signatures_widened")(Dedup.minhashSignatures(Dedup.shingleDF(docsW)))
    time("cap_df")(Dedup.capDocumentFrequency(Dedup.shingleDF(docs)))
    time("cap_df_widened")(Dedup.capDocumentFrequency(Dedup.shingleDF(docsW)))
    time("neardup_uncapped")(Dedup.minhashNearDup(docs))
    time("neardup_uncapped_widened")(Dedup.minhashNearDup(docsW))
    time("neardup_capped_prod")(
      Dedup.minhashNearDup(docs, maxDf = Some(Dedup.DefaultMaxDf)))
    time("neardup_capped_widened")(
      Dedup.minhashNearDup(docsW, maxDf = Some(Dedup.DefaultMaxDf)))

    // CC isolated on a fixed pair sliver (checkpointed once, untimed)
    val pairs = Dedup.minhashNearDup(docsW, maxDf = Some(Dedup.DefaultMaxDf))
      .localCheckpoint()
    println(s"pairs: ${pairs.count()}")
    // interleave old/new so ambient drift hits both
    for (r <- 1 to reps) {
      Seq("cc_OLD" -> (() => ccOld(pairs)),
          "cc_NEW" -> (() => Dedup.connectedComponents(pairs))).foreach {
        case (name, mk) =>
          val t0 = System.nanoTime()
          mk().write.mode("overwrite").format("noop").save()
          println(f"AB $name pass$r ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    spark.stop()
  }

  /** r17 CC implementation — copied verbatim for same-JVM A/B. */
  private def ccOld(pairs: DataFrame): DataFrame = {
    val p = pairs.localCheckpoint()
    var edges = p
      .select(greatest(col("id1"), col("id2")).as("hi"),
        least(col("id1"), col("id2")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    val nodes = p.select(col("id1").as("doc_id"))
      .union(p.select(col("id2").as("doc_id"))).distinct()
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < 64) {
      val next = smallStarOld(largeStarOld(edges)).localCheckpoint()
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("hi", "lo"), "left_anti").isEmpty
      edges = next
      i += 1
    }
    val roots = edges.groupBy(col("hi").as("doc_id")).agg(min("lo").as("root"))
    nodes.join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster"))
  }
  private def largeStarOld(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
      .distinct()
  }
  private def smallStarOld(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("hi").agg(min("lo").as("m"))
    val joined = edges.join(mins, "hi")
    joined.filter(col("lo") =!= col("m"))
      .select(col("lo").as("hi"), col("m").as("lo"))
      .union(mins.select(col("hi"), col("m").as("lo")))
      .distinct()
  }
}
