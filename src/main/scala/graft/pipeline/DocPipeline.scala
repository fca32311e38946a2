package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** The composed LLM training-data cleaning pipeline — the north-star
  * components chained the way a real corpus build runs them:
  *
  *   quality filter → exact dedup → near-dup clustering → cleaned corpus
  *
  * Every stage is one of the already-verified operators; the composition
  * itself is oracle-checked end-to-end (llm1_clean_corpus).
  *
  * Scale shape: quality scoring is map-side; exact dedup is one shuffle
  * on the text key (hash-group at 100 TB — see dd1's production
  * variant); near-dup candidates come from MinHash banding (never
  * all-pairs); verified pairs are resolved to clusters by
  * [[Dedup.connectedComponents]] (the edge list is tiny relative to the
  * corpus) and the drop set is an anti-join with NO static broadcast
  * hint: at web-corpus dup rates the drop set is 10-30% OF THE CORPUS —
  * billions of ids at 100 TB, far past broadcastable — so the join
  * strategy is left to AQE, which broadcasts when the runtime size
  * actually fits and shuffles otherwise. Survivor rules
  * are deterministic: min doc_id per duplicate text, min doc_id per
  * near-dup cluster. */
object DocPipeline {

  /** `maxDf` (production) caps hot-shingle document frequency inside the
    * near-dup stage — see [[Dedup.capDocumentFrequency]]; None keeps the
    * exact shingle set the llm1 oracle requires. `ccMaxIters` is a pure
    * backstop on the cluster-closure star-contraction rounds — the
    * alternating algorithm converges in O(log n) rounds on any graph,
    * long incremental-version chains included. */
  def cleanCorpus(docs: DataFrame,
                  minQuality: Double = 60.0,
                  nearDupThr: Double = 0.8,
                  maxDf: Option[Long] = None,
                  ccMaxIters: Int = 64): DataFrame = {
    val scored = docs.withColumn("quality",
      TextOps.qualityScore(col("text"), TextOps.corpusStopwords))
    val qualified = scored.filter(col("quality") >= minQuality)

    // exact dedup: deterministic min-id survivor per identical text
    val w = Window.partitionBy("text").orderBy("doc_id")
    val dedupedLazy = qualified
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // Production (capped) runs materialize the deduped corpus once — the
    // standard inter-stage persist between the exact-dedup and near-dup
    // stages of a real corpus build: it feeds both the shingle substrate
    // and the final anti-join, and lazy recompute would re-run the
    // quality scan plus the window shuffle for each. The oracle path
    // stays fully lazy (plan transparency for the correctness gate).
    val deduped = if (maxDf.isDefined) dedupedLazy.localCheckpoint() else dedupedLazy

    // near-dup removal among survivors: resolve verified pairs into
    // connected components and keep ONE representative (min doc_id) per
    // cluster — transitive closure, not greedy pair-dropping, which
    // over-keeps docs linked only through a common neighbor
    val pairs = Dedup.minhashNearDup(deduped, thr = nearDupThr, maxDf = maxDf)
    val drops = Dedup.connectedComponents(pairs, ccMaxIters)
      .filter(col("cluster") =!= col("doc_id")).select("doc_id")
    deduped.join(drops, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"),
        TextOps.tokenCount(col("text")).as("n_tokens"), col("quality"))
  }
}
