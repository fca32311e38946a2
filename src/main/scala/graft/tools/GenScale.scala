package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scaler for the scale-ladder bench (VERDICT r10
  * missing #3): replicates the driver's sf0.1 tables `factor`× with
  * key-space offsets so the result behaves like a genuinely larger scale
  * factor, not like the same corpus counted `factor` times.
  *
  * Design rules (each exists to keep the LADDER measurement honest — the
  * point is growth RATE of the engine, so the workload's per-row shape
  * must stay constant while n grows):
  *
  *   - Every entity key (order/part/supp/cust/doc/vec/event ids) shifts
  *     by `replica * Stride`, so join fan-ins, group cardinalities, and
  *     distinct-key counts all scale ∝ factor — exactly what a larger
  *     TPC-H SF does. Fixed dims (region/nation) are NOT scaled, as in
  *     TPC-H itself; nationkey/source/lang/segment columns keep their
  *     original small domains so per-key slivers grow linearly.
  *   - Foreign keys shift by the SAME stride as their parents, so every
  *     replica is a closed join universe (no cross-replica matches) and
  *     the join selectivity per row is unchanged.
  *   - `documents.text` gets a per-replica token suffix (`tok` →
  *     `tok_r<k>`; replica 0 verbatim). Replicating text UNCHANGED would
  *     put every doc in a factor-sized exact/near-dup family —
  *     cross-replica pair counts would grow ~factor²/2 while the corpus
  *     grows ×factor, inflating every dedup/graph query superlinearly BY
  *     CONSTRUCTION and poisoning the ≤O(n log n) claim the ladder is
  *     meant to test. The suffix zeroes cross-replica shingle overlap
  *     while preserving each replica's internal duplication structure
  *     bit-for-bit, so planted pairs/clusters scale ∝ factor.
  *   - Timestamps and value columns pass through unchanged: time-window
  *     densities per key stay constant (each replica owns its own users).
  *   - No RNG anywhere — replica index drives every transform, so two
  *     runs produce byte-identical corpora.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <destDir> <factor> [tables]
  * The optional comma-separated `tables` list restricts the run to those
  * tables (a skew/soak rung that only joins lineitem⋈orders⋈customer
  * doesn't need the factor-scaled documents corpus written).
  */
object GenScale {

  /** Key offset per replica — far above any sf0.1 key (~6M max). */
  val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: GenScale <srcDir> <destDir> <factor> [tables]")
    val src = args(0); val dest = args(1); val factor = args(2).toInt
    val only = if (args.length > 3) Some(args(3).split(',').map(_.trim).toSet) else None
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = graft.engine.Sessions.local()
    try {
      scaleAll(spark, src, dest, factor, only)
      println(s"""{"scaled":"$dest","factor":$factor}""")
    } finally spark.stop()
  }

  def scaleAll(spark: SparkSession, src: String, dest: String, factor: Int,
               only: Option[Set[String]] = None): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // `only` filter applied at the WRITE: a skipped table costs nothing
    def write(df: => DataFrame, t: String): Unit =
      if (only.forall(_.contains(t)))
        df.write.mode("overwrite").parquet(s"$dest/$t.parquet")

    // fixed dims copy through untouched (TPC-H nation/region do not scale)
    Seq("region", "nation").foreach(t => write(read(t), t))

    val off = col("__r") * Stride
    /** factor-replicate df, shifting `keys` by the replica offset. */
    def rep(df: DataFrame, keys: String*): DataFrame = {
      val exploded = df.withColumn("__r",
        explode(sequence(lit(0L), lit(factor - 1L))))
      keys.foldLeft(exploded)((d, k) => d.withColumn(k, col(k) + off))
        .drop("__r")
    }

    write(rep(read("customer"), "c_custkey"), "customer")
    write(rep(read("supplier"), "s_suppkey"), "supplier")
    write(rep(read("part"), "p_partkey"), "part")
    write(rep(read("orders"), "o_orderkey", "o_custkey"), "orders")
    write(rep(read("lineitem"),
      "l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    // events.user_id joins c_custkey; nulls survive the shift (null + x)
    write(rep(read("events"), "event_id", "user_id"), "events")
    // embeddings: the vec_id=0 QUERY vector stays a singleton (replica 0
    // only) — shifted clones at k*Stride would carry its exact embedding
    // and plant factor-1 cosine-1.0 top-k matches against the base corpus
    // (round-11 advice). Non-query base vectors ARE still replicated with
    // identical embeddings (each base vector has `factor` exact copies
    // across replicas): fine for LADDER TIMING — the scan/top-k work per
    // row is unchanged — but scaled corpora must not be used for
    // similarity RESULT checks, where cross-replica clones would dominate
    // any top-k.
    val emb = read("embeddings")
      .withColumn("__r", explode(sequence(lit(0L), lit(factor - 1L))))
      .filter(col("__r") === 0 || col("vec_id") =!= 0)
      .withColumn("vec_id", col("vec_id") + off)
      .drop("__r")
    write(emb, "embeddings")

    // documents: key shift + the per-replica token suffix (see scaladoc);
    // n_chars is re-derived so the metadata column stays truthful
    val docs = read("documents")
      .withColumn("__r", explode(sequence(lit(0L), lit(factor - 1L))))
      .withColumn("doc_id", col("doc_id") + off)
      .withColumn("text",
        when(col("__r") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_r"), col("__r"))), " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("__r")
    write(docs, "documents")
  }
}
