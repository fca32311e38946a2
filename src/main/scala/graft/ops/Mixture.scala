package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled source mixture — the multilingual/multi-domain
  * rebalancing step of a training-data build: sample source s
  * proportionally to n_s^α (α ∈ (0,1] the "temperature"; α = 1 keeps the
  * natural distribution, α → 0 flattens toward uniform — the standard
  * upsampling rule for low-resource languages/domains).
  *
  * Determinism discipline (SURVEY §7.5): the per-source weight is
  * floor(sqrt-family(n)·10⁶) — ONE correctly-rounded IEEE op (sqrt, or a
  * single pow for general α) and ONE exact multiply-by-2⁶̇·5⁶ per source,
  * then everything downstream (weight sum, quota split) is pure 64-bit
  * integer arithmetic: no float accumulation whose association an engine
  * could reorder, so any engine reproduces identical quotas. The draw
  * itself is hash-ordered (md5 oracle / xxhash64 production — the o8/o10
  * discipline), reproducible across runs, engines, and partitionings.
  *
  * Scale shape: per-source counts and quotas are dimension-sized slivers
  * (1-row total via the sanctioned broadcast crossJoin, quota table
  * broadcast into the corpus-sized window pass); the corpus itself sees
  * one window shuffle on source — no global sort, no driver state.
  */
object Mixture {

  /** Per-source quota table: `source`, `n`, `quota` with
    * quota_s = max(1, budget · w_s div Σw), w_s = floor(n_s^α · 10⁶).
    * Every source keeps ≥ 1 doc (the low-resource floor); Σ quotas ≤
    * budget + #sources. `alpha` = 0.5 uses exact IEEE sqrt. */
  def temperatureQuotas(docs: DataFrame, budget: Long, alpha: Double = 0.5,
                        sourceCol: String = "source"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val nD = col("n").cast("double")
    // sqrt is a single correctly-rounded op everywhere; pow is the
    // general-α form (also one op, IEEE-faithful on every engine)
    val wExpr: Column = if (alpha == 0.5) sqrt(nD) else pow(nD, alpha)
    val weighted = docs.groupBy(sourceCol)
      .agg(count(lit(1)).as("n"))
      .withColumn("w", floor(wExpr * 1000000d).cast("long"))
    val total = weighted.agg(sum("w").as("w_total"))
    weighted.crossJoin(broadcast(total))
      .withColumn("quota", greatest(expr(s"(${budget}L * w) div w_total"), lit(1L)))
      .select(col(sourceCol), col("n"), col("quota"))
  }

  /** The mixture draw: per-source hash-ordered row_number kept while
    * ≤ quota. `hashOrder` defaults to the md5 oracle form; pass
    * xxhash64(col(idCol)) for the 8-byte production draw. Output:
    * idCol, sourceCol, rn, quota. */
  def temperatureMixture(docs: DataFrame, budget: Long, alpha: Double = 0.5,
                         idCol: String = "doc_id", sourceCol: String = "source",
                         hashOrder: Option[Column] = None): DataFrame = {
    val order = hashOrder.getOrElse(md5(col(idCol).cast("string")))
    val w = Window.partitionBy(sourceCol).orderBy(order)
    val quotas = temperatureQuotas(docs, budget, alpha, sourceCol)
      .select(sourceCol, "quota")
    docs.select(col(idCol), col(sourceCol))
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("rn") <= col("quota"))
      .select(col(idCol), col(sourceCol), col("rn"), col("quota"))
  }
}
