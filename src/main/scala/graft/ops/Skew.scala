package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew mitigation by salting (brief: "salting for skew, AQE for
  * runtime re-plan").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; the
  * manual salt remains necessary when AQE can't help — shuffle-hash
  * joins, skewed `groupBy` keys feeding non-decomposable aggregates, or
  * engines/stages where adaptive re-planning is off. The salt splits one
  * hot key across `salts` reducers at the cost of replicating the small
  * side `salts`×.
  */
object Skew {

  /** Inner/left join where the BIG side's hot keys are split across
    * `salts` partitions. Each big row gets a deterministic salt from its
    * row hash; the small side is replicated once per salt value, so
    * every (key, salt) pair still finds its match exactly once —
    * semantics identical to the unsalted join (pinned in SkewSpec). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe two-phase aggregation: partial aggregate on (key, salt),
    * final on key. For decomposable aggregates Spark's map-side partial
    * agg already does this; the explicit form exists for the reduce-side
    * hot-key case (e.g. after an upstream shuffle destroyed map-side
    * locality). Counts only — extend per-aggregate as needed. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum("__partial").as("count"))
}
