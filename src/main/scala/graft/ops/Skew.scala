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

  /** TARGETED salting for fact⋈fact joins: only the enumerated `hotKeys`
    * are split across `salts` partitions; every other key joins unsalted
    * (salt 0 on both sides). The other side replicates `salts`× ONLY its
    * hot-key rows, so the replication cost is bounded by the hot-row
    * count, not the table size — the form that survives fact⋈fact at
    * 100 TB, where [[saltedJoin]]'s whole-side replication would multiply
    * the shuffle by the salt count. Semantics identical to the unsalted
    * join (pinned in SkewSpec). */
  def saltedJoinHot(big: DataFrame, other: DataFrame, key: String,
                    hotKeys: Seq[Long], salts: Int,
                    joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    if (hotKeys.isEmpty) return big.join(other, Seq(key), joinType)
    def isHot = col(key).isInCollection(hotKeys)
    val saltedBig = big.withColumn("__salt",
      when(isHot,
        pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)).cast("int"))
        .otherwise(lit(0)))
    val saltedOther = other.withColumn("__salts",
        when(isHot, sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts"))).drop("__salts")
    saltedBig.join(saltedOther, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot-key detection from a deterministic sample: keys whose sampled
    * share exceeds `minShare`, heaviest first, at most `maxKeys`. One
    * sampled pass + a sample-sized aggregate; the collect is bounded by
    * `maxKeys` (metadata-scale, audit-allowlisted). At 100 TB this is the
    * cheap pre-pass that decides whether [[saltedJoinHot]] is needed at
    * all — statistics, never the data. */
  def hotKeys(df: DataFrame, key: String, minShare: Double,
              sampleFraction: Double = 0.01, seed: Long = 42,
              maxKeys: Int = 100): Seq[Long] = {
    val s = df.select(col(key)).sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
    val total = s.agg(coalesce(sum("__n"), lit(0L))).head.getLong(0)
    if (total == 0) return Seq.empty
    s.filter(col("__n") > total * minShare && col(key).isNotNull)
      .orderBy(col("__n").desc, col(key))
      .limit(maxKeys)
      .collect().map(_.getLong(0)).toSeq
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
