package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing — the step between a cleaned corpus and a
  * training run: lay documents on a deterministic global order, prefix-sum
  * their token counts, and cut the sequence into shards of ~`budget`
  * tokens each (a document belongs to the shard its first token lands in,
  * so every shard except the last holds ≥ budget tokens' worth of starts).
  *
  * The interesting part at 100 TB is the GLOBAL prefix sum. A naive
  * `Window.orderBy(key)` with no partition spec collapses the corpus into
  * ONE task — the classic scale-killer. [[prefixSum]] instead runs the
  * textbook distributed scan: range-partition on the order key, per-
  * partition subtotals (tiny — one row per partition), an exclusive scan
  * over THAT #partitions-sized table, then broadcast the offsets back and
  * add them to per-partition local running sums. The only single-threaded
  * structure is the offset table; data-sized work stays fully parallel.
  */
object Packing {

  /** Exclusive global running sum of `valueCol` in `orderCols` order,
    * emitted as `__prior`. The composite `orderCols` must be globally
    * unique (it defines the order) — e.g. a computed score plus an id
    * tie-break for curriculum ordering. Output rows = input rows, plus
    * the `__prior` column.
    *
    * The range-partitioned frame is localCheckpoint-frozen before use:
    * `repartitionByRange` SAMPLES boundaries, so evaluating it twice
    * (offsets + main pass) could yield two different partitionings and
    * mismatched offsets — freezing makes both consumers read the same
    * physical partitions. */
  def prefixSum(df: DataFrame, orderCols: Seq[String], valueCol: String,
                partitions: Int): DataFrame = {
    require(orderCols.nonEmpty, "prefixSum needs at least one order column")
    val n = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val frozen = df.repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = frozen.groupBy("__pid")
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__off", coalesce(sum("__psum").over(wOff), lit(0L)))
      .select("__pid", "__off")
    val wLocal = Window.partitionBy("__pid")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    frozen.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__prior",
        coalesce(sum(col(valueCol)).over(wLocal), lit(0L)) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Single-order-column convenience form. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                partitions: Int = 0): DataFrame =
    prefixSum(df, Seq(orderCol), valueCol, partitions)

  /** Assign each row a `shard_id` = which `budget`-sized token window its
    * first token falls in. Deterministic given the (unique) composite
    * order; partitioning-independent because the prefix sum is. */
  def packByBudget(df: DataFrame, orderCols: Seq[String], valueCol: String,
                   budget: Long, partitions: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    prefixSum(df, orderCols, valueCol, partitions)
      .withColumn("shard_id", expr(s"__prior div ${budget}L"))
      .drop("__prior")
  }

  /** Single-order-column convenience form. */
  def packByBudget(df: DataFrame, orderCol: String, valueCol: String,
                   budget: Long, partitions: Int = 0): DataFrame =
    packByBudget(df, Seq(orderCol), valueCol, budget, partitions)
}
