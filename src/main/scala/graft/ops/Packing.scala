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

  /** Context-length chunking — the step BEFORE packing: split each
    * document into overlapping token windows of `size` tokens starting
    * every `stride` tokens (stride = size ⇒ disjoint; stride < size ⇒
    * overlap of size−stride, the usual pre-training shape so no span is
    * seen only across a chunk boundary). Output: one row per chunk with
    * `chunk_id` (0-based within the doc), `chunk_text`, `chunk_tokens`
    * (= `size` except the doc's tail). Start offsets are 0, stride, …,
    * ceil((n−size)/stride)·stride — the standard chunk count
    * max(1, ceil((n−size)/stride)+1): every token lands in ≥1 chunk, a
    * doc with ≤ `size` tokens yields exactly one chunk, and no start is
    * emitted whose window the previous chunk already fully covers.
    *
    * Scale shape: pure map-side narrow work — `sequence` + `explode` +
    * `slice` inside whole-stage codegen, zero shuffles, zero UDFs; the
    * explode fan-out is ~n_tokens/stride rows per doc, each carrying only
    * its own window's text. Composes with [[packByBudget]] on
    * (doc_id, chunk_id) for shard assignment of the chunked corpus. */
  def chunkByTokens(docs: DataFrame, size: Int, stride: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size], got $stride")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__last",
        (greatest(floor((size_(col("__toks")) - size + stride - 1)
          .cast("double") / stride), lit(0.0)).cast("int") * stride).cast("int"))
      .select(col(idCol),
        col("__toks"),
        explode(sequence(lit(0), col("__last"), lit(stride))).as("__start"))
      .select(col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " ").as("chunk_text"),
        least(lit(size), size_(col("__toks")) - col("__start"))
          .cast("long").as("chunk_tokens"))
  }

  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)
}
