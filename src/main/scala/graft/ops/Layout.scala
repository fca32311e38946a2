package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * multi-column pruning — the public-Spark re-expression of the
  * OPTIMIZE-ZORDER idea (Morton, "A computer oriented geodetic data
  * base", 1966; popularized for lakehouse layout by Delta/Iceberg).
  *
  * Why a 100 TB engine needs it: [[graft.io.Sinks.parquetRangeClustered]]
  * makes min/max stats prunable for ONE leading key; a second predicate
  * column still spans the full domain in every file. Z-order interleaves
  * the bits of several quantile-bucketed keys, so each output file covers
  * a small HYPER-RECTANGLE of the key space — predicates on ANY clustered
  * column (alone or combined) skip most files/row groups.
  *
  * Pipeline shape (everything distributed except a 2^bits-sized boundary
  * array, which is model-scale like IVF centroids, not data-scale):
  *  1. one `approxQuantile` pass computes per-column bucket boundaries
  *     (quantile bucketing — equal-population buckets, so skewed columns
  *     still spread across the curve; a linear min/max split would dump
  *     a Zipfian column into one bucket);
  *  2. per row, each key is bucketed against its boundary array and the
  *     bucket bits are interleaved into one long z-value (pure Column
  *     arithmetic — shifts/ors, no UDF);
  *  3. `repartitionByRange(z)` + `sortWithinPartitions(z)` orders the
  *     data along the curve; the range exchange's sampling keeps output
  *     partitions even.
  */
object Layout {

  /** Bucket id (0..2^bits-1) of `c` against sorted interior `boundaries`
    * (length 2^bits - 1): the number of boundaries ≤ value. A 255-element
    * fold per row is write-side-only cost, paid once to make every
    * subsequent scan prunable. Nulls sort to bucket 0 (they carry no
    * pruning signal either way). */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column = {
    val arr = array(boundaries.map(lit).toIndexedSeq: _*)
    aggregate(arr, lit(0L),
      (acc, b) => acc + when(c.isNotNull && c.cast("double") >= b, 1L).otherwise(0L))
  }

  /** Interleave `bits` bits of each bucket column into one Morton code:
    * bit i of column j lands at position i·n + j. Total bits·n must fit
    * a long. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms =
      for (i <- 0 until bits; (b, j) <- buckets.zipWithIndex)
        yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _) // disjoint bit positions: + == |
  }

  /** The z-value column for `df` over `cols`, with per-column quantile
    * boundaries from one shared approxQuantile pass. Exposed for tests
    * and for callers that want the curve order without the write. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
             relativeError: Double = 0.001): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits*cols must fit a long, got $bits*${cols.size}")
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    // one pass for ALL columns' boundaries; 2^bits doubles per column on
    // the driver — a model artifact, same envelope as IVF centroids
    val boundaries = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat.approxQuantile(cols.toArray, probs, relativeError)
    val buckets = cols.zip(boundaries).map { case (c, b) => bucketOf(col(c), b) }
    interleave(buckets, bits)
  }

  /** Z-order clustered parquet write: order along the Morton curve, then
    * range-partition so each file covers one compact curve segment (= a
    * small hyper-rectangle per file, pairwise-disjoint z-ranges). */
  def zOrderWrite(df: DataFrame, path: String, cols: Seq[String],
                  partitions: Int, bits: Int = 8,
                  mode: String = "overwrite"): Unit = {
    require(partitions > 0, s"partitions must be positive, got $partitions")
    val z = zValue(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}
