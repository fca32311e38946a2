package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator: element-wise mean of `array<float>` embedding
  * columns — the centroid computation IVF/KMeans training is built from
  * (SURVEY.md §7.3: custom `Aggregator`s enter exactly here, "centroid
  * aggregation over embedding arrays"; nothing in reference parity needs
  * one).
  *
  * Buffer = (per-dimension double sums, per-dimension counts): partial
  * aggregation and merge are both O(dim), fully map-side combinable — the
  * same distribution shape as any built-in sum. Floats are widened to
  * double before accumulation (same discipline as [[CosineSimilarity]]).
  * Ragged inputs grow the buffer to the longest vector seen; dimension i
  * of the result is the mean over ONLY the vectors that have dimension i
  * (per-position AVG — matching a SQL `AVG(v[i])` over unnested positions,
  * where absent positions are absent, not zero).
  */
object CentroidAgg extends Aggregator[Array[Float], (Array[Double], Array[Long]), Array[Double]] {

  override def zero: (Array[Double], Array[Long]) = (Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(b: (Array[Double], Array[Long]), a: Array[Float]): (Array[Double], Array[Long]) = {
    if (a == null) return b
    val sums = if (b._1.length >= a.length) b._1 else java.util.Arrays.copyOf(b._1, a.length)
    val cnts = if (b._2.length >= a.length) b._2 else java.util.Arrays.copyOf(b._2, a.length)
    var i = 0
    while (i < a.length) { sums(i) += a(i).toDouble; cnts(i) += 1L; i += 1 }
    (sums, cnts)
  }

  override def merge(x: (Array[Double], Array[Long]), y: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    val n = math.max(x._1.length, y._1.length)
    val sums = java.util.Arrays.copyOf(if (x._1.length == n) x._1 else y._1, n)
    val cnts = java.util.Arrays.copyOf(if (x._1.length == n) x._2 else y._2, n)
    val (osums, ocnts) = if (x._1.length == n) (y._1, y._2) else (x._1, x._2)
    var i = 0
    while (i < osums.length) { sums(i) += osums(i); cnts(i) += ocnts(i); i += 1 }
    (sums, cnts)
  }

  override def finish(b: (Array[Double], Array[Long])): Array[Double] = {
    val out = new Array[Double](b._1.length)
    var i = 0
    while (i < out.length) { out(i) = if (b._2(i) == 0L) 0.0 else b._1(i) / b._2(i); i += 1 }
    out
  }

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    ExpressionEncoder[(Array[Double], Array[Long])]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
