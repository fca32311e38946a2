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
  * Buffer = (per-dimension double sums, row count): partial aggregation
  * and merge are both O(dim), fully map-side combinable — the same
  * distribution shape as any built-in sum. Floats are widened to double
  * before accumulation (same discipline as [[CosineSimilarity]]).
  * Ragged inputs grow the buffer to the longest vector seen; missing
  * trailing dimensions contribute zero.
  */
object CentroidAgg extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.length >= a.length) b._1 else java.util.Arrays.copyOf(b._1, a.length)
    var i = 0
    while (i < a.length) { sums(i) += a(i).toDouble; i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (small, big) = if (x._1.length <= y._1.length) (x._1, y._1) else (y._1, x._1)
    val sums = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { sums(i) += small(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0L) Array.emptyDoubleArray else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
