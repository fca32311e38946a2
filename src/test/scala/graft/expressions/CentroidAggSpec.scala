package graft.expressions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CentroidAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val centroid = udaf(CentroidAgg, ExpressionEncoder[Array[Float]]())

  test("centroid is the element-wise mean, merged across partitions") {
    val df = Seq(
      (0, Array(1f, 3f)), (0, Array(3f, 5f)),
      (1, Array(10f, 0f))).toDF("label", "embedding").repartition(4)
    val got = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(got == Map(0 -> Seq(2.0, 4.0), 1 -> Seq(10.0, 0.0)))
  }

  test("ragged vectors: per-position mean over only the vectors that have the position") {
    // AVG-per-position semantics (matches a SQL AVG over unnested positions,
    // where absent positions are absent, not zero): dim 1 averages both
    // vectors, dim 2 averages only the vector that has it.
    val df = Seq((0, Array(2f)), (0, Array(4f, 6f))).toDF("label", "embedding")
    val got = df.groupBy("label").agg(centroid(col("embedding")).as("c"))
      .collect()(0).getSeq[Double](1).toSeq
    assert(got == Seq(3.0, 6.0)) // (2+4)/2, 6/1
  }

  test("ragged merge is order-independent across partial buffers") {
    val x = CentroidAgg.reduce(CentroidAgg.zero, Array(2f))
    val y = CentroidAgg.reduce(CentroidAgg.zero, Array(4f, 6f))
    assert(CentroidAgg.finish(CentroidAgg.merge(x, y)).toSeq ==
      CentroidAgg.finish(CentroidAgg.merge(y, x)).toSeq)
  }

  test("pure Aggregator semantics: zero/reduce/merge/finish") {
    val b = CentroidAgg.reduce(CentroidAgg.zero, Array(1f, 2f))
    val c = CentroidAgg.reduce(CentroidAgg.zero, Array(3f, 4f))
    val m = CentroidAgg.merge(b, c)
    assert(CentroidAgg.finish(m).toSeq == Seq(2.0, 3.0))
    assert(CentroidAgg.finish(CentroidAgg.zero).isEmpty)
  }
}
