package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the canonical semantics decisions of SURVEY.md §7.4.1 (left-closed
  * buckets — the reference's own pandas/Spark paths disagree here) and the
  * D2/D3 guard behavior at zero, negative, and null denominators. */
class FeaturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bucketize is left-closed: value == split goes to the UPPER bucket") {
    val labels = Seq("low", "mid", "high", "very_high")
    val df = Seq(0.0, 9.999, 10.0, 24.999, 25.0, 39.999, 40.0, 1e9).toDF("x")
    val got = df.select(Features.bucketize(col("x"), Seq(10, 25, 40), labels).as("b"))
      .as[String].collect().toSeq
    assert(got == Seq("low", "low", "mid", "mid", "high", "high", "very_high", "very_high"))
  }

  test("bucketize rejects mis-sized labels and unsorted splits") {
    intercept[IllegalArgumentException] {
      Features.bucketize(col("x"), Seq(1, 2), Seq("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Features.bucketize(col("x"), Seq(2, 1), Seq("a", "b", "c"))
    }
  }

  test("guardedDiv: positive denominator divides; zero/negative/null → 0") {
    val df = Seq(
      (Some(10.0), Some(4.0)),
      (Some(10.0), Some(0.0)),
      (Some(10.0), Some(-2.0)),
      (Some(10.0), None)).toDF("n", "d")
    val got = df.select(Features.guardedDiv(col("n"), col("d")).as("r"))
      .as[Double].collect().toSeq
    assert(got == Seq(2.5, 0.0, 0.0, 0.0))
  }

  test("guardedPct mirrors the reference tip_percentage formula") {
    val df = Seq((50.0, 200.0), (50.0, 0.0)).toDF("n", "d")
    val got = df.select(Features.guardedPct(col("n"), col("d")).as("r"))
      .as[Double].collect().toSeq
    assert(got == Seq(25.0, 0.0))
  }
}
