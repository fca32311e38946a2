package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DetSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("dsum is exact for money values (matches BigDecimal, any partitioning)") {
    val rnd = new scala.util.Random(7)
    val money = Seq.fill(5000)(BigDecimal(rnd.nextInt(1000000)) / 100)
    val expected = money.sum.toDouble
    val df = money.map(_.toDouble).toDF("x").repartition(13)
    val got = df.agg(Det.dsum(col("x")).as("s")).as[Double].collect()(0)
    assert(got == expected) // bit-exact, not approx
  }

  test("dsum is invariant to partitioning (decimal accumulation is associative)") {
    val vals = Seq.tabulate(999)(i => (i % 997) / 100.0)
    val results = Seq(1, 7, 32).map { p =>
      vals.toDF("x").repartition(p).agg(Det.dsum(col("x"))).as[Double].collect()(0)
    }
    assert(results.distinct.size == 1)
  }

  test("davg divides the exact decimal sum by the non-null count") {
    val df = Seq(Some(0.1), Some(0.2), None).toDF("x")
    val got = df.agg(Det.davg(col("x")).as("a")).as[Double].collect()(0)
    assert(got == 0.30000000000000004 / 2 || got == 0.15) // exact decimal path → 0.15
    assert(got == 0.15)
  }

  test("rstddev is sample stddev (n−1), rounded") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    // population σ = 2, sample s = 2.13809...
    val got = df.agg(Det.rstddev(col("x"), 4).as("s")).as[Double].collect()(0)
    assert(got == 2.1381)
  }
}
