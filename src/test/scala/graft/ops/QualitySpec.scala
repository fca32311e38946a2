package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ops.Quality.Rule

/** Pins the reference quality formula (data_validator.py:149-152):
  * score = max(0, (rows − Σ RULE VIOLATIONS)/rows·100) — null counts are
  * reported but must NOT penalize (the round-1 dead-twin bug). */
class QualitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (Some(10.0), Some(1.0)),   // clean
    (Some(-5.0), Some(1.0)),   // fare violation
    (None, Some(300.0)),       // fare null + dist violation
    (Some(20.0), None)         // dist null, no violation
  ).toDF("fare", "dist")

  private val rules = Seq(
    Rule("bad_fare", col("fare") < 0),
    Rule("bad_dist", col("dist") > 200))

  test("report: score counts rule violations only, not nulls") {
    val r = Quality.report(df, Seq("fare", "dist"), rules)
    assert(r.totalRows == 4)
    assert(r.nullCounts == Map("fare" -> 1L, "dist" -> 1L))
    assert(r.ruleViolations == Map("bad_fare" -> 1L, "bad_dist" -> 1L))
    // (4 − 2)/4·100 = 50.0 — were nulls wrongly penalized this would be 0.0
    assert(r.qualityScore == 50.0)
    assert(r.completeness("fare") == 75.0 && r.completeness("dist") == 75.0)
  }

  test("report: score floors at 0 and handles the empty frame") {
    val allBad = Seq(-1.0, -2.0).toDF("fare").withColumn("dist", lit(999.0))
    assert(Quality.report(allBad, Seq("fare"), rules).qualityScore == 0.0)
    val empty = spark.emptyDataFrame
      .withColumn("fare", lit(0.0)).withColumn("dist", lit(0.0)).limit(0)
    assert(Quality.report(empty, Seq("fare"), rules).qualityScore == 0.0)
  }

  test("duplicateCount counts surplus copies, not distinct groups") {
    val d = Seq(1, 1, 1, 2, 2, 3).toDF("x")
    assert(Quality.duplicateCount(d) == 3) // two extra 1s + one extra 2
    assert(Quality.duplicateCount(Seq(1, 2, 3).toDF("x")) == 0)
  }

  test("metricsPlan produces one row with named null and rule counts") {
    val row = Quality.metricsPlan(df, Seq("fare"), rules).collect()(0)
    assert(row.getAs[Long]("total_rows") == 4)
    assert(row.getAs[Long]("fare_nulls") == 1)
    assert(row.getAs[Long]("bad_dist") == 1)
  }

  test("validateSchema: critical beats required in the error report") {
    val d = Seq((1.0, 2.0)).toDF("a", "b")
    assert(Quality.validateSchema(d, Set("a", "b"), Set("a")).isRight)
    assert(Quality.validateSchema(d, Set("a", "b", "c"), Set("a"))
      .left.exists(_.contains("missing columns: c")))
    assert(Quality.validateSchema(d, Set("a", "z"), Set("z"))
      .left.exists(_.contains("critical")))
  }
}
