package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExpectationsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10 rows: 2 null fares, 1 out-of-range fare, 1 out-of-range distance,
  // 1 bad payment code, 1 null distance (ignored by Between)
  private def trips = Seq(
    (Some(10.0), Some(2.0), "card"),
    (Some(20.0), Some(5.0), "card"),
    (None: Option[Double], Some(1.0), "cash"),
    (Some(600.0), Some(3.0), "card"),
    (Some(30.0), Some(150.0), "cash"),
    (Some(5.0), None: Option[Double], "card"),
    (None: Option[Double], Some(2.5), "wire"),
    (Some(15.0), Some(1.5), "cash"),
    (Some(25.0), Some(4.0), "card"),
    (Some(40.0), Some(9.0), "cash")
  ).toDF("fare_amount", "trip_distance", "payment")

  test("GX semantics: value expectations ignore nulls; mostly thresholds gate pass/fail") {
    import Expectations._
    val report = evaluate(trips, Seq(
      NotNull("fare_amount"),                         // 2/10 null -> fails at 1.0
      Between("fare_amount", 0, 500),                 // 1 violation of 8 evaluated
      Between("trip_distance", 0, 100),               // 1 of 9 (null ignored)
      InSet("payment", Seq("card", "cash")),          // 1 'wire' of 10
      Matches("payment", "^(card|cash)$", mostly = 0.9)))
    val byName = report.results.map(r => r.name -> r).toMap
    assert(report.totalRows == 10)
    assert(!byName("fare_amount_not_null").passed &&
      byName("fare_amount_not_null").violations == 2 &&
      byName("fare_amount_not_null").evaluated == 10)
    // mostly variants of the SAME expectation (the name guard rejects
    // them in one suite): rate 0.8 >= 0.8 passes; 7/8 = 0.875 >= 0.8
    val eased = evaluate(trips, Seq(
      NotNull("fare_amount", mostly = 0.8),
      Between("fare_amount", 0, 500, mostly = 0.8)))
    assert(eased.passed, eased.results.mkString("; "))
    assert(byName("fare_amount_between").violations == 1 &&
      byName("fare_amount_between").evaluated == 8) // nulls ignored
    assert(byName("trip_distance_between").violations == 1 &&
      byName("trip_distance_between").evaluated == 9)
    assert(byName("payment_in_set").violations == 1 && !byName("payment_in_set").passed)
    assert(byName("payment_matches").passed) // 9/10 = 0.9 >= 0.9
    assert(!report.passed && report.failures.nonEmpty)
  }

  test("duplicate expectation names refuse loudly") {
    import Expectations._
    intercept[IllegalArgumentException](
      evaluate(trips, Seq(NotNull("fare_amount"), NotNull("fare_amount", mostly = 0.5))))
    intercept[IllegalArgumentException](evaluate(trips, Seq.empty))
  }

  test("evaluateDF == evaluate, as one scan (single aggregate in the plan)") {
    import Expectations._
    val suite = Seq(
      NotNull("fare_amount"),
      Between("fare_amount", 0, 500),
      InSet("payment", Seq("card", "cash"), mostly = 0.85))
    val df = evaluateDF(trips, suite)
    // exactly one aggregate over the input: the explode fans the single
    // agg row out, it does not re-aggregate per expectation
    val aggs = "HashAggregate".r.findAllIn(df.queryExecution.sparkPlan.toString).length
    assert(aggs == 2, s"expected one partial+final aggregate pair, got $aggs")
    val rows = df.collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val rep = evaluate(trips, suite)
    rep.results.foreach { r =>
      assert(rows(r.name) == ((r.violations, r.evaluated, r.passed)),
        s"${r.name}: DF ${rows(r.name)} vs report $r")
    }
    // mostly 0.85 on 9/10 passes through the exact ppm arithmetic
    assert(rows("payment_in_set")._3)
  }

  test("Satisfies on null-bearing data: nulls ignored, violations <= evaluated, evaluate == evaluateDF") {
    import Expectations._
    // 2 null fares (ignored), 600 violates the predicate, 3 pass it; and a
    // predicate that goes NULL on a non-null row (payment null) counts as
    // a violation — the r12 advice's exact divergence case
    val suite = Seq(
      Satisfies("fare_reasonable", "fare_amount", col("fare_amount") < 500),
      Satisfies("fare_vs_payment", "fare_amount",
        when(col("payment") === "wire", lit(null)).otherwise(lit(true))))
    val rep = evaluate(trips, suite)
    val byName = rep.results.map(r => r.name -> r).toMap
    val reasonable = byName("fare_reasonable")
    assert(reasonable.evaluated == 8 && reasonable.violations == 1,
      s"nulls must be ignored: $reasonable")
    assert(reasonable.violations <= reasonable.evaluated)
    // null predicate on a non-null row = violation (the 'wire' rows with
    // non-null fares: rows 7 has null fare so only... check: wire row has
    // fare null -> ignored entirely); craft a second wire row via union
    val withWire = trips.union(Seq((Some(99.0), Some(1.0), "wire"))
      .toDF("fare_amount", "trip_distance", "payment"))
    val rep2 = evaluate(withWire, suite)
    val vsPay = rep2.results.map(r => r.name -> r).toMap.apply("fare_vs_payment")
    assert(vsPay.evaluated == 9 && vsPay.violations == 1, s"null predicate on non-null row must violate: $vsPay")
    // evaluate and evaluateDF agree row-for-row on the null-bearing suite
    val dfRows = evaluateDF(withWire, suite).collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    evaluate(withWire, suite).results.foreach { r =>
      assert(dfRows(r.name) == ((r.violations, r.evaluated, r.passed)),
        s"${r.name}: DF ${dfRows(r.name)} vs report $r")
    }
  }

  test("empty frame: between/in_set evaluate zero rows and pass; not_null passes vacuously") {
    import Expectations._
    val rep = evaluate(trips.filter(lit(false)), Seq(
      NotNull("fare_amount"), Between("fare_amount", 0, 500)))
    assert(rep.totalRows == 0 && rep.passed)
  }

  test("the reference's declared taxi suite evaluates (the GX dead code, live here)") {
    import Expectations._
    val taxi = Seq(
      (Some(10.0), 2.0, 1), (Some(700.0), 5.0, 2), (None: Option[Double], 120.0, 9)
    ).toDF("fare_amount", "trip_distance", "passenger_count")
    val rep = evaluate(taxi, TaxiSuite)
    val byName = rep.results.map(r => r.name -> r).toMap
    assert(byName("fare_amount_not_null").violations == 1)
    assert(byName("fare_amount_between").violations == 1)  // 700 > 500
    assert(byName("trip_distance_between").violations == 1) // 120 > 100
    assert(byName("passenger_count_between").violations == 1) // 1,2 in [1,6]; 9 out
  }
}
