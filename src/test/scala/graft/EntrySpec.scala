package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract surface itself: entry() must run the EP1 pipeline
  * green and return a non-empty report (the driver's rows>0 smoke), and
  * the registries must stay consistent. */
class EntrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("entry() runs the flagship pipeline and returns stage rows") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getAs[Boolean]("ok")), "entry() must gate on all-stages-ok")
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
