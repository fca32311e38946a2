package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

class IvmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def facts = Seq(
    (1L, 10L, "f1"), (2L, 10L, "f2"), (3L, 20L, "f3"),
    (4L, 30L, "f4"), (5L, 99L, "f5")).toDF("fk", "k", "fval")

  private def dims = Seq(
    (10L, "d10"), (20L, "d20"), (30L, "d30"), (40L, "d40"))
    .toDF("k", "dval")

  test("two-increment fold on real tables equals the full join, bag-exact") {
    val a = graft.model.Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val b = graft.model.Tables.customer(spark, TestSpark.sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
    val Seq(a0, a1, a2) = (0 to 2).map(i => a.filter(col("o_orderkey") % 3 === i))
    val b0 = b.filter(col("o_custkey") % 2 === 0)
    val b1 = b.filter(col("o_custkey") % 2 =!= 0)
    val v0 = a0.join(b0, Seq("o_custkey"))
    val v1 = Ivm.maintainJoinView(v0, a0, a1, b0, b0.limit(0), Seq("o_custkey"))
    val v2 = Ivm.maintainJoinView(v1, a0.unionByName(a1), a2, b0, b1, Seq("o_custkey"))
    val full = a.join(b, Seq("o_custkey"))
    // o_orderkey is unique so set compare == bag compare here
    assert(rows(v2.select("o_orderkey", "o_custkey", "o_totalprice", "c_name")) ==
      rows(full.select("o_orderkey", "o_custkey", "o_totalprice", "c_name")))
    assert(v2.count() == full.count())
  }

  test("empty deltas are a no-op; delta join preserves duplicates (bag semantics)") {
    val a = facts
    val b = dims
    val v = a.join(b, Seq("k"))
    val folded = Ivm.maintainJoinView(v, a, a.limit(0), b, b.limit(0), Seq("k"))
    assert(rows(folded) == rows(v) && folded.count() == v.count())
    // duplicate fact rows must each appear in the maintained view
    val dupDelta = Seq((6L, 10L, "f6"), (6L, 10L, "f6")).toDF("fk", "k", "fval")
    val folded2 = Ivm.maintainJoinView(v, a, dupDelta, b, b.limit(0), Seq("k"))
    assert(folded2.filter($"fk" === 6L).count() == 2)
  }

  test("payload-column clash and schema drift are rejected loudly") {
    val clash = Seq((10L, "x")).toDF("k", "fval") // same payload name as facts
    intercept[IllegalArgumentException](
      Ivm.joinViewDelta(facts, facts.limit(0), clash, clash.limit(0), Seq("k")))
    val drifted = facts.withColumnRenamed("fval", "other")
    intercept[IllegalArgumentException](
      Ivm.joinViewDelta(facts, drifted, dims, dims.limit(0), Seq("k")))
  }

  test("CDC form: upserts + deletes against the view equal a recompute over the merged fact side") {
    val v = facts.join(dims, Seq("k"))
    val changes = Seq(
      (2L, 20L, "f2-moved", "upsert", 1L),  // re-keyed fact
      (4L, 30L, "f4", "delete", 1L),        // removed fact
      (6L, 40L, "f6", "upsert", 1L),        // brand-new fact
      (6L, 10L, "f6-old", "upsert", 0L))    // stale seq — must lose
      .toDF("fk", "k", "fval", "op", "seq")
    val got = Ivm.applyToJoinView(v, changes, dims, Seq("fk"), Seq("k"))
    val mergedFacts = Merge.applyChangeLog(facts, changes, Seq("fk"))
    val want = mergedFacts.join(dims, Seq("k"))
    assert(rows(got.select("fk", "k", "fval", "dval")) ==
      rows(want.select("fk", "k", "fval", "dval")))
    assert(got.count() == want.count())
    // untouched rows (fk 1,3; fk 5 never matched) pass through; fk 4 gone
    assert(got.filter($"fk" === 4L).isEmpty)
    assert(got.filter($"fk" === 2L).select("dval").as[String].head() == "d20")
  }

  test("CDC form: view must carry the fact pk") {
    val v = facts.join(dims, Seq("k")).drop("fk")
    val ch = Seq((1L, 10L, "x", "upsert", 1L)).toDF("fk", "k", "fval", "op", "seq")
    intercept[IllegalArgumentException](
      Ivm.applyToJoinView(v, ch, dims, Seq("fk"), Seq("k")))
  }
}
