package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables
import graft.ops.Similarity

class CosineExpressionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("graft_cosine is registered via SparkSessionExtensions and callable from SQL") {
    val got = Seq((Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c").as[Double].collect()(0)
    assert(got == 1.0)
  }

  test("native expression is bit-identical to the higher-order-function form on real embeddings") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val both = e.crossJoin(broadcast(q))
      .select(
        expr("graft_cosine(embedding, qe)").as("native"),
        Similarity.cosine(col("embedding"), col("qe")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("ragged (unequal-length) inputs yield NULL, matching the HOF form") {
    val df = Seq((Array(1f, 2f), Array(1f))).toDF("a", "b")
    assert(df.selectExpr("graft_cosine(a, b) AS c").collect()(0).isNullAt(0))
    val hof = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()(0)
    assert(hof.isNullAt(0)) // the contract both forms share
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1f, 0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.selectExpr("graft_cosine(a, b) AS c").collect()(0)
    assert(r.isNullAt(0))
  }

  test("wrong arity is rejected at analysis") {
    intercept[Exception] {
      Seq(Tuple1(Array(1f))).toDF("a").selectExpr("graft_cosine(a)").collect()
    }
  }
}
