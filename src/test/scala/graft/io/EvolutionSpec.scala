package graft.io

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EvolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // a table whose generations drifted: v1 (id int, x int), v2 adds y.
  // (mergeSchema itself cannot reconcile int-vs-long files for one
  // column, so on-disk types stay per-column uniform; widening is the
  // CALLER's request — expected declares x as long below.)
  private def evolvedDir(): String = {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/t"
    Seq((1, 10), (2, 20)).toDF("id", "x")
      .write.mode("append").parquet(dir)
    Seq((3, 30, "a"), (4, 40, "b"), (5, 50, "c")).toDF("id", "x", "y")
      .write.mode("append").parquet(dir)
    dir
  }

  test("evolved read conforms all generations: missing columns as typed nulls, safe int->long widening") {
    val expected = StructType(Seq(
      StructField("id", IntegerType), StructField("x", LongType),
      StructField("y", StringType)))
    val df = Sources.parquetEvolved(spark, evolvedDir(), expected)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == Seq(("id", IntegerType), ("x", LongType), ("y", StringType)))
    val rows = df.orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1), r.get(2))).toSeq
    assert(rows == Seq((1, 10L, null), (2, 20L, null),
      (3, 30L, "a"), (4, 40L, "b"), (5, 50L, "c")))
  }

  test("caller-dropped columns vanish; a column no generation has surfaces as all-null") {
    val expected = StructType(Seq(
      StructField("id", IntegerType), StructField("z", DoubleType)))
    val df = Sources.parquetEvolved(spark, evolvedDir(), expected)
    assert(df.columns.toSeq == Seq("id", "z"))
    assert(df.count() == 5 && df.filter("z IS NOT NULL").count() == 0)
  }

  test("lossy mismatch fails loudly instead of silently truncating") {
    val expected = StructType(Seq(
      StructField("id", IntegerType), StructField("y", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      Sources.parquetEvolved(spark, evolvedDir(), expected)
    }
    assert(e.getMessage.contains("not a safe widening"))
  }
}
