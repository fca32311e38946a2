package graft.io

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuarantineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-quarantine")
    val f = dir.resolve("data.txt")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("json ingest: malformed and type-mismatched lines quarantine with raw bytes intact; good rows keep the declared schema") {
    val good = Seq("""{"id": 1, "name": "a"}""", """{"id": 2, "name": "b"}""",
      """{"id": 3, "name": null}""")
    val bad = Seq("""{"id": "not-a-number", "name": "c"}""", """{broken json""")
    val in = writeLines(scala.util.Random.shuffle(good ++ bad))
    val qDir = Files.createTempDirectory("graft-qout").toString + "/q"

    val (rows, report) = Sources.jsonWithQuarantine(spark, in, schema, qDir)
    assert(report == Sources.IngestReport(good = 3, quarantined = 2))
    assert(rows.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(rows.count() == 3)
    assert(rows.orderBy("id").collect().map(r => (r.get(0), r.get(1))).toSeq
      == Seq((1L, "a"), (2L, "b"), (3L, null)))
    // quarantine holds the ORIGINAL lines, reviewable verbatim
    val q = spark.read.text(qDir).collect().map(_.getString(0)).toSet
    assert(q == bad.toSet)
  }

  test("csv ingest: same channel contract; clean input quarantines nothing") {
    val in = writeLines(Seq("1,a", "oops,b", "3,c"))
    val qDir = Files.createTempDirectory("graft-qout").toString + "/q"
    val (rows, report) = Sources.csvWithQuarantine(spark, in, schema, qDir)
    assert(report == Sources.IngestReport(good = 2, quarantined = 1))
    assert(rows.count() == 2)
    assert(spark.read.text(qDir).collect().map(_.getString(0)).toSeq == Seq("oops,b"))

    val cleanIn = writeLines(Seq("1,a", "2,b"))
    val qDir2 = Files.createTempDirectory("graft-qout2").toString + "/q"
    val (rows2, report2) = Sources.csvWithQuarantine(spark, cleanIn, schema, qDir2)
    assert(report2 == Sources.IngestReport(good = 2, quarantined = 0))
    assert(rows2.count() == 2)
  }

  test("a schema declaring the corrupt-record column is rejected loudly") {
    val badSchema = schema.add("_corrupt_record", StringType)
    intercept[IllegalArgumentException] {
      Sources.jsonWithQuarantine(spark, "/tmp/nope", badSchema, "/tmp/nope-q")
    }
  }
}
