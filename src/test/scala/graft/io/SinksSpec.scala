package graft.io

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

class SinksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)

  test("parquetSized splits output near the target file size, tiny target => many files") {
    val df = Tables.lineitem(spark, TestSpark.sfDir)
    val dir = Files.createTempDirectory("graft-sized-small").toString
    // the plan estimate for sf0.001 lineitem is ~112 KB (the source file
    // size): a 16 KiB target must yield several files
    Sinks.parquetSized(df, dir, targetBytes = 16L * 1024)
    val files = parquetFiles(dir)
    assert(files.size > 1, s"expected a split, got ${files.size} file(s)")
    // read-back equality: sizing must never change the data
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
  }

  test("parquetSized collapses to one file when the target exceeds the data") {
    val df = Tables.nation(spark, TestSpark.sfDir)
    val dir = Files.createTempDirectory("graft-sized-big").toString
    Sinks.parquetSized(df, dir) // default 128 MiB >> 25-row dim
    assert(parquetFiles(dir).size == 1)
    assert(spark.read.parquet(dir).count() == df.count())
  }
}
