package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // uniform 64×64 grid — every (x, y) cell once
  private def grid = (for (x <- 0 until 64; y <- 0 until 64)
    yield (x.toLong * 64 + y, x, y)).toDF("id", "x", "y").repartition(8)

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)

  private def fileRanges(dir: String, c: String): Seq[(Int, Int)] =
    parquetFiles(dir).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath).agg(min(c), max(c)).head()
      (r.getInt(0), r.getInt(1))
    }

  test("zValue: deterministic, and equal inputs get equal codes") {
    val df = grid
    val z1 = df.withColumn("z", Layout.zValue(df, Seq("x", "y"), bits = 3))
      .orderBy("id").select("z").as[Long].collect()
    val z2 = df.withColumn("z", Layout.zValue(df, Seq("x", "y"), bits = 3))
      .orderBy("id").select("z").as[Long].collect()
    assert(z1.sameElements(z2))
    assert(z1.min >= 0 && z1.max < (1L << 6)) // 2 cols × 3 bits
  }

  test("zOrderWrite bounds BOTH dimensions per file; single-key range clustering spans the second") {
    val zDir = Files.createTempDirectory("graft-zorder").toString
    Layout.zOrderWrite(grid, zDir, Seq("x", "y"), partitions = 16, bits = 3)
    val xDir = Files.createTempDirectory("graft-xrange").toString
    graft.io.Sinks.parquetRangeClustered(grid, xDir, Seq("x"), partitions = 16)

    // data intact under both layouts
    assert(spark.read.parquet(zDir).count() == 4096)
    assert(spark.read.parquet(xDir).count() == 4096)

    // x-only layout: every file spans (nearly) the whole y domain
    val xLayoutY = fileRanges(xDir, "y")
    assert(xLayoutY.forall { case (lo, hi) => hi - lo >= 56 },
      s"x-clustered files unexpectedly narrow in y: $xLayoutY")

    // z-order: files are (mostly) hyper-rectangles. A file whose z-range
    // straddles a high-bit curve boundary legitimately spans wide in one
    // dimension (curve jump + sampled range boundaries), so the layout
    // property is statistical: extents are bounded on average and in
    // count, not per-file worst case.
    val zLayoutY = fileRanges(zDir, "y")
    val zLayoutX = fileRanges(zDir, "x")
    def avgSpan(rs: Seq[(Int, Int)]) = rs.map { case (lo, hi) => hi - lo }.sum.toDouble / rs.size
    assert(avgSpan(zLayoutY) <= 40, s"avg y-extent too wide: $zLayoutY")
    assert(avgSpan(zLayoutX) <= 40, s"avg x-extent too wide: $zLayoutX")
    assert(zLayoutY.count { case (lo, hi) => hi - lo > 48 } <= 3, s"too many y-wide files: $zLayoutY")
    assert(zLayoutX.count { case (lo, hi) => hi - lo > 48 } <= 3, s"too many x-wide files: $zLayoutX")
    // the payoff: a y-only slice predicate prunes files the x layout cannot
    val zHit = zLayoutY.count { case (lo, hi) => lo <= 15 && hi >= 0 }
    val xHit = xLayoutY.count { case (lo, hi) => lo <= 15 && hi >= 0 }
    assert(xHit == 16, "single-key layout should be unable to prune a y slice")
    assert(zHit <= 10, s"z-order should skip files for a y slice, hit $zHit/16")
  }
}
