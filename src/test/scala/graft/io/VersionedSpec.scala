package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class VersionedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("write/read/time-travel: pinned versions stay immutable as new snapshots land") {
    val dir = Files.createTempDirectory("graft-versioned").toString + "/t"
    val v1 = Versioned.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val v2 = Versioned.write(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"), dir)
    assert((v1, v2) == ((1L, 2L)))
    assert(Versioned.versions(spark, dir) == Seq(1L, 2L))
    assert(Versioned.latestVersion(spark, dir).contains(2L))
    // latest == v2; v1 still reads exactly as written
    assert(Versioned.read(spark, dir).orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("a", "B", "c"))
    assert(Versioned.read(spark, dir, Some(1L)).orderBy("id")
      .collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("diff between versions classifies added/removed/changed") {
    val dir = Files.createTempDirectory("graft-versioned2").toString + "/t"
    Versioned.write(Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "v"), dir)
    Versioned.write(Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v"), dir)
    val d = Versioned.diff(spark, dir, 1L, 2L, Seq("id"))
      .select("id", "change").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "added", 4L -> "removed"))
  }

  test("retention drops only the oldest versions; numbering continues after GC") {
    val dir = Files.createTempDirectory("graft-versioned4").toString + "/t"
    (1 to 4).foreach(i => Versioned.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), dir))
    assert(Versioned.retain(spark, dir, keep = 2) == Seq(1L, 2L))
    assert(Versioned.versions(spark, dir) == Seq(3L, 4L))
    assert(Versioned.read(spark, dir).collect().map(_.getString(1)).toSeq == Seq("v4"))
    intercept[IllegalArgumentException](Versioned.read(spark, dir, Some(1L)))
    // next commit continues from the retained tail, never reuses numbers
    assert(Versioned.write(Seq((9L, "v5")).toDF("id", "v"), dir) == 5L)
    intercept[IllegalArgumentException](Versioned.retain(spark, dir, keep = 0))
  }

  test("missing versions and empty tables fail loudly; aborted tmp never surfaces as a version") {
    val dir = Files.createTempDirectory("graft-versioned3").toString + "/t"
    intercept[IllegalArgumentException](Versioned.read(spark, dir))
    Versioned.write(Seq((1L, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException](Versioned.read(spark, dir, Some(7L)))
    // a stale tmp (crashed commit) is invisible to listing and readers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, ".v=2.tmp"))
    assert(Versioned.versions(spark, dir) == Seq(1L))
    // and the next commit sweeps it, landing as v=2 normally
    assert(Versioned.write(Seq((2L, "b")).toDF("id", "v"), dir) == 2L)
    assert(Versioned.read(spark, dir, Some(2L)).count() == 1)
  }
}
