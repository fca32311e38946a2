package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The shared staging-build + two-rename swap + crash recovery discipline
  * behind VectorIndex.refresh and PqIndex.refresh — exercised directly on
  * plain directories so every crash window is pinned without paying an
  * index build per case. */
class StagedSwapSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val markers = Seq("a/_SUCCESS", "b/_SUCCESS")

  private def mkLayout(dir: java.nio.file.Path, tag: String,
                       complete: Boolean = true): Unit = {
    java.nio.file.Files.createDirectories(dir.resolve("a"))
    java.nio.file.Files.createDirectories(dir.resolve("b"))
    java.nio.file.Files.writeString(dir.resolve("tag"), tag)
    java.nio.file.Files.writeString(dir.resolve("a/_SUCCESS"), "")
    if (complete) java.nio.file.Files.writeString(dir.resolve("b/_SUCCESS"), "")
  }
  private def tag(root: String): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(root, "tag"))
  private def tmpRoot(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-swap-$name").toString + "/live"

  test("swap builds under staging, promotes by two renames, clears retired; an incomplete build never swaps in") {
    val root = tmpRoot("ok")
    mkLayout(java.nio.file.Paths.get(root), "old")
    StagedSwap.swap(spark, root, markers) { staging =>
      mkLayout(java.nio.file.Paths.get(staging), "new")
    }
    assert(tag(root) == "new")
    assert(!new java.io.File(s"$root.refresh-staging").exists())
    assert(!new java.io.File(s"$root.refresh-retired").exists())

    // a build that leaves markers missing is refused BEFORE any rename —
    // the live layout keeps serving untouched
    val e = intercept[IllegalArgumentException] {
      StagedSwap.swap(spark, root, markers) { staging =>
        mkLayout(java.nio.file.Paths.get(staging), "broken", complete = false)
      }
    }
    assert(e.getMessage.contains("incomplete layout"), e.getMessage)
    assert(tag(root) == "new")
  }

  test("recover promotes a complete staging (crash after rename #1), else the retired tree; loud when nothing is recoverable") {
    // window (a): live retired, staging complete -> the NEW layout wins
    val ra = tmpRoot("crash-a")
    mkLayout(java.nio.file.Paths.get(s"$ra.refresh-retired"), "old")
    mkLayout(java.nio.file.Paths.get(s"$ra.refresh-staging"), "new")
    assert(StagedSwap.recover(spark, ra, markers))
    assert(tag(ra) == "new")
    assert(!new java.io.File(s"$ra.refresh-retired").exists())
    // idempotent: live exists now -> false, nothing moved
    assert(!StagedSwap.recover(spark, ra, markers))

    // window (b): build died mid-write (incomplete staging) -> the OLD
    // layout survives the failed refresh
    val rb = tmpRoot("crash-b")
    mkLayout(java.nio.file.Paths.get(s"$rb.refresh-retired"), "old")
    mkLayout(java.nio.file.Paths.get(s"$rb.refresh-staging"), "partial",
      complete = false)
    assert(StagedSwap.recover(spark, rb, markers))
    assert(tag(rb) == "old")
    assert(!new java.io.File(s"$rb.refresh-staging").exists())

    // nothing at the root at all: loud failure, not a silent absent layout
    intercept[IllegalStateException](
      StagedSwap.recover(spark, tmpRoot("empty"), markers))
  }
}
