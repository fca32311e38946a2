package graft.io

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class FetchSpec extends AnyFunSuite {

  test("fetchToLocal streams a URL to disk in chunks and is idempotent") {
    val dir = Files.createTempDirectory("graft-fetch")
    val src = dir.resolve("src.bin")
    val payload = Array.tabulate[Byte](20000)(i => (i % 251).toByte) // > 2 chunks
    Files.write(src, payload)
    val dest = dir.resolve("dest.bin").toString

    val n = Fetch.fetchToLocal(src.toUri.toString, dest)
    assert(n == 20000 && Files.readAllBytes(Paths.get(dest)).sameElements(payload))
    // second fetch skips (returns existing size, no re-download)
    assert(Fetch.fetchToLocal(src.toUri.toString, dest) == 20000)
  }

  test("fetchAll isolates per-URL failures") {
    val dir = Files.createTempDirectory("graft-fetch2")
    val src = dir.resolve("ok.bin")
    Files.write(src, "data".getBytes)
    val out = Fetch.fetchAll(
      Seq(src.toUri.toString, "file:///nonexistent/really/missing.bin"),
      dir.resolve("land").toString)
    assert(out.head._2 == Right(4L))
    assert(out(1)._2.isLeft)
  }
}
