package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def media = Seq(
    (0L, "image", "abcd".getBytes("UTF-8")),
    (1L, "audio", Array[Byte](0, 127, -128, -1)),
    (2L, "video", ("x" * 5000).getBytes("UTF-8"))).toDF("media_id", "kind", "payload")

  test("decodeFeatures: deterministic stub stats over partition batches") {
    val got = Multimodal.decodeFeatures(Multimodal.asMedia(media.repartition(3)))
      .collect().map(f => f.media_id -> f).toMap
    assert(got(0L).n_bytes == 4 && got(0L).mean_byte == ('a' + 'b' + 'c' + 'd').toDouble / 4)
    assert(got(1L).mean_byte == (0 + 127 + 128 + 255).toDouble / 4) // unsigned bytes
    assert(got.values.forall(f => f.width >= 64 && f.height >= 64))
    // determinism across runs (hash-derived fake dims are seeded)
    val again = Multimodal.decodeFeatures(Multimodal.asMedia(media)).collect()
      .map(f => f.media_id -> f).toMap
    assert(got == again)
  }

  test("payloadStats aggregates opaque binaries without decoding") {
    val stats = Multimodal.payloadStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats == Map("image" -> 4L, "audio" -> 4L, "video" -> 5000L))
  }

  test("frameOffsets samples every stride-th block of video payloads only") {
    val got = Multimodal.frameOffsets(media, blockSize = 1000, stride = 2).collect()
    assert(got.length == 1 && got(0).getLong(0) == 2L)
    assert(got(0).getSeq[Long](1) == Seq(0L, 2L, 4L)) // blocks 0..4, stride 2
  }

  test("mediaFromDocuments: kinds cycle by id, payload bytes round-trip the text") {
    val docs = Seq((0L, "hello"), (1L, "wo"), (2L, "rld")).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(m.toSet == Set((0L, "image", "hello"), (1L, "audio", "wo"), (2L, "video", "rld")))
  }
}
