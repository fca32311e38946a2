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

  test("parseFeatures: header fields come back out of real container bytes") {
    val body = "opaque-body".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(10L, "image", MediaCodec.encodePng(123, 456, body)),
      Multimodal.MediaRow(11L, "audio", MediaCodec.encodeWav(22050, 2, body)),
      Multimodal.MediaRow(12L, "video", MediaCodec.encodeAvi(640, 480, 99, body))).toDS()
    val got = Multimodal.parseFeatures(rows.repartition(2)).collect()
      .map(f => f.media_id -> f).toMap
    assert(got(10L) == Multimodal.ParsedMedia(10L, "image", 33L + body.length,
      Some(123), Some(456), None, None, None))
    assert(got(11L) == Multimodal.ParsedMedia(11L, "audio", 44L + body.length,
      None, None, Some(22050), Some(2), None))
    assert(got(12L) == Multimodal.ParsedMedia(12L, "video", 88L + body.length,
      Some(640), Some(480), None, None, Some(99)))
  }

  test("parseFeatures: kind comes from BYTES, not metadata (crafted divergence)") {
    // metadata claims image, payload is a WAV — a features-from-metadata
    // implementation (or the old stub) could not produce kind='audio'
    val lying = Seq(Multimodal.MediaRow(0L, "image",
      MediaCodec.encodeWav(8000, 1, "x".getBytes("UTF-8")))).toDS()
    val f = Multimodal.parseFeatures(lying).collect().head
    assert(f.kind_sniffed == "audio" && f.sample_rate.contains(8000) && f.width.isEmpty)
  }

  test("parseFeatures: garbage and truncated payloads degrade to unknown, never throw") {
    val junk = Seq(
      Multimodal.MediaRow(0L, "image", Array.empty[Byte]),
      Multimodal.MediaRow(1L, "audio", Array[Byte](0x89.toByte, 'P', 'N')), // truncated sig
      Multimodal.MediaRow(2L, "video", "RIFFxxxxWAVE".getBytes("US-ASCII")), // RIFF but no fmt
      Multimodal.MediaRow(3L, "video", ("z" * 200).getBytes("UTF-8"))).toDS()
    val got = Multimodal.parseFeatures(junk).collect()
    assert(got.forall(f => f.kind_sniffed == "unknown" &&
      f.width.isEmpty && f.sample_rate.isEmpty && f.n_frames.isEmpty))
    assert(got.map(_.n_bytes).sorted.toSeq == Seq(0L, 3L, 12L, 200L))
  }

  test("mediaWithHeaders: generative formulas round-trip through encode→parse") {
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val got = Multimodal.parseFeatures(Multimodal.mediaWithHeaders(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(got(0L).kind_sniffed == "image" &&
      got(0L).width.contains(MediaCodec.imgWidth(0)) &&
      got(0L).height.contains(MediaCodec.imgHeight(0)))
    assert(got(1L).kind_sniffed == "audio" &&
      got(1L).sample_rate.contains(MediaCodec.audioRate(1)) &&
      got(1L).channels.contains(MediaCodec.audioChannels(1)))
    assert(got(2L).kind_sniffed == "video" &&
      got(2L).width.contains(MediaCodec.vidWidth(2)) &&
      got(2L).n_frames.contains(MediaCodec.vidFrames(2)))
    assert(got(3L).kind_sniffed == "image" && got(3L).n_bytes == 33L + "delta".length)
  }

  test("mediaFromDocuments: kinds cycle by id, payload bytes round-trip the text") {
    val docs = Seq((0L, "hello"), (1L, "wo"), (2L, "rld")).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(m.toSet == Set((0L, "image", "hello"), (1L, "audio", "wo"), (2L, "video", "rld")))
  }

  test("sharedChunkPairs finds planted shared 64-byte blocks, not unrelated payloads") {
    // payloads 10 and 11 share their first two 64-byte blocks exactly;
    // 12 is disjoint; 13 shares only ONE block with 10 (below minShared)
    val block = "a" * 64
    val block2 = "b" * 64
    val media = Seq(
      (10L, block + block2 + "tail-one"),
      (11L, block + block2 + "different-tail"),
      (12L, "c" * 150),
      (13L, block + "x" * 64))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        col("text").cast("binary").as("payload"))
    val got = Multimodal.sharedChunkPairs(media, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 11L, 2L)))
    // df-cap parity: no hot chunks here, so the capped plan agrees
    val capped = Multimodal.sharedChunkPairs(media, minShared = 2,
      maxDf = Some(graft.ops.Dedup.DefaultMaxDf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == got)
  }

  test("audioFrameEnergy: hand-built PCM decodes LE int16 with two's complement; ragged tail frame") {
    // samples 1, -1, 300 → bytes 01 00 / FF FF / 2C 01 (little-endian)
    val body = Array[Byte](0x01, 0x00, 0xFF.toByte, 0xFF.toByte, 0x2C, 0x01)
    val wav = MediaCodec.encodeWav(8000, 1, body)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav),
      Multimodal.MediaRow(2L, "video", wav),                    // wrong kind: excluded
      Multimodal.MediaRow(3L, "audio", wav.take(44))).toDS.toDF // headers only: excluded
    val got = Multimodal.audioFrameEnergy(media, frameSamples = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 0, 2L, 2L), (1L, 1, 1L, 90000L)))
  }

  test("audioFrameEnergy: trailing odd byte dropped; energy matches a JVM-side recompute on the corpus") {
    val odd = MediaCodec.encodeWav(8000, 1, Array[Byte](0x01, 0x00, 0x7F))
    val media = Seq(Multimodal.MediaRow(1L, "audio", odd)).toDS.toDF
    val got = Multimodal.audioFrameEnergy(media).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1L && got.head.getLong(3) == 1L)

    // independent JVM recompute over the real generated corpus
    val docs = graft.model.Tables.documents(spark, graft.TestSpark.sfDir).limit(40)
    val fromEngine = Multimodal
      .audioFrameEnergy(Multimodal.mediaWithHeaders(docs).toDF(), frameSamples = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val expected = docs.select("doc_id", "text").collect()
      .filter(_.getLong(0) % 3 == 1)
      .flatMap { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val samples = b.grouped(2).filter(_.length == 2)
          .map(p => ((p(1) << 8) | (p(0) & 0xFF)).toShort.toLong).toArray
        samples.grouped(32).zipWithIndex.map { case (fr, i) =>
          (r.getLong(0), i) -> fr.map(s => s * s).sum
        }
      }.toMap
    assert(expected.nonEmpty && fromEngine == expected)
  }
}
