package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — north-star component.
  *
  * Model: media ride through the engine as opaque `binary` payload columns
  * with typed metadata alongside (SURVEY.md §7.6 "multimodal columns ride
  * through untouched"). Relational ops (filter/join/group/sink) treat the
  * payload as bytes; decode/feature-extraction runs batch-wise per
  * partition — the Scala analog of Python's `mapInPandas`: an
  * `Iterator[row] => Iterator[row]` function applied once per partition,
  * so a real decoder would amortize model/codec initialization across the
  * partition and never touch the driver.
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[DecodedFeatures]] are a deterministic fake derived from the payload
  * bytes (length, mean byte, hash-derived fake dimensions). The Spark-side
  * plumbing — schema, encoders, partition batching, signature — is real
  * and tested; swapping in a JNI/codec call changes only the marked lines.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      mean_byte: Double, width: Int, height: Int)

  /** Derive a deterministic media table from the `documents` corpus:
    * payload = utf-8 bytes of the text (an opaque stand-in), kind cycles
    * image/audio/video by id. Pure column ops — this is how a real media
    * manifest (id, kind, bytes) enters the engine. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")), (col("doc_id") % 3).cast("int") + 1).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Batch decode via mapPartitions (the mapInPandas analog). A real
    * implementation opens the codec ONCE per partition and decodes each
    * payload; the stub computes deterministic byte statistics instead. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> real pipeline: initialize decoder/codec here, once per partition
      rows.map { m =>
        // >>> real pipeline: decoder.decode(m.payload) — STUBBED:
        val n = m.payload.length.toLong
        val mean = if (n == 0) 0.0 else m.payload.map(b => (b & 0xFF).toLong).sum.toDouble / n
        val h = scala.util.hashing.MurmurHash3.bytesHash(m.payload, 42)
        DecodedFeatures(m.media_id, m.kind, n, mean,
          width = 64 + math.abs(h % 1024), height = 64 + math.abs((h >> 10) % 1024))
      }
    }
  }

  /** Typed view of a media DataFrame (schema gate + encoder). */
  def asMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
  }

  /** Frame-offset sampling for video payloads: every `stride`-th block
    * offset as a frame index — pure Catalyst (sequence/transform), no
    * decode needed for manifest-level planning. */
  def frameOffsets(media: DataFrame, blockSize: Int = 1024, stride: Int = 4): DataFrame =
    media.filter(col("kind") === "video" && length(col("payload")) > 0)
      .select(col("media_id"),
        // empty payloads are filtered above: sequence(0, -1, +stride)
        // would otherwise throw on illegal boundaries
        sequence(lit(0L),
          floor((length(col("payload")).cast("long") - 1) / blockSize).cast("long"),
          lit(stride.toLong)).as("frame_blocks"))

  /** Payload-level stats usable WITHOUT decoding (the relational surface
    * over opaque media): per-kind counts and byte volumes. */
  def payloadStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n_items"),
      sum(length(col("payload")).cast("long")).as("total_bytes"),
      round(avg(length(col("payload"))), 4).as("avg_bytes"))
}
