package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** §2.10 stateful streaming dedup: dropDuplicatesWithinWatermark removes
  * replayed events (same event_id redelivered inside the watermark) with
  * bounded state — the streaming counterpart of exact dedup. */
class StreamDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dropDuplicatesWithinWatermark removes replayed events in a real stream") {
    val events = Tables.events(spark, TestSpark.sfDir)
      .filter(col("user_id").isNotNull).limit(200)
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    // write the batch twice → every event is delivered twice
    events.write.mode("overwrite").parquet(s"$dir/a")
    events.write.parquet(s"$dir/b")
    spark.read.parquet(s"$dir/b").write.mode("append").parquet(s"$dir/a")

    val distinctIds = events.select("event_id").distinct().count()
    val streamed = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/a")
      .withWatermark("ts", "90 days") // corpus spans ~30 days → all dups in window
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy().count()
    val q = streamed.writeStream.format("memory")
      .queryName("dedup_counts").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val total = spark.table("dedup_counts").collect()(0).getLong(0)
    assert(total == distinctIds, s"expected $distinctIds deduped events, got $total")
  }

  test("streaming ingest == batch loop: foreachBatch incremental near-dup over a replayed corpus") {
    import spark.implicits._
    // archive holds an INTERNAL near-dup pair (1,2) that must never
    // surface (archive-internal pairs are the full run's business);
    // batch 1 brings a copy of doc 1, batch 2 brings two more copies
    // (cross-epoch AND within-batch pairs)
    val archive = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val batch1 = Seq(
      (100L, "a b c d e f g h i j"),
      (102L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val batch2 = Seq(
      (200L, "a b c d e f g h i j"),
      (201L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val expected = Set(
      (1L, 100L, 1.0, 1L), (2L, 100L, 1.0, 1L),                      // epoch 1
      (1L, 200L, 1.0, 2L), (2L, 200L, 1.0, 2L), (100L, 200L, 1.0, 2L),
      (1L, 201L, 1.0, 2L), (2L, 201L, 1.0, 2L), (100L, 201L, 1.0, 2L),
      (200L, 201L, 1.0, 2L))                                         // epoch 2
    def collectPairs(cfg: StreamingDedup.Config) =
      StreamingDedup.pairs(spark, cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val root = java.nio.file.Files.createTempDirectory("graft-stream-neardup").toString

    // batch-mode reference: the same loop body called once per batch
    val batchCfg = StreamingDedup.Config(s"$root/state_batch")
    StreamingDedup.init(spark, batchCfg, archive)
    StreamingDedup.processBatch(spark, batchCfg, batch1)
    StreamingDedup.processBatch(spark, batchCfg, batch2)
    val batchPairs = collectPairs(batchCfg)
    assert(batchPairs == expected, s"batch loop: $batchPairs")

    // stream replay: one file per micro-batch, ordered by mtime+name
    val src = new java.io.File(s"$root/src"); src.mkdirs()
    Seq(batch1 -> "b1", batch2 -> "b2").foreach { case (df, name) =>
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(if (name == "b1") 1000000L else 2000000L)
    }
    val streamCfg = StreamingDedup.Config(s"$root/state_stream")
    StreamingDedup.init(spark, streamCfg, archive)
    val q = StreamingDedup.attach(
      spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString),
      streamCfg).start()
    try q.processAllAvailable() finally q.stop()

    // replayed stream == batch loop, bit for bit including the epoch tag
    assert(collectPairs(streamCfg) == batchPairs)

    // epoch discipline: one df-table snapshot per ingested batch, and the
    // final snapshot equals a from-scratch recompute over everything seen
    // (merge-based maintenance lost nothing)
    assert(StreamingDedup.latestEpoch(streamCfg) == 2L)
    val finalTable = spark.read
      .parquet(s"${streamCfg.stateDir}/shingle_df/epoch=2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val recomputed = graft.ops.Dedup.shingleDfTable(
      graft.ops.Dedup.shingleDF(archive.union(batch1).union(batch2)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(finalTable == recomputed)

    // the persisted index covers every ingested doc (bands rows each)
    val indexed = spark.read.parquet(s"${streamCfg.stateDir}/index")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == Set(1L, 2L, 3L, 100L, 102L, 200L, 201L))
  }
}
