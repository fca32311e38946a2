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
}
