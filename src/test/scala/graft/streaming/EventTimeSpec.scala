package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** Event-time contract (VERDICT r8 #1): `Tables.events` / `normalizeEventTime`
  * must conform EVERY producer encoding of `ts` to `TimestampType`, so
  * `withWatermark` works on the loaded frame no matter which writer produced
  * the parquet. Three encodings are met in practice:
  *   - ns-long: parquet TIMESTAMP(NANOS), read as long via nanosAsLong
  *   - NTZ:     TIMESTAMP_MICROS(isAdjustedToUTC=false) → TimestampNTZType
  *   - LTZ:     TIMESTAMP_MICROS(isAdjustedToUTC=true)  → TimestampType
  * The session TZ is pinned UTC (Sessions), so NTZ→LTZ casting is
  * instant-preserving and all three encodings of the same wall-clock data
  * must load to IDENTICAL instants. */
class EventTimeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // one wall-clock dataset, micro-precision (ns fixture carries extra sub-µs
  // digits that the loader truncates — asserted separately below)
  private val baseMicros: Seq[(Long, Long, String, Long)] = Seq(
    // (event_id, user_id, event_type, ts_micros)
    (1L, 10L, "click", 1700000000000000L),
    (2L, 10L, "purchase", 1700000123456789L),
    (3L, 20L, "click", 1700003600000000L),
    (4L, 20L, "click", 1700007200500000L),
    (5L, 30L, "view", 1700010800000001L),
    (6L, 30L, "purchase", 1700014400999999L))

  /** Write the dataset at tmp/events.parquet in the given encoding and
    * return the fixture dir (the layout Tables.events expects). */
  private def stage(encoding: String): String = {
    val dir = Files.createTempDirectory(s"graft-evttime-$encoding").toString
    val df = baseMicros.toDF("event_id", "user_id", "event_type", "us")
    val encoded = encoding match {
      case "nslong" => // emulate the nanosAsLong read of TIMESTAMP(NANOS)
        df.withColumn("ts", col("us") * 1000L + 321L).drop("us")
      case "ntz" =>
        df.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)).drop("us")
      case "ltz" =>
        df.withColumn("ts", timestamp_micros(col("us"))).drop("us")
    }
    encoded.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedInstants(dir: String): Map[Long, Long] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("all three encodings load as TimestampType with identical instants") {
    val dirs = Seq("nslong", "ntz", "ltz").map(e => e -> stage(e)).toMap
    dirs.foreach { case (enc, dir) =>
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType, s"encoding $enc loaded as $dt, not TimestampType")
    }
    val expected = baseMicros.map(t => t._1 -> t._4).toMap
    dirs.foreach { case (enc, dir) =>
      assert(loadedInstants(dir) == expected,
        s"encoding $enc did not load the expected instants")
    }
  }

  test("withWatermark + windowed agg RUNS as a stream for every encoding") {
    Seq("nslong", "ntz", "ltz").foreach { enc =>
      val dir = stage(enc)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val stream = spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/events.parquet")
      // the streaming ingest contract: normalize FIRST, then watermark —
      // this is what the batch loader does and what every streaming
      // consumer must do; without it NTZ/ns-long would throw
      // EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at stream start
      val counts = EventStreams.tumblingCounts(
        Tables.normalizeEventTime(stream, "ts").withColumn("value", lit(1.0)))
      val q = counts.writeStream.format("memory")
        .queryName(s"evttime_$enc").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val rows = spark.table(s"evttime_$enc").collect()
      assert(rows.map(_.getLong(2)).sum == baseMicros.size.toLong,
        s"encoding $enc: windowed stream lost rows")
    }
  }

  test("normalizeEventTime is a no-op on TimestampType and truncates ns to µs") {
    val ltz = Tables.events(spark, stage("ltz"))
    assert(Tables.normalizeEventTime(ltz, "ts").schema == ltz.schema)
    // the ns fixture carries +321ns beyond each micro value; loader must
    // truncate toward zero to the µs the other encodings carry
    assert(loadedInstants(stage("nslong")) == baseMicros.map(t => t._1 -> t._4).toMap)
  }
}
