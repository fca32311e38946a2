package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** Batch-vs-stream equivalence: the SAME EventStreams transforms, applied
  * to a `readStream` parquet source, must produce the batch results the
  * DuckDB oracle already verified (st1/st2). This is the §2.10 north-star
  * smoke — real Structured Streaming execution, not a mock. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // Re-write normalized events (micros timestamps) so the stream source
  // reads plain TimestampType without the nanosAsLong legacy path.
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream-events").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents = {
    val schema = Tables.events(spark, TestSpark.sfDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
  }

  private def runToCompletion(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val q = df.writeStream.format("memory").queryName(table).outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
  }

  test("tumbling-window counts: streaming equals batch") {
    val batch = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    runToCompletion(EventStreams.tumblingCounts(streamEvents), "stream_tumbling")
    val streamed = spark.table("stream_tumbling").collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("sliding-window counts: streaming equals batch") {
    val batch = EventStreams.slidingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    runToCompletion(EventStreams.slidingCounts(streamEvents), "stream_sliding")
    val streamed = spark.table("stream_sliding").collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    // overlap sanity: 1h/15min hops must yield ~4x the tumbling row count
    val tumbling = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir)).count()
    assert(batch.size > 2 * tumbling)
  }

  test("sessionization: streaming equals batch") {
    val batch = EventStreams.userSessions(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    runToCompletion(EventStreams.userSessions(streamEvents), "stream_sessions")
    val streamed = spark.table("stream_sessions").collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("append mode emits only watermark-finalized windows, all matching batch") {
    // append is the production output mode: a window row is emitted once,
    // when the watermark passes its end — so the stream emits a subset of
    // the batch result (trailing windows stay open), every row identical
    val q = EventStreams.tumblingCounts(streamEvents)
      .writeStream.format("memory").queryName("stream_append").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_append").collect().toSet
    val batch = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    // the corpus spans ~30 days with a 10-minute watermark: all but the
    // final hour's windows must have finalized
    assert(streamed.size >= batch.size - 10)
  }

  test("foreachBatch lands a stream into parquet identically to the batch sink") {
    // the production stream→storage path: each micro-batch writes through
    // the SAME distributed Sinks.parquet used by the batch pipeline
    // (append mode), so a replayed stream reproduces the batch artifact
    val dest = Files.createTempDirectory("graft-stream-sink").toString
    val q = EventStreams.tumblingCounts(streamEvents)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.io.Sinks.parquet(batch, dest, mode = "append")
      }
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    // update mode re-emits amended windows; the LAST version per key must
    // equal the batch result, and every batch row must appear
    val landed = spark.read.parquet(dest)
    val batch = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    val latest = landed.collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    assert(batch.forall(r => latest.contains((r.getString(0), r.getString(1)))))
    assert(batch.forall(b => latest((b.getString(0), b.getString(1))).contains(b)))
  }

  test("streaming quarantined ingest: replayed raw-line stream == one-shot batch split") {
    // raw JSON lines, some malformed / type-broken, replayed 1 file per
    // micro-batch; each batch splits via jsonLinesWithQuarantine and
    // appends both channels — end state must equal the one-shot batch run
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val lines = (0 until 30).map {
      case i if i % 7 == 3 => s"""{"id": "bad-$i", "name": "x"}"""
      case i if i % 11 == 5 => s"{broken $i"
      case i => s"""{"id": $i, "name": "n$i"}"""
    }
    val srcDir = Files.createTempDirectory("graft-qstream-src")
    lines.grouped(10).zipWithIndex.foreach { case (chunk, i) =>
      java.nio.file.Files.write(srcDir.resolve(s"part-$i.txt"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }
    val goodDir = Files.createTempDirectory("graft-qstream-good").toString + "/g"
    val qDir = Files.createTempDirectory("graft-qstream-bad").toString + "/q"
    val q = spark.readStream
      .option("maxFilesPerTrigger", "1").text(srcDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val (good, _) = graft.io.Sources.jsonLinesWithQuarantine(batch, schema, qDir)
        graft.io.Sinks.parquet(good, goodDir, mode = "append")
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    // one-shot batch reference over the same raw file set
    val (goodRef, report) = graft.io.Sources.jsonWithQuarantine(
      spark, srcDir.toString, schema, Files.createTempDirectory("graft-qref").toString + "/q")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy("id").collect().map(_.toSeq).toSeq
    assert(key(spark.read.parquet(goodDir)) == key(goodRef))
    assert(spark.read.text(qDir).count() == report.quarantined)
    assert(report.quarantined > 0, "fixture must exercise the quarantine channel")
  }

  test("streaming decontamination: flagged ids on a doc stream equal the batch report") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val train = docs.filter(col("doc_id") % 20 =!= 7)
    val evalSet = docs.filter(col("doc_id") % 20 === 7)
    val batchIds = graft.ops.Decontam.contaminatedIds(train, evalSet)
      .collect().map(_.getLong(0)).toSet
    // contamination(...)'s countDistinct aggregation can't stream; the id
    // flag form must agree with it on WHICH docs are flagged
    val fullReport = graft.ops.Decontam.contamination(train, evalSet)
      .collect().map(_.getLong(0)).toSet
    assert(batchIds == fullReport && batchIds.nonEmpty)
    val trainDir = Files.createTempDirectory("graft-decontam-stream").toString
    train.repartition(4).write.mode("overwrite").parquet(trainDir)
    val trainStream = spark.readStream.schema(train.schema)
      .option("maxFilesPerTrigger", "1").parquet(trainDir)
    val q = graft.ops.Decontam.contaminatedIds(trainStream, evalSet)
      .writeStream.format("memory").queryName("stream_decontam")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_decontam")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == batchIds)
  }

  test("streaming CDC apply: replayed changelog stream converges to the batch MERGE result") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, TestSpark.sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus").limit(2000)
    // changelog: status flip on %10==3 (seq 2 supersedes a seq-1 stale),
    // delete %10==7, insert negated %100==1 — the u8 classes
    val changes =
      orders.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(orders.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(2L)))
      .unionByName(orders.filter(col("o_orderkey") % 10 === 7)
        .withColumn("op", lit("delete")).withColumn("seq", lit(1L)))
      .unionByName(orders.filter(col("o_orderkey") % 100 === 1)
        .withColumn("o_orderkey", -col("o_orderkey"))
        .withColumn("o_orderstatus", lit("I"))
        .withColumn("op", lit("upsert")).withColumn("seq", lit(1L)))
    val changesDir = Files.createTempDirectory("graft-cdc-stream").toString
    changes.repartition(5).write.mode("overwrite").parquet(changesDir) // ~5 micro-batches
    val stateDir = Files.createTempDirectory("graft-cdc-state").toString
    orders.withColumn("op", lit("upsert")).withColumn("seq", lit(0L))
      .write.mode("overwrite").parquet(stateDir)
    // micro-batches arrive in FILE order, which is arbitrary relative to
    // seq — mergeChangeState's tombstoned latest-seq-wins state absorbs
    // them in any order (the test's partitioning scatters seqs randomly)
    val q = spark.readStream.schema(changes.schema)
      .option("maxFilesPerTrigger", "1").parquet(changesDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = graft.ops.Merge.mergeChangeState(
          spark.read.parquet(stateDir), batch, Seq("o_orderkey"))
          .localCheckpoint() // materialize before overwriting the dir we read
        merged.write.mode("overwrite").parquet(stateDir)
      }
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = graft.ops.Merge.currentSnapshot(spark.read.parquet(stateDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val batchResult = graft.ops.Merge.applyChangeLog(orders, changes, Seq("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed == batchResult && batchResult.nonEmpty)
  }

  test("stream-static enrichment: streaming equals batch") {
    val dim = Tables.customer(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("c_custkey").as("user_id"),
        org.apache.spark.sql.functions.col("c_mktsegment").as("segment"))
    val batch = EventStreams
      .enrichedSegmentCounts(Tables.events(spark, TestSpark.sfDir), dim)
      .collect().toSet
    runToCompletion(EventStreams.enrichedSegmentCounts(streamEvents, dim), "stream_enriched")
    val streamed = spark.table("stream_enriched").collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-stream LEFT OUTER join: null rows emit after the watermark closes; equals batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams
      .clickPurchaseJoinOuter(ev, Tables.events(spark, TestSpark.sfDir), watermark = "30 days")
      .collect().toSet
    assert(batch.exists(_.isNullAt(2)), "fixture must contain unconverted clicks")
    // dedicated source dir: phase 1 replays the corpus, phase 2 appends a
    // heartbeat sentinel far past end-of-data so both watermarks pass
    // every real click's horizon and the trailing null rows emit — the
    // production heartbeat-topic pattern. Two processAllAvailable phases
    // guarantee the sentinel file is consumed LAST (a fast-forwarded
    // watermark seen first would mark the whole corpus late).
    val dir = Files.createTempDirectory("graft-stream-outer").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite").parquet(dir)
    val schema = Tables.events(spark, TestSpark.sfDir).schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.clickPurchaseJoinOuter(src, src, watermark = "30 days")
      .writeStream.format("memory").queryName("stream_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 100L * 24 * 3600 * 1000)
      // distinct negative user_ids so the two sentinels can't join each other
      Seq((-1L, far, -1L, "click", 0.0, "{}"), (-2L, far, -2L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_outer")
      .filter(col("user_id") >= 0).collect().toSet
    assert(streamed == batch)
  }

  test("stream-stream FULL OUTER join: both null-completed classes emit after the watermark; equals batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams
      .clickPurchaseJoinFull(ev, Tables.events(spark, TestSpark.sfDir), watermark = "30 days")
      .collect().toSet
    // the class the one-sided joins drop must exist in the fixture:
    // organic purchases (null click side) AND unconverted clicks
    assert(batch.exists(_.isNullAt(1)), "fixture must contain unattributed purchases")
    assert(batch.exists(_.isNullAt(2)), "fixture must contain unconverted clicks")
    val dir = Files.createTempDirectory("graft-stream-full").toString
    ev.write.mode("overwrite").parquet(dir)
    val schema = ev.schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.clickPurchaseJoinFull(src, src, watermark = "30 days")
      .writeStream.format("memory").queryName("stream_full").outputMode("append").start()
    try {
      q.processAllAvailable()
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 100L * 24 * 3600 * 1000)
      Seq((-1L, far, -1L, "click", 0.0, "{}"), (-2L, far, -2L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_full")
      .filter(col("user_id") >= 0).collect().toSet
    assert(streamed == batch)
  }

  test("st7 composed session attribution behind the admission guard: replayed stream equals batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the full funnel-dashboard pipeline on a stream: admission guard
    // (identity dedup of at-least-once redeliveries) → stream-stream
    // LEFT OUTER attribution join → session-window aggregation. THREE+
    // chained stateful operators in append mode — the composition the
    // round-10 verdict asked for, not the st2/st6 pieces separately.
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams
      .sessionAttribution(ev, Tables.events(spark, TestSpark.sfDir), watermark = "30 days")
      .collect().toSet
    assert(batch.exists(_.getLong(4) > 0), "fixture must contain unconverted clicks")
    assert(batch.exists(_.getLong(3) > 0), "fixture must contain attributed pairs")
    val dir = Files.createTempDirectory("graft-stream-st7").toString
    ev.write.mode("overwrite").parquet(dir)
    // at-least-once redelivery: append a full byte-identical second copy
    // of the corpus — without the guard every count would double
    ev.write.mode("append").parquet(dir)
    val schema = ev.schema
    // second-truncate BEFORE the guard: the guard owns the stream's one
    // watermark, and downstream must alias (not derive) the ts column to
    // keep the watermark metadata — see sessionAttributionGuarded's doc
    def src = Admission.guard(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withColumn("ts", date_trunc("second", col("ts"))),
      tsCol = "ts", delay = "30 days", idCols = Seq("event_id"))
    val q = EventStreams.sessionAttributionGuarded(src, src)
      .writeStream.format("memory").queryName("stream_st7").outputMode("append").start()
    try {
      q.processAllAvailable()
      val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 100L * 24 * 3600 * 1000)
      // sentinel click + purchase on distinct negative user_ids push both
      // watermarks past every real horizon AND session end (the
      // production heartbeat-topic pattern); two processAllAvailable
      // phases guarantee the sentinel file is consumed last
      Seq((-1L, far, -1L, "click", 0.0, "{}"), (-2L, far, -2L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("stream_st7")
      .filter(col("user_id") >= 0).collect().toSet
    assert(streamed == batch)
  }

  test("stream-stream click->purchase join: streaming equals batch") {
    // Two independent readStream sources joined on key + event-time range.
    // Inner stream-stream joins emit matches eagerly (the watermark bounds
    // STATE, not output), but files replay in listing order, not time
    // order — a generous watermark keeps re-ordered files from being
    // treated as late, making stream output exactly equal to batch.
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams
      .clickPurchaseJoin(ev, Tables.events(spark, TestSpark.sfDir), watermark = "30 days")
      .collect().toSet
    val q = EventStreams.clickPurchaseJoin(streamEvents, streamEvents, watermark = "30 days")
      .writeStream.format("memory").queryName("stream_joined").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_joined").collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
