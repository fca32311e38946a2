package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** flatMapGroupsWithState: cross-batch running per-user state. The
  * stream delivers files one per trigger, so state must survive and
  * accumulate across micro-batches; the final running value per user
  * must equal the one-shot batch aggregate. */
class StatefulSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("running user stats accumulate across micro-batches to the batch totals") {
    val events = Tables.events(spark, TestSpark.sfDir)
    val dir = Files.createTempDirectory("graft-stateful").toString
    // split into 3 files → 3 micro-batches exercising cross-batch state
    events.repartition(3).write.mode("overwrite").parquet(dir)

    val expected = StatefulOps.asUserEvents(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StatefulOps.runningUserStats(StatefulOps.asUserEvents(stream))
      .writeStream.format("memory").queryName("user_stats").outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // update mode appends one row per key per batch — the running maximum
    // per user is its final state
    val got = spark.table("user_stats")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("n_purchases").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected && expected.nonEmpty)
  }

  test("expiring variant: active keys emit identical running stats across micro-batches (eviction only changes idle keys)") {
    // the StreamGuard-admissible form (ProcessingTimeTimeout) must be a
    // drop-in for the NoTimeout form while keys stay active: same final
    // per-user totals across a 3-micro-batch replay. Idle-key EVICTION
    // itself is untestable in a fast replay (the 30-day timeout cannot
    // elapse), and that's fine — eviction changes which keys still carry
    // state, never an active key's emitted values.
    val events = Tables.events(spark, TestSpark.sfDir)
    val dir = Files.createTempDirectory("graft-stateful-exp").toString
    events.repartition(3).write.mode("overwrite").parquet(dir)
    val expected = StatefulOps.runningUserStats(
      StatefulOps.asUserEvents(events))
      .collect().map(s => s.user_id -> ((s.n_events, s.n_purchases))).toMap
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // a ProcessingTimeTimeout query never self-terminates — after the
    // files are drained the engine keeps scheduling empty TIMER-CHECK
    // batches (neither processAllAvailable nor AvailableNow converges,
    // verified on 4.1.2: epoch counts past 270 on a 3-file source) — so
    // the test polls the update-mode sink until the totals converge to
    // the batch expectation, then stops the query explicitly
    val q = StatefulOps.runningUserStatsExpiring(StatefulOps.asUserEvents(stream))
      .writeStream.format("memory").queryName("user_stats_exp")
      .outputMode("update").start()
    def gotNow(): Map[Long, (Long, Long)] = spark.table("user_stats_exp")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("n_purchases").as("p"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    try {
      while (gotNow() != expected && System.nanoTime() < deadline)
        Thread.sleep(250)
    } finally q.stop()
    assert(gotNow() == expected && expected.nonEmpty)
  }

  test("TTL'd transformWithState variant: batch twin equals the TTL-less form (TTL only changes idle-key retention)") {
    val ev = StatefulOps.asUserEventsCents(Tables.events(spark, TestSpark.sfDir))
    val base = StatefulOps.runningUserStatsTws(ev)
      .collect().map(s => s.user_id -> s).toMap
    val ttl = StatefulOps.runningUserStatsTwsTtl(ev)
      .collect().map(s => s.user_id -> s).toMap
    assert(ttl == base && base.nonEmpty)
  }

  test("batch transformWithState pins its shuffle width to shuffle.partitions, not AQE's initialPartitionNum") {
    // engine/Sessions sets initialPartitionNum = 8x the shuffle width
    // (the sf30-ladder OOM fix); stateful batch operators are exempt from
    // AQE coalescing, so without the rebind seam st9 instantiated 8x the
    // state stores (256 for 150 keys — the round-17 regression). The test
    // session is built with the same 8x ratio (shuffle=8, initial=64), so
    // this pin fails if the rebind is ever dropped.
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "64")
    val ev = StatefulOps.asUserEventsCents(Tables.events(spark, TestSpark.sfDir))
    val out = StatefulOps.runningUserStatsTws(ev)
    assert(out.rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("numPartitions = 8"), plan.linesIterator.take(4).mkString("\n"))
  }

  test("the same stateful function runs in plain batch mode (empty initial state)") {
    val out = StatefulOps.runningUserStats(
      StatefulOps.asUserEvents(Tables.events(spark, TestSpark.sfDir)))
      .collect().map(s => s.user_id -> s.n_events).toMap
    val expected = StatefulOps.asUserEvents(Tables.events(spark, TestSpark.sfDir))
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected)
  }
}
