package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** State-store provider parity matrix (VERDICT r11 next-round #5): every
  * state-store usage CLASS in the streaming surface, run under BOTH the
  * default HDFS-backed provider and RocksDBStateStoreProvider, asserting
  * identical output (and == batch where the twin exists).
  *
  * Why this matters at 100 TB: the HDFS-backed provider keeps every
  * key's state ON-HEAP in each executor — the one unbounded-memory
  * liability left in the streaming story (st7's chained join + session
  * state grows with traffic). RocksDB spills state to local disk with a
  * bounded block cache, so it is the production provider for large keyed
  * state; this matrix proves switching providers is a pure conf change
  * with bit-identical results for:
  *
  *   - windowed aggregation state        (tumblingCounts, complete mode)
  *   - session-window state              (userSessions, complete mode)
  *   - stream-stream join state          (clickPurchaseJoin, append mode)
  *   - custom keyed flatMapGroups state  (runningUserStats, update mode)
  *   - CHAINED dedup→join→session state  (st7 guarded attribution, the
  *     multi-stateful composition, append mode)
  *
  * The provider is a per-query session conf (read at query start), so
  * each leg sets it, starts, and restores — no separate SparkSession. */
class RocksDbParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[A](provider: String)(body: => A): A = {
    val prior = scala.util.Try(spark.conf.get(ProviderKey)).toOption
    spark.conf.set(ProviderKey, provider)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-rocksdb-events").toString
    Tables.events(spark, TestSpark.sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamEvents = {
    val schema = Tables.events(spark, TestSpark.sfDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(eventsDir)
  }

  /** Run the stream to a memory sink under `provider`, return the rows. */
  private def run(provider: String, df: org.apache.spark.sql.DataFrame,
                  table: String, mode: String): Set[org.apache.spark.sql.Row] =
    withProvider(provider) {
      val q = df.writeStream.format("memory").queryName(table).outputMode(mode).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(table).collect().toSet
    }

  test("windowed-aggregation state: rocksdb == hdfs == batch") {
    val batch = EventStreams.tumblingCounts(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    val h = run(Hdfs, EventStreams.tumblingCounts(streamEvents), "rp_tumb_h", "complete")
    val r = run(RocksDb, EventStreams.tumblingCounts(streamEvents), "rp_tumb_r", "complete")
    assert(r == h && r == batch && batch.nonEmpty)
  }

  test("session-window state: rocksdb == hdfs == batch") {
    val batch = EventStreams.userSessions(Tables.events(spark, TestSpark.sfDir))
      .collect().toSet
    val h = run(Hdfs, EventStreams.userSessions(streamEvents), "rp_sess_h", "complete")
    val r = run(RocksDb, EventStreams.userSessions(streamEvents), "rp_sess_r", "complete")
    assert(r == h && r == batch && batch.nonEmpty)
  }

  test("stream-stream join state: rocksdb == hdfs == batch") {
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams.clickPurchaseJoin(ev, ev, watermark = "30 days")
      .collect().toSet
    val h = run(Hdfs,
      EventStreams.clickPurchaseJoin(streamEvents, streamEvents, watermark = "30 days"),
      "rp_join_h", "append")
    val r = run(RocksDb,
      EventStreams.clickPurchaseJoin(streamEvents, streamEvents, watermark = "30 days"),
      "rp_join_r", "append")
    assert(r == h && r == batch && batch.nonEmpty)
  }

  test("custom keyed flatMapGroupsWithState: rocksdb final per-user stats == hdfs == batch") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = StatefulOps.runningUserStats(StatefulOps.asUserEvents(ev))
      .collect().map(s => s.user_id -> s).toMap
    // update mode emits one row per key per micro-batch; the row with the
    // largest n_events per key is the converged state — identical across
    // providers and == the single-batch run
    def finalPerUser(table: String): Map[Long, (Long, Long, Double)] =
      spark.table(table).groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_purchases"), col("total_value"))).as("s"))
        .collect()
        .map(row => row.getLong(0) -> {
          val s = row.getStruct(1)
          (s.getLong(0), s.getLong(1), s.getDouble(2))
        }).toMap
    run(Hdfs, StatefulOps.runningUserStats(StatefulOps.asUserEvents(streamEvents)).toDF(),
      "rp_state_h", "update")
    run(RocksDb, StatefulOps.runningUserStats(StatefulOps.asUserEvents(streamEvents)).toDF(),
      "rp_state_r", "update")
    val h = finalPerUser("rp_state_h")
    val r = finalPerUser("rp_state_r")
    assert(r == h && r.nonEmpty)
    assert(r == batch.map { case (k, s) => k -> (s.n_events, s.n_purchases, s.total_value) })
  }

  test("transformWithState (Spark 4 arbitrary-state API): rocksdb stream == batch == flatMapGroupsWithState twin") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = StatefulOps.runningUserStatsTws(StatefulOps.asUserEventsCents(ev))
      .collect().map(s => s.user_id -> s).toMap
    // streaming transformWithState requires the RocksDB provider (HDFS is
    // rejected by operator validation — no HDFS leg here by design)
    def finalPerUser(table: String): Map[Long, (Long, Long, Long)] =
      spark.table(table).groupBy("user_id")
        .agg(max(struct(col("n_events"), col("n_purchases"), col("total_cents"))).as("s"))
        .collect()
        .map(row => row.getLong(0) -> {
          val s = row.getStruct(1)
          (s.getLong(0), s.getLong(1), s.getLong(2))
        }).toMap
    run(RocksDb,
      StatefulOps.runningUserStatsTws(StatefulOps.asUserEventsCents(streamEvents)).toDF(),
      "rp_tws_r", "update")
    val r = finalPerUser("rp_tws_r")
    assert(r.nonEmpty)
    assert(r == batch.map { case (k, s) => k -> (s.n_events, s.n_purchases, s.total_cents) })
    // cross-API parity: the cent-exact totals must agree with the
    // flatMapGroupsWithState twin's double totals (value is 2dp by fixture
    // contract, so cents == round(total_value*100) exactly)
    val fmg = StatefulOps.runningUserStats(StatefulOps.asUserEvents(ev))
      .collect().map(s => s.user_id -> s).toMap
    assert(r.keySet == fmg.keySet)
    r.foreach { case (k, (n, p, c)) =>
      val t = fmg(k)
      assert(n == t.n_events && p == t.n_purchases &&
        c == math.round(t.total_value * 100))
    }
  }

  test("chained dedup->join->session state (st7): rocksdb == hdfs == batch") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sfDir)
    val batch = EventStreams.sessionAttribution(ev, ev, watermark = "30 days")
      .collect().toSet
    def runSt7(provider: String, name: String): Set[org.apache.spark.sql.Row] =
      withProvider(provider) {
        // fresh dir per run: the sentinel append mid-query must be the
        // LAST files consumed (watermark finalization ordering)
        val dir = Files.createTempDirectory(s"graft-rocksdb-st7-$name").toString
        ev.write.mode("overwrite").parquet(dir)
        ev.write.mode("append").parquet(dir) // at-least-once redelivery
        val schema = ev.schema
        def src = Admission.guard(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(dir)
            .withColumn("ts", date_trunc("second", col("ts"))),
          tsCol = "ts", delay = "30 days", idCols = Seq("event_id"))
        val q = EventStreams.sessionAttributionGuarded(src, src)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          q.processAllAvailable()
          val maxTs = ev.agg(max("ts")).head.getTimestamp(0)
          val far = new java.sql.Timestamp(maxTs.getTime + 100L * 24 * 3600 * 1000)
          Seq((-1L, far, -1L, "click", 0.0, "{}"), (-2L, far, -2L, "purchase", 0.0, "{}"))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
            .write.mode("append").parquet(dir)
          q.processAllAvailable()
        } finally q.stop()
        spark.table(name).filter(col("user_id") >= 0).collect().toSet
      }
    val h = runSt7(Hdfs, "rp_st7_h")
    val r = runSt7(RocksDb, "rp_st7_r")
    assert(r == h && r == batch && batch.nonEmpty)
  }
}
