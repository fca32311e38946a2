package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{Det, Skew}

/** Skew-rung measurement (VERDICT r14 ask #7): materialize a deliberately
  * hub-skewed variant of a ladder rung — ONE hot orderkey owning ~25% of
  * lineitem rows — and measure the same fact⋈fact join+agg under three
  * plans:
  *
  *  - `aqe_skew`:      AQE skew-join splitting ON (thresholds tuned to the
  *                     rung size; at 100 TB the defaults already engage)
  *  - `no_mitigation`: AQE skew-join OFF — the hot shuffle partition lands
  *                     on one task (the pathology being demonstrated)
  *  - `salted_hot`:    [[graft.ops.Skew.saltedJoinHot]] with the hot keys
  *                     detected by [[graft.ops.Skew.hotKeys]] — the manual
  *                     mitigation for engines/stages where AQE can't help
  *
  * Broadcast is disabled in every scenario (the orders side is ~100 MB at
  * sf2 and fact-sized at 100 TB — the scenarios exist precisely for joins
  * where neither side broadcasts). Each scenario records wall time and the
  * per-task duration distribution of its heaviest stage; the claim under
  * test is a bounded max-task/median-task ratio for the two mitigations,
  * with identical results across all three plans (parity-gated).
  *
  * Emits one JSON artifact (SKEW_BENCH.json). Dev/evidence tool — not part
  * of the library surface.
  */
object SkewBench {

  /** Fraction of lineitem rows rewired to the hot orderkey. */
  private val HotShare = 4L // 1-in-4 rows

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewBench <baseSfDir> <outJson> [skewDir]")
    val baseDir = args(0)
    val outJson = args(1)
    val skewDir = if (args.length > 2) args(2) else "target/testdata/sf2skew"

    val spark = graft.engine.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- materialize the skewed rung (idempotent) --------------------
    val liPath = s"$skewDir/lineitem.parquet"
    val ordPath = s"$skewDir/orders.parquet"
    if (!Files.exists(Paths.get(liPath))) {
      val li = Tables.lineitem(spark, baseDir)
      val hotKey = lit(1L)
      // deterministic 1-in-HotShare rewire (no rand: re-runs bit-match)
      li.withColumn("l_orderkey",
          when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey")), lit(HotShare)) === 0, hotKey)
            .otherwise(col("l_orderkey")))
        .write.mode("overwrite").parquet(liPath)
      Tables.orders(spark, baseDir).write.mode("overwrite").parquet(ordPath)
    }

    // ---- the measured join+agg ---------------------------------------
    // revenue per order priority over the skewed orderkey join: the join
    // stage carries the hot key; the aggregate output is 5 rows (parity
    // comparison is driver-trivial, the skew lives in the shuffle).
    def joined(plain: Boolean, hot: Seq[Long]): DataFrame = {
      val li = spark.read.parquet(liPath)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val ord = spark.read.parquet(ordPath)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val j =
        if (plain) li.join(ord, Seq("o_orderkey"))
        else Skew.saltedJoinHot(li, ord, "o_orderkey", hot, salts = 32)
      j.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
    }

    // ---- per-task stage stats via listener ----------------------------
    val taskMs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += ((e.stageId, e.taskInfo.duration)) }
    }
    spark.sparkContext.addSparkListener(listener)

    def heaviestStage(): (Int, Int, Long, Long, Double) = taskMs.synchronized {
      val byStage = taskMs.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
      val (sid, ds) = byStage.maxBy(_._2.sum)
      val med = math.max(ds(ds.size / 2), 1L)
      (sid, ds.size, ds.max, med, ds.max.toDouble / med)
    }

    def runScenario(name: String, confs: Map[String, String],
                    plain: Boolean, hot: Seq[Long]): (String, Set[String], Double) = {
      // conf.get can RETURN null (a defined key with a null default, e.g.
      // adaptive.autoBroadcastJoinThreshold) — treat that as unset too
      val saved = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toSeq
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      taskMs.synchronized(taskMs.clear())
      val t0 = System.nanoTime()
      val rows = joined(plain, hot).collect()
        .map(_.toSeq.mkString("|")).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      // wait for straggler task-end events before reading the buffer
      Thread.sleep(500)
      val (sid, n, maxMs, medMs, ratio) = heaviestStage()
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      val stats = s""""$name":{"wall_sec":${f"$wall%.2f"},"stage":$sid,""" +
        s""""tasks":$n,"max_task_ms":$maxMs,"median_task_ms":$medMs,""" +
        s""""max_over_median":${f"$ratio%.2f"}}"""
      println(s"[skew] $name wall=${f"$wall%.1f"}s stage=$sid tasks=$n " +
        s"max=${maxMs}ms med=${medMs}ms ratio=${f"$ratio%.1f"}")
      (stats, rows, ratio)
    }

    val noBroadcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    // hot keys detected, not assumed — the production pre-pass
    val hot = Skew.hotKeys(spark.read.parquet(liPath).select(col("l_orderkey")
      .as("o_orderkey")), "o_orderkey", minShare = 0.05)
    println(s"[skew] detected hot keys: ${hot.mkString(",")}")

    val (sAqe, rAqe, ratioAqe) = runScenario("aqe_skew",
      noBroadcast ++ Map(
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m"),
      plain = true, hot = Nil)
    val (sNone, rNone, ratioNone) = runScenario("no_mitigation",
      noBroadcast ++ Map("spark.sql.adaptive.skewJoin.enabled" -> "false"),
      plain = true, hot = Nil)
    val (sSalt, rSalt, ratioSalt) = runScenario("salted_hot",
      noBroadcast ++ Map("spark.sql.adaptive.skewJoin.enabled" -> "false"),
      plain = false, hot = hot)

    spark.sparkContext.removeSparkListener(listener)

    val parity = rAqe == rNone && rNone == rSalt && rAqe.nonEmpty
    // the mitigations must bound the tail the unmitigated plan exhibits
    val ok = parity && hot.nonEmpty &&
      ratioAqe < ratioNone && ratioSalt < ratioNone

    val json =
      s"""{"metric":"skew_bench","base":"$baseDir","skew_dir":"$skewDir",""" +
        s""""hot_keys":[${hot.mkString(",")}],"hot_share":"1/$HotShare",""" +
        s""""scenarios":{$sAqe,$sNone,$sSalt},""" +
        s""""parity":$parity,"ok":$ok}"""
    Files.write(Paths.get(outJson), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
