package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0)).toDF("k", "name", "v")

  // k=2: two upserts, seq 2 wins; k=3: delete; k=4: insert
  private def changes = Seq(
    (2L, "b-stale", 21.0, "upsert", 1L),
    (2L, "b-new", 22.0, "upsert", 2L),
    (3L, "c", 30.0, "delete", 1L),
    (4L, "d", 40.0, "upsert", 1L)).toDF("k", "name", "v", "op", "seq")

  test("applyChangeLog: latest-seq upsert wins, deletes drop, inserts add, untouched pass through") {
    val got = Merge.applyChangeLog(target, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, "a", 10.0),       // untouched
      (2L, "b-new", 22.0),   // seq-2 upsert superseded seq-1
      (4L, "d", 40.0)))      // insert (k=3 deleted)
  }

  test("applyChangeLog is idempotent: re-applying the same changelog is a no-op") {
    val once = Merge.applyChangeLog(target, changes, Seq("k"))
    val twice = Merge.applyChangeLog(once, changes, Seq("k"))
    assert(twice.collect().map(_.toSeq).toSet == once.collect().map(_.toSeq).toSet)
  }

  test("applyChangeLog: a delete superseded by a later upsert keeps the row") {
    val ch = Seq(
      (1L, "a2", 11.0, "delete", 1L),
      (1L, "a2", 11.0, "upsert", 2L)).toDF("k", "name", "v", "op", "seq")
    val got = Merge.applyChangeLog(target, ch, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((1L, "a2")) && got.size == 3)
  }

  test("mergeChangeState is arrival-order independent; tombstones beat stale upserts") {
    val state0 = target.withColumn("op", lit("upsert")).withColumn("seq", lit(0L))
    // k=1: delete at seq 3 then a STALE upsert at seq 2 arrives later;
    // k=2: upserts out of order; k=5: insert
    val b1 = Seq((1L, "a", 10.0, "delete", 3L), (2L, "b2", 22.0, "upsert", 2L))
      .toDF("k", "name", "v", "op", "seq")
    val b2 = Seq((1L, "a-stale", 11.0, "upsert", 2L), (2L, "b1", 21.0, "upsert", 1L),
      (5L, "e", 50.0, "upsert", 1L)).toDF("k", "name", "v", "op", "seq")
    def snap(batches: Seq[org.apache.spark.sql.DataFrame]) =
      Merge.currentSnapshot(batches.foldLeft(state0)(
        (st, b) => Merge.mergeChangeState(st, b, Seq("k"))))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val fwd = snap(Seq(b1, b2))
    val rev = snap(Seq(b2, b1))
    val expect = Set((2L, "b2", 22.0), (3L, "c", 30.0), (5L, "e", 50.0)) // k=1 stays deleted
    assert(fwd == expect, s"forward order: $fwd")
    assert(rev == expect, s"reverse order: $rev")
    // and matches the one-shot applyChangeLog over the full changelog
    val oneShot = Merge.applyChangeLog(target, b1.unionByName(b2), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(oneShot == expect)
  }

  test("applyChangeLog rejects a changelog missing target columns") {
    val bad = Seq((1L, "upsert", 1L)).toDF("k", "op", "seq")
    intercept[IllegalArgumentException](Merge.applyChangeLog(target, bad, Seq("k")))
  }

  test("malformed op values fail loudly instead of silently deleting") {
    // a typo'd 'update' used to act as a delete: the key left the target
    // via the anti-join and the upsert filter then dropped the row
    val typo = Seq((2L, "b-typo", 23.0, "update", 5L))
      .toDF("k", "name", "v", "op", "seq")
    val ex = intercept[Exception](
      Merge.applyChangeLog(target, typo, Seq("k")).collect())
    assert(ex.getMessage.contains("update") || ex.getCause != null,
      s"expected the offending op in the error, got: ${ex.getMessage}")
    val exNull = intercept[Exception] {
      val nullOp = Seq((2L, "b", 23.0, null.asInstanceOf[String], 5L))
        .toDF("k", "name", "v", "op", "seq")
      Merge.applyChangeLog(target, nullOp, Seq("k")).collect()
    }
    assert(exNull != null)
    // the streaming-state form guards its batch the same way
    val state0 = target.withColumn("op", lit("upsert")).withColumn("seq", lit(0L))
    intercept[Exception](
      Merge.mergeChangeState(state0, typo, Seq("k")).collect())
  }

  test("mergeStats over disjoint slices is bit-identical to a full recompute") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val slices = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
      .map(Merge.partialStats(_, keys, "l_quantity"))
    val merged = Merge.finalizeStats(Merge.mergeStats(slices, keys), keys)
      .orderBy(keys.map(col): _*)
    val direct = Merge.finalizeStats(
      Merge.partialStats(li, keys, "l_quantity"), keys)
      .orderBy(keys.map(col): _*)
    assert(merged.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("quantile state merged over disjoint slices is bit-identical to a direct full-data state") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val slices = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
      .map(Merge.partialQuantileState(_, keys, "l_quantity"))
    val merged = Merge.finalizeQuantiles(
      Merge.mergeQuantileStates(slices, keys), keys, ps)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("p"))
    val direct = Merge.finalizeQuantiles(
      Merge.partialQuantileState(li, keys, "l_quantity"), keys, ps)
      .orderBy(col("l_returnflag"), col("l_linestatus"), col("p"))
    assert(merged.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("finalizeQuantiles matches Spark's exact percentile (interpolation semantics pinned)") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = Merge.finalizeQuantiles(
      Merge.partialQuantileState(li, keys, "l_extendedprice"), keys, ps, scale = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = li.groupBy("l_returnflag")
      .agg(expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))").as("qs"))
      .collect().flatMap { r =>
        val vs = r.getSeq[Double](1)
        ps.zipWithIndex.map { case (p, i) =>
          (r.getString(0), p) -> BigDecimal(vs(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"quantile mismatch at $k: got ${got(k)}, want $v")
    }
  }

  test("binned sketch state: merged finalize within one bin width of the exact quantile") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val binWidth = 1.0
    val slices = Seq(
      li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1))
    val approx = Merge.finalizeQuantiles(
      Merge.mergeQuantileStates(
        slices.map(Merge.binnedQuantileState(_, keys, "l_extendedprice", binWidth)), keys),
      keys, ps, scale = 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    val exact = Merge.finalizeQuantiles(
      Merge.partialQuantileState(li, keys, "l_extendedprice"), keys, ps, scale = 6)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) <= binWidth,
        s"sketch error at $k exceeds bin width: approx ${approx(k)}, exact $v")
    }
  }

  test("quantile state: single-value keys, n=1 groups, and nulls finalize correctly") {
    val df = Seq(
      (Some(5.0), "one"),                      // n=1 → every quantile is the value
      (Some(1.0), "two"), (Some(3.0), "two"),  // p=0.5 → interpolated 2.0
      (None: Option[Double], "two"),           // null excluded from the state
      (Some(7.0), "const"), (Some(7.0), "const")).toDF("v", "g")
    val got = Merge.finalizeQuantiles(
      Merge.partialQuantileState(df, Seq("g"), "v"), Seq("g"), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("one" -> 5.0, "two" -> 2.0, "const" -> 7.0))
  }

  test("distinct state merged over OVERLAPPING slices equals direct COUNT(DISTINCT)") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag")
    // row-disjoint slices that share most partkey VALUES — a count-merge
    // would double-count; set-union merge must not
    val slices = Seq(
      li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1))
      .map(Merge.partialDistinctState(_, keys, "l_partkey"))
    val merged = Merge.finalizeDistinct(Merge.mergeDistinctStates(slices), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct)
    // idempotence under re-merge of the SAME state (at-least-once safety)
    val remerged = Merge.finalizeDistinct(
      Merge.mergeDistinctStates(slices ++ slices.take(1)), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(remerged == direct)
  }

  test("HLL distinct state: merged estimate == direct-sketch estimate, ≤2% off exact") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag")
    val slices = Seq(
      li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1))
      .map(Merge.hllDistinctState(_, keys, "l_partkey"))
    val merged = Merge.finalizeHllDistinct(
      Merge.mergeHllDistinctStates(slices, keys), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val directSketch = Merge.finalizeHllDistinct(
      Merge.hllDistinctState(li, keys, "l_partkey"), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // register-max merge is lossless: merged sketch == one-shot sketch
    assert(merged == directSketch, s"merged $merged != direct-sketch $directSketch")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(merged(k) - e).toDouble / e <= 0.02,
        s"HLL estimate at $k off by >2%: est ${merged(k)}, exact $e")
    }
  }

  test("HLL state round-trips through parquet: served-from-storage merge == in-memory merge") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag")
    val history = Merge.hllDistinctState(
      li.filter(col("l_orderkey") % 2 === 0), keys, "l_partkey")
    val batch = Merge.hllDistinctState(
      li.filter(col("l_orderkey") % 2 === 1), keys, "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-hll").toString + "/state"
    graft.io.Sinks.parquet(history, dir)
    val served = Merge.finalizeHllDistinct(
      Merge.mergeHllDistinctStates(Seq(spark.read.parquet(dir), batch), keys), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val inMem = Merge.finalizeHllDistinct(
      Merge.mergeHllDistinctStates(Seq(history, batch), keys), keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served == inMem,
      s"sketch binary did not survive parquet: served $served != in-memory $inMem")
  }

  test("moment state: slice-merge is bit-identical to a direct full-data state") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val slices = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))
      .map(Merge.partialMomentState(_, keys, "l_quantity"))
    val merged = Merge.mergeMomentStates(slices, keys)
      .orderBy(keys.map(col): _*)
    val direct = Merge.partialMomentState(li, keys, "l_quantity")
      .orderBy(keys.map(col): _*)
    assert(merged.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("finalizeMoments matches Spark's var_pop/skewness/kurtosis builtins") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag")
    val got = Merge.finalizeMoments(
      Merge.partialMomentState(li, keys, "l_quantity"), keys)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val want = li.groupBy("l_returnflag").agg(
      avg(col("l_quantity")).as("m"),
      var_pop(col("l_quantity")).as("v"),
      skewness(col("l_quantity")).as("s"),
      kurtosis(col("l_quantity")).as("k"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (m, v, sk, ku)) =>
      val (gm, gv, gs, gk) = got(k)
      assert(math.abs(gm - m) < 1e-9, s"mean at $k: $gm vs $m")
      assert(math.abs(gv - v) < 1e-5, s"var at $k: $gv vs $v")
      assert(math.abs(gs - sk) < 1e-5, s"skew at $k: $gs vs $sk")
      assert(math.abs(gk - ku) < 1e-5, s"kurt at $k: $gk vs $ku")
    }
  }

  test("freq state merges across slices and finalizeTopK breaks ties deterministically") {
    val df = Seq(
      ("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), // tie at cnt=2 → a before b
      ("g", "c"), ("g", "d"), ("g", "d"), ("g", "d"), // d cnt=3
      ("h", "x")).toDF("grp", "w")
    val slices = Seq(
      df.filter(col("w") =!= "a"), df.filter(col("w") === "a"))
      .map(Merge.partialFreqState(_, Seq("grp"), "w"))
    val merged = Merge.finalizeTopK(
      Merge.mergeFreqStates(slices, Seq("grp")), Seq("grp"), 3)
      .collect().map(r => (r.getString(0), r.getLong(3)) -> (r.getString(1), r.getLong(2))).toMap
    assert(merged == Map(
      ("g", 1L) -> ("d", 3L), ("g", 2L) -> ("a", 2L), ("g", 3L) -> ("b", 2L),
      ("h", 1L) -> ("x", 1L)))
    // merged state == direct state (bit-parity on the frequency table)
    val direct = Merge.partialFreqState(df, Seq("grp"), "w")
      .orderBy("grp", "v")
    val mergedState = Merge.mergeFreqStates(slices, Seq("grp")).orderBy("grp", "v")
    assert(mergedState.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("capFreqState: never over-counts, Σθ under-count bound, heavy hitters survive a capped merge") {
    // two slices with a large "vocabulary" tail and a few heavy hitters
    val mk = (rows: Seq[(String, Int)]) => rows.flatMap { case (v, n) =>
      Seq.fill(n)(("g", v)) }.toDF("grp", "w")
    val s1 = mk(Seq("hot1" -> 50, "hot2" -> 40, "warm" -> 6) ++
      (1 to 20).map(i => s"tail$i" -> 2))
    val s2 = mk(Seq("hot1" -> 30, "hot3" -> 45, "warm" -> 5) ++
      (21 to 40).map(i => s"tail$i" -> 2))
    val m = 5
    val capped = Merge.mergeFreqStates(
      Seq(s1, s2).map(df =>
        Merge.capFreqState(Merge.partialFreqState(df, Seq("grp"), "w"), Seq("grp"), m)),
      Seq("grp"))
    val cappedCnt = capped.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val trueCnt = Merge.partialFreqState(s1.unionByName(s2), Seq("grp"), "w")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // never over-counts
    cappedCnt.foreach { case (v, c) =>
      assert(c <= trueCnt(v), s"capped count for $v over-counts: $c > ${trueCnt(v)}")
    }
    // θ_s = each slice's m-th largest count (2 and 2 here) ⇒ any value
    // with true count > 4 must be present with its exact count
    val theta = 4L
    trueCnt.filter(_._2 > theta).foreach { case (v, c) =>
      assert(cappedCnt.get(v).contains(c),
        s"heavy hitter $v (true $c > Σθ=$theta) missing or wrong in capped merge: ${cappedCnt.get(v)}")
    }
    // finalize-time top-3 from the capped merge == exact top-3
    val gotTop = Merge.finalizeTopK(capped, Seq("grp"), 3)
      .collect().map(r => (r.getLong(3), r.getString(1))).sorted.toSeq
    assert(gotTop == Seq((1L, "hot1"), (2L, "hot3"), (3L, "hot2")))
    intercept[IllegalArgumentException](Merge.capFreqState(capped, Seq("grp"), 0))
  }

  test("merging a slice with no rows for some key still folds min/max/count correctly") {
    val a = Seq(("x", 1.0), ("x", 3.0)).toDF("g", "v")
    val b = Seq(("y", 5.0)).toDF("g", "v")
    val merged = Merge.finalizeStats(
      Merge.mergeStats(Seq(
        Merge.partialStats(a, Seq("g"), "v"),
        Merge.partialStats(b, Seq("g"), "v")), Seq("g")), Seq("g"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(merged("x") == ((2L, 4.0, 1.0, 3.0)))
    assert(merged("y") == ((1L, 5.0, 5.0, 5.0)))
  }

  test("sample state: merged slice samples are bit-identical to a full-rescan sample") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    val pri = Merge.samplePriorityFast(Seq("id"))
    val k = 7
    // three disjoint slices vs one full pass
    val slices = Seq(
      rows.filter($"id" % 3 === 0), rows.filter($"id" % 3 === 1),
      rows.filter($"id" % 3 === 2))
    val merged = Merge.mergeSampleStates(
      slices.map(Merge.partialSampleState(_, Seq("g"), pri, k)), Seq("g"), k)
    val direct = Merge.partialSampleState(rows, Seq("g"), pri, k)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // incremental re-merge (yesterday's merged state + an empty-ish new
    // batch) is idempotent: the sample never drifts on replayed merges
    val again = Merge.mergeSampleStates(Seq(merged, merged.limit(0)), Seq("g"), k)
    assert(again.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
  }

  test("sample state: finalize ranks by priority, keys short of k keep all rows") {
    val rows = (1L to 4L).map(i => ("only", i)).toDF("g", "id")
    val got = Merge.finalizeSample(
      Merge.partialSampleState(rows, Seq("g"), Merge.samplePriorityFast(Seq("id")), 10),
      Seq("g"))
    assert(got.count() == 4) // k > group size keeps the whole group
    assert(got.columns.toSeq == Seq("g", "id", "rn"))
    assert(got.select("rn").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // portable and fast priorities draw the SAME k rows only by luck —
    // but each is internally deterministic across repeated runs
    val p1 = Merge.partialSampleState(rows, Seq("g"),
      Merge.samplePriorityPortable(Seq("id")), 2).collect().map(_.getLong(1)).toSet
    val p2 = Merge.partialSampleState(rows, Seq("g"),
      Merge.samplePriorityPortable(Seq("id")), 2).collect().map(_.getLong(1)).toSet
    assert(p1 == p2)
    intercept[IllegalArgumentException](Merge.partialSampleState(
      rows, Seq("g"), org.apache.spark.sql.functions.lit(1), 0))
  }

  test("weighted sample state: A-ES race keys keep the merge law; heavy row survives") {
    val rows = (1L to 90L).map(i => ("g", i, if (i == 42L) 1.0e9 else 1.0))
      .toDF("g", "id", "w")
    val pri = Merge.samplePriorityWeighted(Seq("id"), "w")
    val k = 5
    val slices = Seq(rows.filter($"id" % 2 === 0), rows.filter($"id" % 2 === 1))
    val merged = Merge.mergeSampleStates(
      slices.map(Merge.partialSampleState(_, Seq("g"), pri, k)), Seq("g"), k)
    val direct = Merge.partialSampleState(rows, Seq("g"), pri, k)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // the 1e9-weight row's race key is ~1e9× smaller than any unit
    // weight's — it must be in the drawn sample
    assert(Merge.finalizeSample(merged, Seq("g")).filter($"id" === 42L).count() == 1)
  }

  // ───── retractStats: deletes without a rescan (dirty-key repair) ─────

  test("kmv state: overlapping slices merge to exactly the direct sketch; capped at k") {
    // two sources drawing from overlapping value pools
    val rows = ((1L to 120L).map(v => ("a", v)) ++ (61L to 200L).map(v => ("b", v)))
      .toDF("src", "v")
    val pri = Merge.samplePriorityFast(Seq("v"))
    val k = 16
    // slices OVERLAP on values (not just rows) — the same element seen in
    // both slices must occupy one sketch slot, not two
    val merged = Merge.mergeKmvStates(Seq(
      Merge.kmvState(rows.filter($"v" <= 150), "src", pri, k),
      Merge.kmvState(rows.filter($"v" >= 100), "src", pri, k)), "src", k)
    val direct = Merge.kmvState(rows, "src", pri, k)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    assert(direct.groupBy("src").count().collect().map(_.getLong(1)).forall(_ == k))
    // re-merging the merged state is a no-op (at-least-once feeds)
    val again = Merge.mergeKmvStates(Seq(merged, merged), "src", k)
    assert(again.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
  }

  test("kmv sliced states from one scan merge to exactly the direct sketch") {
    // same overlapping-pool corpus, sliced by value parity: the single-scan
    // (key, slice)-windowed form must merge (slice dropped, (key, pri)
    // dedup + re-cap) to the bit-identical per-key sketch the unsliced
    // kmvState computes — the u19 single-scan rewrite's parity claim
    val rows = ((1L to 120L).map(v => ("a", v)) ++ (61L to 200L).map(v => ("b", v)))
      .toDF("src", "v")
    val pri = Merge.samplePriorityFast(Seq("v"))
    val k = 16
    val sliced = Merge.kmvStateSliced(
      rows.withColumn("slice", $"v" % 2), "src", "slice", pri, k)
    val merged = Merge.mergeKmvStates(Seq(sliced.drop("slice")), "src", k)
    val direct = Merge.kmvState(rows, "src", pri, k)
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // each (key, slice) state is itself capped at k
    assert(sliced.groupBy("src", "slice").count()
      .collect().map(_.getLong(2)).forall(_ <= k))
  }

  test("kmv pairwise jaccard: exact when sets fit in k; estimate within tolerance when capped") {
    // |a ∪ b| = 200, |a ∩ b| = 60 → true J = 0.3
    val rows = ((1L to 120L).map(v => ("a", v)) ++ (61L to 200L).map(v => ("b", v))
      ++ (1L to 50L).map(v => ("c", v))).toDF("src", "v")
    val pri = Merge.samplePriorityFast(Seq("v"))
    // k big enough: every set is carried whole, estimate is EXACT
    val exact = Merge.kmvPairwiseJaccard(Merge.kmvState(rows, "src", pri, 512), "src", 512)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(exact(("a", "b")) == 60.0 / 200.0)
    assert(exact(("a", "c")) == 50.0 / 120.0) // c ⊂ a
    assert(exact(("b", "c")) == 0.0)
    // capped sketch: estimate within sampling tolerance of the truth
    val est = Merge.kmvPairwiseJaccard(Merge.kmvState(rows, "src", pri, 64), "src", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(math.abs(est(("a", "b")) - 0.3) < 0.2, s"ab=${est(("a", "b"))}")
    assert(est(("b", "c")) == 0.0) // disjoint sets stay exactly 0 at any k
    // l column: min(k, |union|) — the c-pairs' unions are under k=512
    val l = Merge.kmvPairwiseJaccard(Merge.kmvState(rows, "src", pri, 512), "src", 512)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(l(("a", "b")) == 200L && l(("a", "c")) == 120L && l(("b", "c")) == 190L)
  }

  test("bloom state: no false negatives ever; FP rate in the textbook band; merge == direct") {
    val mBits = 4096L
    val rows = (1L to 400L).map(v => ("k", s"v$v")).toDF("g", "val")
    def pos(c: org.apache.spark.sql.Column) = Merge.bloomPositionsFast(c, mBits, 2)
    val direct = Merge.bloomState(rows, Seq("g"), pos($"val"))
    // overlapping slices (1..300 and 200..400) merge to the direct state
    val merged = Merge.mergeBloomStates(Seq(
      Merge.bloomState(rows.filter($"val".substr(2, 10).cast("long") <= 300), Seq("g"), pos($"val")),
      Merge.bloomState(rows.filter($"val".substr(2, 10).cast("long") >= 200), Seq("g"), pos($"val"))),
      Seq("g"))
    assert(merged.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // re-merge is a no-op (at-least-once feeds)
    val again = Merge.mergeBloomStates(Seq(merged, merged), Seq("g"))
    assert(again.collect().map(_.toSeq).toSet == direct.collect().map(_.toSeq).toSet)
    // every inserted value probes TRUE — the hard guarantee
    val inserted = Merge.bloomProbe(direct, rows, Seq("g"), pos($"val"))
    assert(inserted.filter(!$"maybe_member").count() == 0)
    // fresh values probe mostly false: with n=400, m=4096, k=2 the FP
    // rate is (1−e^(−kn/m))² ≈ 3.1% — allow a generous band
    val fresh = (1L to 2000L).map(v => ("k", s"w$v")).toDF("g", "val")
    val fp = Merge.bloomProbe(direct, fresh, Seq("g"), pos($"val"))
      .filter($"maybe_member").count()
    assert(fp > 0 && fp < 300, s"FP count $fp outside the plausible band for n=400 m=4096 k=2")
    // unknown key (no bloom rows at all) probes false, not error
    val other = Merge.bloomProbe(direct, Seq(("z", "v1")).toDF("g", "val"), Seq("g"), pos($"val"))
    assert(other.collect().head.getBoolean(2) == false) // (g, val, maybe_member)
  }

  test("bloom portable positions: in range, deterministic, k distinct windows") {
    val mBits = 16384L
    val vals = (1L to 50L).map(v => Tuple1(s"x$v")).toDF("val")
    val ps = Merge.bloomPositionsPortable($"val", mBits, 4)
    val got = vals.select(array(ps: _*).as("p")).collect().map(_.getSeq[Long](0))
    assert(got.forall(_.forall(p => p >= 0 && p < mBits)))
    // the 4 md5 windows are independent enough to differ for most values
    assert(got.count(s => s.distinct.size == 4) > 40)
    intercept[IllegalArgumentException](Merge.bloomPositionsPortable($"val", mBits, 5))
    intercept[IllegalArgumentException](Merge.bloomPositionsPortable($"val", (1L << 29), 2))
  }

  test("retractStats == direct recompute over the remaining data (lineitem, bit-parity)") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val deletes = li.filter(col("l_orderkey") % 13 === 0)
    val remaining = li.filter(col("l_orderkey") % 13 =!= 0)
    val state = Merge.partialStats(li, keys, "l_quantity")
    val got = Merge.finalizeStats(
      Merge.retractStats(state, deletes, remaining, keys, "l_quantity"), keys)
      .orderBy(keys.map(col): _*)
    val direct = Merge.finalizeStats(
      Merge.partialStats(remaining, keys, "l_quantity"), keys)
      .orderBy(keys.map(col): _*)
    assert(got.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("retractStats repairs min/max when the delete removes a stored extreme") {
    val data = Seq(("x", 1.0), ("x", 5.0), ("x", 9.0), ("y", 2.0), ("y", 4.0)).toDF("g", "v")
    val deletes = Seq(("x", 9.0)).toDF("g", "v")
    val remaining = Seq(("x", 1.0), ("x", 5.0), ("y", 2.0), ("y", 4.0)).toDF("g", "v")
    val got = Merge.finalizeStats(
      Merge.retractStats(Merge.partialStats(data, Seq("g"), "v"), deletes, remaining, Seq("g"), "v"),
      Seq("g"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("x") == ((2L, 6.0, 1.0, 5.0)))
    assert(got("y") == ((2L, 6.0, 2.0, 4.0))) // untouched key passes through the clean path
  }

  test("retractStats drops a key whose rows are all deleted") {
    val data = Seq(("x", 1.0), ("y", 2.0)).toDF("g", "v")
    val deletes = Seq(("x", 1.0)).toDF("g", "v")
    val remaining = Seq(("y", 2.0)).toDF("g", "v")
    val got = Merge.retractStats(
      Merge.partialStats(data, Seq("g"), "v"), deletes, remaining, Seq("g"), "v")
    assert(got.select("g").as[String].collect().toSeq == Seq("y"))
  }

  test("retractStats keeps a key whose remaining rows are all null-valued (cnt 0, null stats)") {
    val data = Seq(("z", Some(7.0)), ("z", None), ("z", None)).toDF("g", "v")
    val deletes = Seq(("z", Some(7.0))).toDF("g", "v")
    val remaining = Seq(("z", None: Option[Double]), ("z", None)).toDF("g", "v")
    val rows = Merge.retractStats(
      Merge.partialStats(data, Seq("g"), "v"), deletes, remaining, Seq("g"), "v").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "z" && r.getLong(1) == 0L && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("retractHistState: retract-then-finalize quantiles == recompute over survivors (bit-parity)") {
    val li = graft.model.Tables.lineitem(spark, TestSpark.sfDir)
    val keys = Seq("l_returnflag", "l_linestatus")
    val deletes = li.filter(col("l_orderkey") % 13 === 0)
    val remaining = li.filter(col("l_orderkey") % 13 =!= 0)
    val state = Merge.partialQuantileState(li, keys, "l_quantity")
    val dstate = Merge.partialQuantileState(deletes, keys, "l_quantity")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val got = Merge.finalizeQuantiles(
      Merge.retractHistState(state, dstate, keys), keys, ps)
      .orderBy("l_returnflag", "l_linestatus", "p")
    val direct = Merge.finalizeQuantiles(
      Merge.partialQuantileState(remaining, keys, "l_quantity"), keys, ps)
      .orderBy("l_returnflag", "l_linestatus", "p")
    assert(got.collect().map(_.toSeq).toSeq == direct.collect().map(_.toSeq).toSeq)
  }

  test("retractHistState: emptied bins disappear; top-k reflects the deletion") {
    val data = Seq(("g", "a"), ("g", "a"), ("g", "a"), ("g", "b"), ("g", "b"), ("g", "c"))
      .toDF("k", "w")
    val deletes = Seq(("g", "a"), ("g", "a"), ("g", "c")).toDF("k", "w")
    val retracted = Merge.retractHistState(
      Merge.partialFreqState(data, Seq("k"), "w"),
      Merge.partialFreqState(deletes, Seq("k"), "w"), Seq("k"))
    // c emptied → bin gone; counts now a=1, b=2
    assert(retracted.orderBy("v").select("v", "cnt").as[(String, Long)].collect().toSeq ==
      Seq(("a", 1L), ("b", 2L)))
    val top = Merge.finalizeTopK(retracted, Seq("k"), 1).select("v").as[String].collect()
    assert(top.toSeq == Seq("b"))
  }

  test("retractHistState trips the guard when the delete histogram exceeds the state") {
    val data = Seq(("g", 1.0)).toDF("k", "x")
    val deletes = Seq(("g", 1.0), ("g", 1.0)).toDF("k", "x") // bin over-shoot
    val ex = intercept[Exception] {
      Merge.retractHistState(
        Merge.partialQuantileState(data, Seq("k"), "x"),
        Merge.partialQuantileState(deletes, Seq("k"), "x"), Seq("k")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("exceeds the state")), s"unexpected: $ex")
    // a delete for a bin the state never saw is equally a violation
    val ex2 = intercept[Exception] {
      Merge.retractHistState(
        Merge.partialQuantileState(data, Seq("k"), "x"),
        Merge.partialQuantileState(Seq(("g", 9.0)).toDF("k", "x"), Seq("k"), "x"),
        Seq("k")).collect()
    }
    assert(msgs(ex2).exists(_.contains("exceeds the state")), s"unexpected: $ex2")
  }

  test("retractStats trips the distributed guard on a non-subset delete") {
    val data = Seq(("x", 1.0)).toDF("g", "v")
    val deletes = Seq(("x", 1.0), ("x", 2.0)).toDF("g", "v") // 2 deletes, 1 accumulated
    val ex = intercept[Exception] {
      Merge.retractStats(Merge.partialStats(data, Seq("g"), "v"),
        deletes, data.limit(0), Seq("g"), "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("subset contract")), s"unexpected: $ex")
  }

  // ── count-min sketch state ──

  private def cmsToks = graft.model.Tables.documents(spark, graft.TestSpark.sfDir)
    .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("tok"))

  test("cms: estimates NEVER undercount the exact per-key frequency (both hash families)") {
    val toks = cmsToks
    val exact = toks.groupBy("source", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val probes = toks.select("source", "tok").distinct()
    for (pos <- Seq(
        Merge.bloomPositionsPortable(col("tok"), 256L, 3),
        Merge.bloomPositionsFast(col("tok"), 256L, 3))) {
      val state = Merge.cmsState(toks, Seq("source"), pos)
      val est = Merge.cmsEstimate(state, probes, Seq("source"), pos)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(exact.keySet == est.keySet)
      val under = exact.collect { case (k, n) if est(k) < n => (k, n, est(k)) }
      assert(under.isEmpty, s"undercounts: ${under.take(5)}")
    }
  }

  test("cms: merged row-disjoint slices equal the one-shot state bit-for-bit") {
    val toks = cmsToks
    val pos = Merge.bloomPositionsPortable(col("tok"), 1024L, 3)
    val direct = Merge.cmsState(toks, Seq("source"), pos)
    val merged = Merge.mergeCmsStates(Seq(
      Merge.cmsState(toks.filter(col("doc_id") % 3 === 0), Seq("source"), pos),
      Merge.cmsState(toks.filter(col("doc_id") % 3 === 1), Seq("source"), pos),
      Merge.cmsState(toks.filter(col("doc_id") % 3 === 2), Seq("source"), pos)),
      Seq("source"))
    assert(direct.unionByName(merged).distinct().count() == direct.count())
    assert(merged.count() == direct.count())
  }

  test("cms: never-inserted value under a wide grid estimates 0; estimates are deterministic") {
    val toks = cmsToks
    val pos = Merge.bloomPositionsPortable(col("tok"), 65536L, 4)
    val state = Merge.cmsState(toks, Seq("source"), pos)
    val probes = toks.select("source").distinct().withColumn("tok", lit("zz_never_seen"))
    val est = Merge.cmsEstimate(state, probes, Seq("source"), pos)
      .collect().map(_.getLong(2))
    // 4 independent 16-bit cells all colliding is vanishingly unlikely at
    // this vocab size — and the fixture is deterministic, so this pins it
    assert(est.forall(_ == 0L))
  }
}
