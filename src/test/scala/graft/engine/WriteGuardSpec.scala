package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.Tables

/** WriteGuard semantics: the high-cardinality partitionBy offender is
  * refused at the sink funnel before any directory lands; the engine's
  * own layouts (month-keyed, cid-keyed) admit; the rowCount rung admits
  * cheaply but never refuses. */
class WriteGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  test("partitionBy on a high-cardinality key is refused; the month-keyed layout admits") {
    val li = Tables.lineitem(spark, d)
    // the classic metadata-melter: one directory per orderkey
    val e = intercept[PlanGuard.PlanRejected](
      WriteGuard.admit(li, Seq("l_orderkey"), maxPartitions = 100))
    assert(e.getMessage.contains("write-partitions"), e.getMessage)
    assert(e.getMessage.contains("l_orderkey"), e.getMessage)
    // the engine's own discipline: ~7 years of ship months
    val byMonth = li.withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    assert(WriteGuard.admit(byMonth, Seq("ship_month"), maxPartitions = 100) eq byMonth)
    // unpartitioned writes pass untouched at any cap
    assert(WriteGuard.admit(li, Nil, maxPartitions = 1) eq li)
  }

  test("the sink funnel is guarded: a >10k-key partitionBy never lands a single directory") {
    // the real wiring, at the DEFAULT env cap: 30k distinct keys through
    // the actual Sinks entry points — refused before any file exists
    val big = spark.range(0, 30000).toDF("k")
      .withColumn("v", col("k") * 2)
    val out = java.nio.file.Files.createTempDirectory("graft-writeguard").toString
    val target = s"$out/by_k"
    val e = intercept[PlanGuard.PlanRejected](
      graft.io.Sinks.parquet(big, target, partitionBy = Seq("k")))
    assert(e.getMessage.contains("write-partitions"), e.getMessage)
    assert(!new java.io.File(target).exists(),
      "the guard must fire BEFORE the writer creates the output root")
    intercept[PlanGuard.PlanRejected](
      graft.io.Sinks.parquetPartitionOverwrite(big, target, Seq("k")))
    assert(!new java.io.File(target).exists())
    // the same frame written UNPARTITIONED passes: file-count governance
    // for flat layouts belongs to the sized sinks, not directory fan-out
    graft.io.Sinks.parquet(big, s"$out/flat")
    assert(new java.io.File(s"$out/flat").exists())
  }

  test("distinct count, not row count, decides: a unique key past the cap refuses, a low-cardinality key on the same rows admits") {
    import spark.implicits._
    val bigger = Seq.tabulate(50)(i => (i.toLong, s"v$i")).toDF("k", "v")
    intercept[PlanGuard.PlanRejected](
      WriteGuard.admit(bigger, Seq("k"), maxPartitions = 10))
    val lowCard = Seq.tabulate(50)(i => (i % 3, s"v$i")).toDF("k", "v")
    assert(WriteGuard.admit(lowCard, Seq("k"), maxPartitions = 10) eq lowCard)
    // the rowCount rung can only admit cheaply (rows ≤ cap ⇒ distinct ≤
    // cap), never refuse: a tiny frame admits even with a unique key
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    assert(WriteGuard.admit(tiny, Seq("k"), maxPartitions = 3) eq tiny)
  }

  test("append admission is per-LAYOUT: existing directories count against the cap; knownKeyBound skips the scans") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-writeguard-cum").toString
    val target = s"$out/by_k"
    // first write: 6 keys, cap 10 — admits and lands
    val first = Seq.tabulate(60)(i => (i % 6, s"v$i")).toDF("k", "v")
    graft.io.Sinks.parquet(first, target, partitionBy = Seq("k"), mode = "overwrite")
    assert(WriteGuard.existingPartitionDirs(first, target, 1, 100L) == 6L)
    // an APPEND bringing 6 disjoint new keys would put the layout at 12
    // dirs > cap — refused even though the batch alone (6) is within cap;
    // and nothing landed
    val disjoint = Seq.tabulate(60)(i => (6 + i % 6, s"w$i")).toDF("k", "v")
    val e = intercept[PlanGuard.PlanRejected](
      WriteGuard.admit(disjoint, Seq("k"), maxPartitions = 10,
        mode = "append", target = Some(target)))
    assert(e.getMessage.contains("already on disk"), e.getMessage)
    assert(WriteGuard.existingPartitionDirs(first, target, 1, 100L) == 6L)
    // the pre-cumulative behavior would have admitted this batch: per-write
    // check (no target) passes, pinning that the refusal above came from
    // the existing-dirs term
    WriteGuard.admit(disjoint, Seq("k"), maxPartitions = 10, mode = "append")
    // a layout already past the cap refuses any further partitioned append
    intercept[PlanGuard.PlanRejected](
      WriteGuard.admit(disjoint, Seq("k"), maxPartitions = 5,
        mode = "append", target = Some(target)))
    // knownKeyBound: a caller-contracted bounded key admits with no
    // listing and no ACD scan — and refuses when the BOUND itself is
    // over the cap
    WriteGuard.admit(disjoint, Seq("k"), maxPartitions = 12,
      mode = "append", target = Some(target), knownKeyBound = Some(12L))
    intercept[PlanGuard.PlanRejected](
      WriteGuard.admit(disjoint, Seq("k"), maxPartitions = 10,
        mode = "append", target = Some(target), knownKeyBound = Some(11L)))
    // an absent target counts zero existing — the first write of a layout
    assert(WriteGuard.existingPartitionDirs(first, s"$out/nothing", 1, 100L) == 0L)
  }

  test("env cap parsing: default, explicit, malformed fails loudly") {
    assert(WriteGuard.maxWritePartitionsFromEnv(Map.empty) ==
      WriteGuard.DefaultMaxWritePartitions)
    assert(WriteGuard.maxWritePartitionsFromEnv(
      Map("GRAFT_GUARD_MAX_WRITE_PARTITIONS" -> "250")) == 250L)
    intercept[IllegalArgumentException](
      WriteGuard.maxWritePartitionsFromEnv(
        Map("GRAFT_GUARD_MAX_WRITE_PARTITIONS" -> "ten")))
    intercept[IllegalArgumentException](
      WriteGuard.maxWritePartitionsFromEnv(
        Map("GRAFT_GUARD_MAX_WRITE_PARTITIONS" -> "0")))
  }

  test("registry-layout audit: the engine's own partitioned writes admit under the default cap") {
    // the layouts the engine actually ships: ds9's month-partitioned fact
    // and the vector index's cid partitions — both orders of magnitude
    // under the default 10k cap
    val li = Tables.lineitem(spark, d)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    WriteGuard.admit(li, Seq("ship_month"))
    val emb = Tables.embeddings(spark, d).withColumn("cid", col("vec_id") % 8)
    WriteGuard.admit(emb, Seq("cid"))
  }
}
