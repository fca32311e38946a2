package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ScdSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private def changelog = Seq(
    (1L, ts("2020-01-01"), "A"),
    (1L, ts("2021-06-15"), "B"),
    (1L, ts("2023-03-01"), "C"),
    (2L, ts("2020-05-05"), "X")).toDF("k", "eff", "attr")

  test("buildScd2: half-open intervals tile time per key; last version is current") {
    val scd = Scd.buildScd2(changelog, Seq("k"), "eff")
      .orderBy("k", "valid_from")
      .select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    val k1 = scd.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
    // each valid_to == the next version's valid_from (no gap, no overlap)
    assert(k1(0).getTimestamp(3) == k1(1).getTimestamp(2))
    assert(k1(1).getTimestamp(3) == k1(2).getTimestamp(2))
    assert(k1(2).isNullAt(3) && k1(2).getBoolean(4))
    assert(!k1(0).getBoolean(4) && !k1(1).getBoolean(4))
    val k2 = scd.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2(0).isNullAt(3) && k2(0).getBoolean(4))
  }

  test("buildScd2 with seqCol: highest sequence wins among same-instant replays") {
    val replayed = Seq(
      (1L, ts("2020-01-01"), "stale", 1L),
      (1L, ts("2020-01-01"), "fresh", 2L),
      (1L, ts("2021-01-01"), "next", 1L)).toDF("k", "eff", "attr", "seq")
    val scd = Scd.buildScd2(replayed, Seq("k"), "eff", seqCol = Some("seq"))
      .orderBy("valid_from").select("attr").as[String].collect().toSeq
    assert(scd == Seq("fresh", "next"))
  }

  test("pointInTime: facts pick the version valid at their own instant (boundaries half-open)") {
    val dim = Scd.buildScd2(changelog, Seq("k"), "eff")
    val facts = Seq(
      (10L, 1L, ts("2019-12-31")), // before first version → null attr
      (11L, 1L, ts("2020-01-01")), // exactly v1's valid_from → A
      (12L, 1L, ts("2021-06-14")), // last instant of v1 → A
      (13L, 1L, ts("2021-06-15")), // exactly v2's valid_from → B
      (14L, 1L, ts("2024-01-01")), // current → C
      (15L, 3L, ts("2022-01-01"))  // unknown entity → null attr
    ).toDF("fid", "k_fact", "t")
    val got = Scd.pointInTime(facts, dim, Seq("k_fact" -> "k"), "t")
      .orderBy("fid").select("fid", "attr").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map(10L -> null, 11L -> "A", 12L -> "A", 13L -> "B", 14L -> "C", 15L -> null))
  }

  test("updateScd2 == from-scratch rebuild over the concatenated changelog; untouched keys pass through") {
    val existing = Scd.buildScd2(changelog, Seq("k"), "eff")
    val batch = Seq(
      (1L, ts("2024-07-01"), "D"),  // new current version for an existing key
      (3L, ts("2022-02-02"), "N")   // brand-new key
    ).toDF("k", "eff", "attr")
    val got = Scd.updateScd2(existing, batch, Seq("k"), "eff")
    val full = Scd.buildScd2(changelog.unionByName(batch), Seq("k"), "eff")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect().map(_.toSeq).toSet
    assert(canon(got) == canon(full))
    // key 2 untouched by the batch: its interval row must be byte-identical
    assert(canon(got.filter($"k" === 2L)) == canon(existing.filter($"k" === 2L)))
  }

  test("updateScd2: a batch version at an existing instant replaces it (batch wins)") {
    val existing = Scd.buildScd2(changelog, Seq("k"), "eff")
    val correction = Seq((1L, ts("2021-06-15"), "B-fixed")).toDF("k", "eff", "attr")
    val got = Scd.updateScd2(existing, correction, Seq("k"), "eff")
      .filter($"k" === 1L).orderBy("valid_from").select("attr").as[String].collect().toSeq
    assert(got == Seq("A", "B-fixed", "C"))
  }

  test("pointInTime never fans out: output rows == fact rows") {
    val dim = Scd.buildScd2(changelog, Seq("k"), "eff")
    val facts = (1 to 50).map(i => (i.toLong, 1L + i % 2, ts(f"202${i % 4}-01-01")))
      .toDF("fid", "k_fact", "t")
    assert(Scd.pointInTime(facts, dim, Seq("k_fact" -> "k"), "t").count() == 50L)
  }

  test("streaming attach: replayed changelog stream == batch updateScd2 loop; deltas stay key-sliver-sized") {
    // dimension-changelog micro-batches land as delta versions on the
    // persisted interval table; the reference folds the same batches
    // through updateScd2 in a driver loop
    val root0 = java.nio.file.Files.createTempDirectory("graft-scd-stream").toString
    val src = new java.io.File(s"$root0/src"); src.mkdirs()
    val b1 = Seq((1L, ts("2024-01-01"), "D"), (3L, ts("2022-02-02"), "N"))
      .toDF("k", "eff", "attr")
    val b2 = Seq((1L, ts("2021-06-15"), "B-fixed"), (4L, ts("2024-05-05"), "Q"))
      .toDF("k", "eff", "attr")
    Seq((b1, "b1"), (b2, "b2")).foreach { case (df, name) =>
      val tmp = s"$root0/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(src, s"$name.parquet").toPath)
    }

    val streamRoot = s"$root0/dim_stream"
    Scd.init(changelog, streamRoot, Seq("k"), "eff")
    val q = Scd.attach(
      spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString),
      streamRoot, Seq("k"), "eff").start()
    try q.processAllAvailable() finally q.stop()

    val batchRef = Seq(b1, b2).foldLeft(Scd.buildScd2(changelog, Seq("k"), "eff")) {
      (acc, b) => Scd.updateScd2(acc, b, Seq("k"), "eff")
    }
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "attr", "valid_from", "valid_to", "is_current")
        .collect().map(_.toSeq).toSet
    val served = graft.io.Versioned.read(spark, streamRoot)
    assert(canon(served) == canon(batchRef))
    // the versions landed as deltas (v1 full, v2+ changelogs)
    val vs = graft.io.Versioned.versions(spark, streamRoot)
    assert(vs.size >= 3)
    assert(vs.tail.forall(v => graft.io.Versioned.isDelta(spark, streamRoot, v)))

    // crash-replay: re-applying an already-marked micro-batch id is a no-op
    val before = (canon(graft.io.Versioned.read(spark, streamRoot)),
      graft.io.Versioned.versions(spark, streamRoot))
    Scd.applyBatch(b2, streamRoot, batchId = 1, Seq("k"), "eff")
    assert((canon(graft.io.Versioned.read(spark, streamRoot)),
      graft.io.Versioned.versions(spark, streamRoot)) == before)
  }
}
