package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // doc 0 and 1 differ in one trailing word (3-shingle Jaccard 5/7 ≈ 0.714);
  // doc 2 shares nothing; doc 3 is an exact copy of doc 0.
  private def docs = Seq(
    (0L, "a b c d e f g h"),
    (1L, "a b c d e f g x"),
    (2L, "z y w v u t s r"),
    (3L, "a b c d e f g h")).toDF("doc_id", "text")

  test("shingles: k-word shingles, short docs fall back to whole text") {
    val sh = Seq((0L, "a b c d")).toDF("doc_id", "text")
      .select(explode(Dedup.shingles(col("text"), 3)).as("s")).as[String].collect().toSet
    assert(sh == Set("a b c", "b c d"))
    val short = Seq((0L, "a b")).toDF("doc_id", "text")
      .select(explode(Dedup.shingles(col("text"), 3)).as("s")).as[String].collect().toSeq
    assert(short == Seq("a b"))
  }

  test("exactJaccardPairs computes hand-checked Jaccard on shared-shingle pairs") {
    val pairs = Dedup.exactJaccardPairs(Dedup.shingleDF(docs), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // (0,1): 5 shared of 7 union → 0.7143; (0,3),(1,3): copies
    assert(pairs == Set((0L, 1L, 0.7143), (0L, 3L, 1.0), (1L, 3L, 0.7143)))
  }

  test("minhashNearDup finds near-dups, excludes unrelated docs, recalls exact copies") {
    val got = Dedup.minhashNearDup(docs, thr = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(!got.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("prefix-filtered join equals the full exact-Jaccard join (recall 1)") {
    val full = Dedup.exactJaccardPairs(Dedup.shingleDF(docs), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.prefixFilteredJaccardPairs(docs, thr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full && full.nonEmpty)
  }

  test("capDocumentFrequency drops exactly the shingles above the cap") {
    val sh = Seq((0L, "hot"), (1L, "hot"), (2L, "hot"), (0L, "rare"), (1L, "other"))
      .toDF("doc_id", "shingle")
    val kept = Dedup.capDocumentFrequency(sh, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kept == Set((0L, "rare"), (1L, "other")))
  }

  test("df-cap parity: capped dedup on stop-shingle-polluted corpus == uncapped on clean corpus") {
    // Plant a stop-shingle in EVERY doc at the substrate level (df = 4,
    // above cap 3; every real shingle has df <= 3). With the cap on, the
    // polluted corpus must give bit-identical (id1, id2, jaccard) output
    // to the clean corpus uncapped — dropping a ubiquitous shingle
    // recovers exactly the clean shingle sets. Without the cap, the
    // planted shingle makes every doc pair a candidate (the hot bucket
    // this guards against) and shifts every Jaccard value.
    val clean = Dedup.shingleDF(docs)
    val polluted = clean.union(
      docs.select(col("doc_id"), lit("the the the").as("shingle")))
    def result(sh: org.apache.spark.sql.DataFrame, cap: Option[Long]) =
      Dedup.minhashNearDupFromShingles(sh, thr = 0.7, maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cleanUncapped = result(clean, None)
    assert(result(polluted, Some(3L)) == cleanUncapped && cleanUncapped.nonEmpty)
    // sanity: uncapped on the polluted corpus is NOT bit-identical —
    // the stop-shingle inflates every intersection and union
    assert(result(polluted, None) != cleanUncapped)
  }

  test("prefix-filtered join with a generous df-cap is unchanged (cap is a guard, not a semantic)") {
    val full = Dedup.prefixFilteredJaccardPairs(docs, thr = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = Dedup.prefixFilteredJaccardPairs(docs, thr = 0.5, maxDf = Some(1000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == full && full.nonEmpty)
  }

  test("connectedComponents: chains and common-neighbor links resolve to min-id clusters") {
    // component {1,2,3} via a chain, {4,5,6} linked ONLY through common
    // neighbor 6 (the case greedy per-pair dropping gets wrong: it would
    // keep both 4 and 5), and an isolated pair {8,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 6L), (5L, 6L), (8L, 9L))
      .toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L, 8L -> 8L, 9L -> 8L))
    // empty pair set → empty cluster table (no near-dups found)
    val none = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id1", "id2"))
    assert(none.isEmpty)
  }

  test("connectedComponents: 1000-node path converges in ~log n rounds, not O(diameter)") {
    // the shape that killed min-label propagation: one component of
    // diameter 999 (an incremental-version chain). Alternating star
    // contraction must label it correctly WITHOUT ~1000 rounds — the
    // proven bound is O(log² n), measured behavior ~log n (11 rounds).
    val n = 1000
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("id1", "id2")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain, maxIters = 64)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == n && got.forall(_._2 == 0L))
    val bound = 2 * (math.log(n) / math.log(2)).ceil.toInt // 2·⌈log₂ n⌉ = 20
    assert(rounds <= bound, s"took $rounds rounds, expected ≤ $bound")
  }

  test("updateClusters: incremental label maintenance == full CC recompute, and composes across batches") {
    // existing graph: {1,2,3} (chain), {8,9}, {50,51}, {60,61}
    val pairs0 = Seq((1L, 2L), (2L, 3L), (8L, 9L), (50L, 51L), (60L, 61L))
      .toDF("id1", "id2")
    val labels0 = Dedup.connectedComponents(pairs0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // batch A: bridge {1,2,3}↔{8,9} via (3,8); a redundant in-cluster
    // edge (9,8); a brand-new pair (100,101); new doc 200 joins cluster 1
    val batchA = Seq((3L, 8L), (9L, 8L), (100L, 101L), (200L, 2L)).toDF("id1", "id2")
    val afterA = Dedup.updateClusters(labels0, batchA)
    assert(toMap(afterA) == toMap(
      Dedup.connectedComponents(pairs0.unionByName(batchA))))

    // batch B: new doc 300 merges {50,51} and {60,61} transitively —
    // the common-neighbor shape greedy per-pair maintenance gets wrong
    val batchB = Seq((300L, 50L), (300L, 60L)).toDF("id1", "id2")
    val afterB = Dedup.updateClusters(afterA, batchB)
    val full = toMap(Dedup.connectedComponents(
      pairs0.unionByName(batchA).unionByName(batchB)))
    assert(toMap(afterB) == full, s"composed incremental != full: ${toMap(afterB)} vs $full")
    // hand-check the merged components
    assert(full == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L, 200L -> 1L,
      100L -> 100L, 101L -> 100L,
      50L -> 50L, 51L -> 50L, 60L -> 50L, 61L -> 50L, 300L -> 50L))

    // one-shot over A∪B equals the two-step composition
    val oneShot = Dedup.updateClusters(labels0, batchA.unionByName(batchB))
    assert(toMap(oneShot) == full)

    // the label table is the third persisted artifact (next to the LSH
    // index + df table): a batch folded into the PARQUET-served table
    // must equal the in-memory fold bit for bit — schema/types surviving
    // storage is what makes the nightly label-maintenance job composable
    val dir = java.nio.file.Files.createTempDirectory("graft-labels").toString + "/labels"
    graft.io.Sinks.parquet(afterA, dir)
    val served = Dedup.updateClusters(spark.read.parquet(dir), batchB)
    assert(toMap(served) == full,
      "label table did not survive parquet: served fold != in-memory fold")

    // the CHANGED-ROWS form: applying updateClustersDelta as upserts over
    // the previous table == updateClusters — and the delta itself carries
    // only touched rows (batch B moves {50..61,300}, leaves cluster 1 and
    // {100,101} untouched), which is what makes the persisted label
    // artifact delta-sized per epoch
    val deltaB = Dedup.updateClustersDelta(afterA, batchB)
    val deltaKeys = deltaB.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(deltaKeys == Set(60L, 61L, 300L),
      s"delta should carry only moved/new rows, got $deltaKeys")
    val applied = graft.ops.Merge.applyChangeLog(afterA,
      deltaB.withColumn("op", lit("upsert")).withColumn("seq", lit(1L)),
      Seq("doc_id"))
    assert(toMap(applied) == full,
      "upsert-applied updateClustersDelta != updateClusters")
  }

  test("incrementalNearDup == full run restricted to batch-involving pairs; corpus-internal pairs excluded") {
    // corpus: internal near-dup pair (10,11) that must NOT appear in the
    // increment's output; 12 unrelated. batch: 100 near-dups corpus doc 10
    // (cross-batch), 101 near-dups 100 (within-batch), 102 unique.
    val corpus = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "a b c d e f g h i j"),
      (12L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "a b c d e f g h i j"),
      (101L, "a b c d e f g h i j"),
      (102L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDup(batch, corpus, Dedup.lshBandIndex(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // expected: every copy-pair that touches the batch
    assert(inc == Set(
      (10L, 100L, 1.0), (11L, 100L, 1.0),
      (10L, 101L, 1.0), (11L, 101L, 1.0),
      (100L, 101L, 1.0)))
    // bit-parity with the joint run restricted to batch-involving pairs
    val batchIds = Set(100L, 101L, 102L)
    val full = Dedup.minhashNearDup(corpus.union(batch))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => batchIds(p._1) || batchIds(p._2)).toSet
    assert(inc == full)
  }

  test("incrementalNearDupServed (persisted shingle substrate) == incrementalNearDup bit-for-bit") {
    // same corpus/batch as the increment-parity case; the served form
    // verifies candidates against a stored shingleDF artifact instead of
    // re-shingling corpus text — dd5b's zero-archive-reads claim
    val corpus = Seq(
      (10L, "a b c d e f g h i j"),
      (11L, "a b c d e f g h i j"),
      (12L, "z y x w v u t s r q")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "a b c d e f g h i j"),
      (101L, "a b c d e f g h i j"),
      (102L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val index = Dedup.lshBandIndex(corpus)
    val dir = java.nio.file.Files.createTempDirectory("graft-served").toString
    Dedup.shingleDF(corpus).write.mode("overwrite").parquet(s"$dir/shingles")
    val served = Dedup.incrementalNearDupServed(
        batch, spark.read.parquet(s"$dir/shingles"), index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recomputed = Dedup.incrementalNearDup(batch, corpus, index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == recomputed)
  }

  test("capped incremental == capped joint run when both cap with the SAME df table") {
    // Boilerplate block shared by 10, 11 (corpus) and 100 (batch): its
    // shingles have df = 3 > cap 2, so capping drops them. (12, 101) is a
    // genuine exact copy whose shingles (df = 2 ≤ cap) survive. Uncapped,
    // boilerplate alone makes (10,100)/(11,100) near-dups; capped, only
    // the real copy pair remains — so the cap provably bites here.
    val boiler = (1 to 57).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (10L, s"$boiler u1 u2 u3"),
      (11L, s"$boiler v1 v2 v3"),
      (12L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"$boiler w1 w2 w3"),
      (101L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val cap = 2L

    // df-table maintenance parity: merged slice tables == joint recompute
    val dfCorpus = Dedup.shingleDfTable(Dedup.shingleDF(corpus))
    val dfBatch = Dedup.shingleDfTable(Dedup.shingleDF(batch))
    val merged = Dedup.mergeShingleDf(Seq(dfCorpus, dfBatch))
    val joint = Dedup.shingleDfTable(Dedup.shingleDF(corpus.union(batch)))
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      joint.collect().map(r => (r.getString(0), r.getLong(1))).toSet)

    // cap parity: index and batch capped against the SAME merged table ==
    // joint run capped at the same df (its self-computed df IS the merged
    // table, corpus and batch being disjoint), restricted to batch pairs
    val index = Dedup.lshBandIndexCapped(corpus, merged, cap)
    val incCapped = Dedup.incrementalNearDupCapped(batch, corpus, index, merged, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchIds = Set(100L, 101L)
    val jointCapped = Dedup.minhashNearDup(corpus.union(batch), maxDf = Some(cap))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => batchIds(p._1) || batchIds(p._2)).toSet
    assert(incCapped == jointCapped, s"inc=$incCapped joint=$jointCapped")
    assert(incCapped == Set((12L, 101L, 1.0)))

    // and the cap genuinely changed the outcome: uncapped keeps the
    // boilerplate-driven pairs
    val incUncapped = Dedup.incrementalNearDup(batch, corpus, Dedup.lshBandIndex(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incUncapped.exists(p => p._1 == 10L && p._2 == 100L))
  }

  test("persisted artifacts round-trip: index + shingle-df table served from parquet == in-memory, bit for bit") {
    // The 100 TB contract: lshBandIndex and shingleDfTable live NEXT TO
    // the archive as parquet, and every increment caps/probes against the
    // READ-BACK frames — so schemas and types must survive the round-trip
    // and the served run must equal the in-memory run exactly. Same
    // corpus/batch as the capped-parity case so the cap provably bites.
    val boiler = (1 to 57).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (10L, s"$boiler u1 u2 u3"),
      (11L, s"$boiler v1 v2 v3"),
      (12L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"$boiler w1 w2 w3"),
      (101L, "m n o p q r s t u v")).toDF("doc_id", "text")
    val cap = 2L
    val merged = Dedup.mergeShingleDf(Seq(
      Dedup.shingleDfTable(Dedup.shingleDF(corpus)),
      Dedup.shingleDfTable(Dedup.shingleDF(batch))))
    val index = Dedup.lshBandIndexCapped(corpus, merged, cap)

    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-artifacts").toString
    graft.io.Sinks.parquet(merged, s"$dir/shingle_df")
    graft.io.Sinks.parquet(index, s"$dir/lsh_index")
    val mergedBack = spark.read.parquet(s"$dir/shingle_df")
    val indexBack = spark.read.parquet(s"$dir/lsh_index")

    // column names and types survive parquet (nullability legitimately
    // widens on read-back, so compare name→type, not full StructFields)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => f.name -> f.dataType).toSeq
    assert(shape(mergedBack) == shape(merged))
    assert(shape(indexBack) == shape(index))
    // the index parquet is the deterministic artifact: same rows exactly
    assert(indexBack.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      index.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)

    def run(idx: org.apache.spark.sql.DataFrame, tbl: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalNearDupCapped(batch, corpus, idx, tbl, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inMemory = run(index, merged)
    val served = run(indexBack, mergedBack)
    assert(served == inMemory && inMemory == Set((12L, 101L, 1.0)),
      s"served=$served inMemory=$inMemory")
  }

  test("minhashNearDup rejects numPerm below bands*rows") {
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDup(docs, numPerm = 32, bands = 16, rows = 4)
    }
  }

  test("hashed-shingle scale path finds the same near-dup pairs") {
    val got = Dedup.minhashNearDup(docs, thr = 0.7, hashShingles = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("minhash signatures of identical texts are identical") {
    val sig = Dedup.minhashSignatures(Dedup.shingleDF(docs), numPerm = 8)
    val rows = sig.filter(col("doc_id").isin(0L, 3L)).drop("doc_id").collect()
    assert(rows(0) == rows(1))
  }

  test("simhash: identical docs hash identically; near-dups are close, unrelated far") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
  }

  test("simhashNearDup surfaces exact copies at hamming 0") {
    val got = Dedup.simhashNearDup(Dedup.simhash(docs), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((0L, 3L, 0)))
  }

  test("containmentPairs: an embedded prefix scores 1.0 toward its superstring, not back") {
    import spark.implicits._
    val long = "q w e r t y u i o p a s d f g h j k l z"
    val short = "q w e r t y u i"  // prefix: every 3-gram of short ⊂ long
    val planted = Seq((1L, long), (2L, short), (3L, "totally different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(Dedup.shingleDF(planted), minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0)))  // direction matters: 1→2 is 6/18
    // symmetric Jaccard misses it entirely at the same bar
    assert(Dedup.exactJaccardPairs(Dedup.shingleDF(planted), 0.9).count() == 0)
  }

  test("containmentPairs: hashed+capped production plan finds every exact-plan pair on the corpus") {
    val docs = graft.model.Tables.documents(spark, graft.TestSpark.sfDir)
    val exact = Dedup.containmentPairs(Dedup.shingleDF(docs), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prod = Dedup.containmentPairs(Dedup.hashedShingleDF(docs), 0.9,
      maxDf = Some(Dedup.DefaultMaxDf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap can only under-score; on this corpus (no shingle above the
    // cap) the sets are identical — pinned so a silent cap regression
    // (or a hash collision) shows up
    assert(prod == exact)
    assert(exact.nonEmpty)  // the planted near-dup families contain each other
  }
}
