package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines — exact dedup,
  * MinHash+LSH near-dup, SimHash. Beyond reference parity (the reference
  * only *counts* whole-row duplicates — src/data_validator.py:127-129);
  * these are the north-star components (SURVEY.md §7.6).
  *
  * Scale design (the non-negotiables at 100 TB):
  *  - NOTHING here is all-pairs. Candidate generation is always a
  *    bucket-equality join (LSH band hash / shared shingle / SimHash band),
  *    so the shuffle key is the bucket and cost scales with bucket sizes,
  *    not n².
  *  - Signatures are computed with partial+final hash aggregation
  *    (min/sum over exploded shingles — map-side combinable, codegen'd,
  *    zero UDFs).
  *  - Exact-Jaccard verification runs ONLY over docs that appear in some
  *    candidate pair (a semi-join keeps the verify input tiny).
  *  - Hot-shingle mitigation: a shingle shared by millions of docs makes a
  *    hot bucket in both candidate generation and the verify join. The
  *    production plans cap shingle document frequency
  *    ([[capDocumentFrequency]]): shingles above the cap carry no
  *    discriminating signal ("the the the") and are dropped BEFORE
  *    signatures/candidates/verification. Oracle plans keep the full set
  *    (DuckDB must see identical shingles). Parity: on a corpus whose
  *    only hot shingle is ubiquitous, capped output == uncapped output on
  *    the un-polluted corpus, bit for bit (pinned in DedupSpec).
  */
object Dedup {

  /** Production document-frequency cap: any shingle in more documents than
    * this is a stop-shingle. The local test corpus tops out at df=25
    * (sf0.1), so the cap is a no-op on it; at 100 TB it is the guard that
    * keeps bucket sizes bounded. */
  val DefaultMaxDf = 1000L

  /** Drop shingles whose document frequency exceeds `maxDf` from a
    * (doc_id, shingle) frame. One groupBy for the df table, then an
    * anti-join. The hot set is bounded by total_occurrences / maxDf —
    * usually tiny, but at extreme corpus sizes that bound can itself
    * exceed broadcast limits, so the join strategy is deliberately LEFT
    * TO THE PLANNER: AQE broadcasts when the aggregated set is small and
    * falls back to a shuffled anti-join when it isn't (a forced
    * broadcast() here would OOM the driver at exactly the scale the cap
    * exists for). Docs whose shingles are ALL hot drop out of dedup
    * entirely (they are indistinguishable boilerplate).
    *
    * The result is LAZY; both production call sites localCheckpoint the
    * capped frame as a whole (it feeds several consumers — signatures,
    * candidate semi-join, the 3-way verify join — and a lazy cap would
    * re-run this groupBy + anti-join once per consumer, measured ~4× per
    * dedup query at sf0.1). */
  /** Materialize a CORPUS-SCALE substrate (the per-doc shingle frame —
    * the widest thing the engine ever snapshots) as a SERIALIZED,
    * spillable local checkpoint. `localCheckpoint()`'s default
    * MEMORY_AND_DISK stores DESERIALIZED rows: java String overhead is
    * several × the data, and at the sf30 ladder rung (1.5 M docs, ~10⁸
    * shingle rows) those blocks OOM even a 48 GiB heap across bench
    * passes; MEMORY_AND_DISK_SER keeps the snapshot a compact byte
    * stream that evicts to disk cleanly, at a small per-consumer decode
    * cost. Sliver-scale checkpoints (edge lists, centroids, label
    * tables) keep the deserialized default — their footprint is noise. */
  private def checkpointSubstrate(df: DataFrame): DataFrame =
    df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  def capDocumentFrequency(sh: DataFrame, maxDf: Long = DefaultMaxDf): DataFrame = {
    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("shingle")
    sh.join(hot, Seq("shingle"), "left_anti")
      .select(sh.columns.map(col).toIndexedSeq: _*) // using-join moves the key first; keep caller's order
  }

  /** Whitespace tokens. Mirrors DuckDB `string_split(text, ' ')` exactly
    * (no empty-token filtering) so shingle sets match the oracle. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct k-word shingles over an ALREADY-MATERIALIZED token array
    * column; a doc with fewer than k tokens contributes its whole text
    * as one shingle (totality). `ws` must be a projected attribute, not
    * an inline `split(...)`: the transform lambda reads it per element,
    * and a nested expression would re-split the text for every shingle
    * (measured 5s → 0.5s for the sf0.1 shingle explode). */
  def shinglesFromTokens(text: Column, ws: Column, k: Int = 3,
                         distinct: Boolean = true): Column = {
    val arr = transform(sequence(lit(0), size(ws) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(ws, i + j + lit(1))): _*))
    when(size(ws) >= k, if (distinct) array_distinct(arr) else arr)
      .otherwise(array(text))
  }

  /** Convenience single-expression form (tests / tiny inputs). Hot paths
    * go through [[shingleDF]], which stages the token array first. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(text, tokens(text), k)

  /** (doc_id, shingle) exploded pairs — the substrate for signatures and
    * for exact-Jaccard verification. */
  def shingleDF(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", k: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        tokens(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        explode(shinglesFromTokens(col("__text"), col("__ws"), k)).as("shingle"))

  /** Production shingle form: 64-bit hashes instead of shingle strings, so
    * downstream joins/aggregations shuffle 8 bytes per shingle instead of
    * the text. Collision probability per doc pair is ~|shingles|²/2⁶⁴ —
    * irrelevant in production, but the oracle path keeps strings because
    * a collision would (astronomically rarely) perturb exact Jaccard. */
  def hashedShingleDF(docs: DataFrame, k: Int = 3): DataFrame =
    shingleDF(docs, k = k).select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))

  /** MinHash signature: numPerm independent min-hashes per doc. The shingle
    * string is hashed ONCE (xxhash64), STAGED as a projected attribute, and
    * each "permutation" re-hashes that fixed-width 8-byte value with the
    * permutation index — so per shingle the string bytes are walked once,
    * not numPerm times (same staging lesson as [[shinglesFromTokens]]).
    * A multiply-add bijection (a·h+b mod 2⁶⁴) would be cheaper still but
    * needs wrap-around semantics, and Spark 4 runs ANSI arithmetic — Long
    * overflow throws instead of wrapping — so the mix stays a hash. One
    * wide partial+final hash agg, fully codegen'd. */
  def minhashSignatures(sh: DataFrame, numPerm: Int = 64): DataFrame = {
    val hashed = sh.select(col("doc_id"), xxhash64(col("shingle")).as("__h"))
    val aggs = (0 until numPerm).map(i => min(xxhash64(col("__h"), lit(i))).as(s"mh$i"))
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature → (doc_id, band, band_hash) rows. Docs agreeing
    * on ALL `rows` min-hashes of a band share its band_hash → candidate. */
  def lshBands(sig: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      val cols = (0 until rows).map(j => col(s"mh${b * rows + j}"))
      struct(lit(b).as("band"), xxhash64((lit(b) +: cols): _*).as("bh"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate pairs = docs colliding in ≥1 band. Bucket-equality
    * self-join on (band, band_hash) — never all-pairs. */
  def lshCandidates(sig: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame =
    candidatesFromBands(lshBands(sig, bands, rows))

  /** The [[lshCandidates]] self-join over an already-banded frame
    * ((doc_id, band, bh) — [[lshBands]] output / [[lshBandIndex]]). */
  def candidatesFromBands(banded: DataFrame): DataFrame =
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()

  /** Exact shingle-Jaccard for every doc pair sharing ≥1 shingle, kept at
    * `minJaccard`+. The join key is the shingle (bucket join). Output:
    * (id1, id2, jaccard) with id1 < id2, jaccard rounded 4dp. */
  def exactJaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame = {
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i") / (col("n1") + col("n2") - col("i"))
    inter
      .join(cnt.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(cnt.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .filter(jac >= minJaccard)
      .select(col("id1"), col("id2"), round(jac, 4).as("jaccard"))
  }

  /** ASYMMETRIC containment: C(id → in_id) = |S(id) ∩ S(in_id)| / |S(id)|
    * ≥ `minContainment` — the share of a doc's OWN shingles present in
    * the other doc. Catches what symmetric Jaccard structurally misses:
    * a short doc fully embedded in a long one (truncated reprint, quote
    * inside an article, chat excerpt in a scrape) scores C ≈ 1 while its
    * Jaccard ≈ |A|/|B| can be arbitrarily low. Directional — both
    * orientations are emitted when both clear the bar.
    *
    * Same bucket-join shape as [[exactJaccardPairs]]; with `maxDf` the
    * intersection runs over the CAPPED shingle set while |S(id)| stays
    * uncapped, so a capped containment only ever UNDER-scores (the dd9
    * discipline: bounded hot buckets, misses confined to docs whose
    * overlap is all stop-shingles). */
  def containmentPairs(sh: DataFrame, minContainment: Double,
                       maxDf: Option[Long] = None): DataFrame = {
    val capped = maxDf.map(capDocumentFrequency(sh, _)).getOrElse(sh)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_own"))
    val inter = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id"), col("b.doc_id").as("in_id"))
      .agg(count(lit(1)).as("i"))
    val c = col("i") / col("n_own")
    inter
      .join(cnt.select(col("doc_id").as("id"), col("n_own")), "id")
      .filter(c >= minContainment)
      .select(col("id"), col("in_id"), round(c, 4).as("containment"))
  }

  /** MinHash+LSH near-dup detection with exact verification: LSH candidates
    * → semi-join shingles down to candidate docs → exact Jaccard ≥ thr.
    * Recall with 16 bands × 4 rows: a pair at exactly J=0.8 is missed
    * with probability (1−0.8⁴)¹⁶ ≈ 2e-4; at J=0.9 (this corpus's planted
    * pairs) ≈ 4e-8. Deterministic hashes make any miss reproducible, not
    * flaky; raise `bands` if a corpus carries boundary-similarity pairs. */
  def minhashNearDup(docs: DataFrame, k: Int = 3, numPerm: Int = 64,
                     bands: Int = 16, rows: Int = 4, thr: Double = 0.8,
                     hashShingles: Boolean = false,
                     maxDf: Option[Long] = None): DataFrame = {
    val sh = if (hashShingles) hashedShingleDF(docs, k) else shingleDF(docs, k = k)
    minhashNearDupFromShingles(sh, numPerm, bands, rows, thr, maxDf)
  }

  /** [[minhashNearDup]] from an already-built (doc_id, shingle) substrate —
    * the seam DedupSpec uses to plant an exactly-ubiquitous stop-shingle
    * (text-level pollution would also perturb doc-specific boundary
    * shingles, making bit-parity unprovable). */
  def minhashNearDupFromShingles(sh: DataFrame, numPerm: Int = 64,
                                 bands: Int = 16, rows: Int = 4,
                                 thr: Double = 0.8,
                                 maxDf: Option[Long] = None): DataFrame = {
    require(numPerm >= bands * rows,
      s"numPerm ($numPerm) must cover bands*rows (${bands * rows}) — lshBands reads mh0..mh${bands * rows - 1}")
    // The substrate feeds signatures AND the 3-way verify join, so the
    // tokenize+shingle explode recomputes per consumer. For the LAZY
    // (oracle) path, persisting it was MEASURED SLOWER (dd2 5.1→6.2s,
    // llm1 5.1→14.8s at sf0.1): the cache is a materialization barrier
    // plus row serialization, while recompute is pipelined map-side work
    // that codegen fuses into each consumer. The CAPPED (production) path
    // flips that verdict: capping inserts a shuffle-bearing anti-join
    // into every recompute, so the capped substrate is materialized once
    // (localCheckpoint) and all consumers read the snapshot.
    val capped = maxDf.fold(sh)(m => checkpointSubstrate(capDocumentFrequency(sh, m)))
    minhashNearDupFromBands(capped,
      lshBands(minhashSignatures(capped, numPerm), bands, rows), thr)
  }

  /** [[minhashNearDupFromShingles]] with candidate generation from a
    * PREBUILT banded frame ([[lshBands]] output — typically a reused
    * [[lshBandIndex]]): when one query needs a corpus's internal pair
    * set AND its band index (dd8's yesterday-state shape), the wide
    * 64-hash signature aggregation — the dominant cost of the pipeline —
    * runs once for both consumers instead of once each. Caller contract:
    * `banded` was built from this same `sh` substrate (same cap
    * decisions), or candidates and verification silently disagree. */
  def minhashNearDupFromBands(sh: DataFrame, banded: DataFrame,
                              thr: Double = 0.8): DataFrame = {
    val cand = candidatesFromBands(banded)
    val candDocs = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    // The verify sliver is MATERIALIZED once (r18): exactJaccardPairs
    // scans its input three times (cnt + both self-join sides), and each
    // lazy scan re-runs the substrate pipeline (scan→tokenize→explode
    // [→cap]) plus the semi-join. The sliver is candidate-docs-only —
    // tiny at every scale by construction (candidates, not corpus) — so
    // the snapshot costs one substrate pass and O(candidates) storage
    // while removing two full substrate passes (measured at sf0.1:
    // neardup 2.9→2.1 s uncapped; the win compounds in every CC-fold
    // consumer). Unlike persisting the FULL substrate (measured slower —
    // see minhashNearDupFromShingles), this persists only the sliver.
    val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    exactJaccardPairs(shCand, thr)
  }

  /** Persisted shingle document-frequency table: (shingle, df) — the
    * df-cap companion a 100 TB pipeline stores NEXT TO its
    * [[lshBandIndex]]. An index capped against its OWN substrate and a
    * batch capped against ITS OWN substrate silently disagree on which
    * shingles are hot (a shingle can cross the cap between builds); both
    * must cap against the SAME persisted table, maintained incrementally
    * with [[mergeShingleDf]] as batches land. Same epoch's table on both
    * sides ⇒ identical cap decisions ⇒ self-consistent output. Parity
    * with a JOINT recompute (minhashNearDup over corpus ∪ batch, which
    * caps against the union's self-computed df) additionally requires
    * the shared table to EQUAL the union's own df table — i.e. the
    * batch's df contribution is merged in before capping (the DedupSpec
    * arrangement). A stale-epoch table still gives consistent cap
    * decisions, but a shingle crossing the cap in the unmerged batch
    * yields a different (still valid) pair set. */
  def shingleDfTable(sh: DataFrame): DataFrame =
    sh.groupBy("shingle").agg(count(lit(1)).as("df"))

  /** Incremental df-table maintenance: merge tables of DISJOINT doc
    * slices (counts add). One union + one hash agg over table rows —
    * vocabulary cardinality, not corpus cardinality. Bit-identical to
    * recomputing [[shingleDfTable]] over the union of the slices. */
  def mergeShingleDf(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "mergeShingleDf needs at least one df table")
    tables.reduce(_.unionByName(_))
      .groupBy("shingle").agg(sum("df").as("df"))
  }

  /** [[capDocumentFrequency]] against an EXTERNAL persisted df table
    * instead of the substrate's own counts — the form every incremental
    * consumer must use (see [[shingleDfTable]]). Join strategy left to
    * the planner, same rationale as [[capDocumentFrequency]]. */
  def capWithDfTable(sh: DataFrame, dfTable: DataFrame, maxDf: Long): DataFrame = {
    val hot = dfTable.filter(col("df") > maxDf).select("shingle")
    sh.join(hot, Seq("shingle"), "left_anti")
      .select(sh.columns.map(col).toIndexedSeq: _*)
  }

  /** Persisted LSH band index of a corpus: (doc_id, band, bh). The
    * artifact a 100 TB pipeline stores NEXT TO the archive so daily
    * increments never re-shingle it — the index is ~bands rows of 20
    * bytes per document regardless of document size, and
    * [[incrementalNearDup]] joins new batches against it directly.
    * Deterministic (xxhash64 end to end): rebuilding any index shard
    * reproduces it bit-for-bit. */
  def lshBandIndex(docs: DataFrame, k: Int = 3, numPerm: Int = 64,
                   bands: Int = 16, rows: Int = 4,
                   maxDf: Option[Long] = None): DataFrame = {
    val sh = shingleDF(docs, k = k)
    val capped = maxDf.fold(sh)(m => capDocumentFrequency(sh, m))
    lshBands(minhashSignatures(capped, numPerm), bands, rows)
  }

  /** [[lshBandIndex]] capped against a persisted [[shingleDfTable]] —
    * the production index-build form: the SAME table later caps each
    * incoming batch ([[incrementalNearDupCapped]]), so index and batch
    * never disagree on which shingles are hot. */
  def lshBandIndexCapped(docs: DataFrame, dfTable: DataFrame, maxDf: Long,
                         k: Int = 3, numPerm: Int = 64,
                         bands: Int = 16, rows: Int = 4): DataFrame =
    lshBands(minhashSignatures(
      capWithDfTable(shingleDF(docs, k = k), dfTable, maxDf), numPerm), bands, rows)

  /** Incremental near-dup: a NEW batch against a corpus via its persisted
    * [[lshBandIndex]] — the daily-increment shape at 100 TB, where
    * re-running [[minhashNearDup]] over archive ∪ batch would re-shingle
    * and re-sign the entire archive to dedup 0.1% new data.
    *
    * Work scales with the BATCH plus its collisions, never the archive:
    *  - only the new batch is shingled and signed;
    *  - candidates = new bands ⋈ index (bucket join) + within-batch
    *    self-join;
    *  - the archive text is touched ONLY for candidate docs (semi-join
    *    before re-shingling), so exact-Jaccard verification reads a
    *    candidate-sized sliver of the corpus;
    *  - corpus⋈corpus collisions that surface in candidate buckets are
    *    dropped — the archive's internal pairs are the full run's
    *    business, not the increment's.
    *
    * Output = [[minhashNearDup]] over corpus ∪ batch RESTRICTED to pairs
    * involving a new doc, bit-for-bit (banding is per-doc deterministic,
    * so joint vs incremental banding yields identical candidates —
    * pinned in DedupSpec). Caller contract: batch doc_ids are disjoint
    * from corpus doc_ids, and `index` was built with the same
    * k/numPerm/bands/rows. At production scale the df-cap composes via
    * the persisted [[shingleDfTable]]: build the index with
    * [[lshBandIndexCapped]], maintain the table with [[mergeShingleDf]],
    * and run batches through [[incrementalNearDupCapped]] — same table ⇒
    * same cap decisions ⇒ this same parity argument (pinned in
    * DedupSpec's capped bit-parity case). */
  def incrementalNearDup(newDocs: DataFrame, corpus: DataFrame, index: DataFrame,
                         k: Int = 3, numPerm: Int = 64,
                         bands: Int = 16, rows: Int = 4,
                         thr: Double = 0.8): DataFrame =
    incrementalNearDupWithCap(newDocs, corpus, index, identity,
      k, numPerm, bands, rows, thr)

  /** [[incrementalNearDup]] SERVED entirely from persisted artifacts: the
    * corpus side is its stored [[shingleDF]] substrate (doc_id, shingle —
    * the table a deployment writes next to the band index), so the timed
    * increment NEVER touches archive text — candidate verification
    * semi-joins the candidate id sliver against the shingle parquet
    * instead of re-shingling candidate documents. Output is bit-identical
    * to [[incrementalNearDup]] ([[shingleDF]] is deterministic, pinned in
    * DedupSpec); the difference is purely where the verify substrate
    * comes from: recompute-from-text vs read-from-state. Caller contract
    * as [[incrementalNearDup]], plus `corpusShingles` was built with the
    * same k. */
  def incrementalNearDupServed(newDocs: DataFrame, corpusShingles: DataFrame,
                               index: DataFrame,
                               k: Int = 3, numPerm: Int = 64,
                               bands: Int = 16, rows: Int = 4,
                               thr: Double = 0.8): DataFrame =
    incrementalNearDupCore(newDocs, index,
      candIds => corpusShingles.join(candIds, Seq("doc_id"), "left_semi"),
      identity, k, numPerm, bands, rows, thr)

  /** [[incrementalNearDup]] with every shingle substrate (batch AND the
    * candidate slice of the archive) capped against the SAME persisted
    * [[shingleDfTable]] the index was built with. The capped batch
    * substrate is materialized once — capping inserts a shuffle-bearing
    * anti-join into each recompute (the minhashNearDupFromShingles
    * tradeoff). */
  def incrementalNearDupCapped(newDocs: DataFrame, corpus: DataFrame,
                               index: DataFrame, dfTable: DataFrame, maxDf: Long,
                               k: Int = 3, numPerm: Int = 64,
                               bands: Int = 16, rows: Int = 4,
                               thr: Double = 0.8): DataFrame =
    incrementalNearDupWithCap(newDocs, corpus, index,
      sh => checkpointSubstrate(capWithDfTable(sh, dfTable, maxDf)),
      k, numPerm, bands, rows, thr)

  private def incrementalNearDupWithCap(newDocs: DataFrame, corpus: DataFrame,
                                        index: DataFrame,
                                        cap: DataFrame => DataFrame,
                                        k: Int, numPerm: Int,
                                        bands: Int, rows: Int,
                                        thr: Double): DataFrame =
    incrementalNearDupCore(newDocs, index,
      candIds => cap(shingleDF(corpus.join(candIds, Seq("doc_id"), "left_semi"), k = k)),
      cap, k, numPerm, bands, rows, thr)

  /** Shared increment plan: `corpusCandShOf` supplies the corpus-side
    * verify substrate for a given candidate-id sliver — recomputed from
    * text ([[incrementalNearDup]]) or read from the persisted shingle
    * artifact ([[incrementalNearDupServed]]). */
  private def incrementalNearDupCore(newDocs: DataFrame, index: DataFrame,
                                     corpusCandShOf: DataFrame => DataFrame,
                                     cap: DataFrame => DataFrame,
                                     k: Int, numPerm: Int,
                                     bands: Int, rows: Int,
                                     thr: Double): DataFrame = {
    // batch substrate feeds signatures AND verify — same lazy-recompute
    // tradeoff as minhashNearDupFromShingles' uncapped path
    val newSh = cap(shingleDF(newDocs, k = k))
    val newBands = lshBands(minhashSignatures(newSh, numPerm), bands, rows)
    // cross candidates: batch bands probe the index buckets
    val cross = newBands.as("x").join(index.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("id1"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("id2"))
    val within = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
    val cand = cross.union(within).distinct()
    // verify substrate: batch shingles + shingles of ONLY the candidate
    // slice of the corpus (this semi-join is what keeps the archive scan
    // candidate-sized)
    val candIds = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    // Verify sliver materialized once (same rationale as
    // minhashNearDupFromBands): exactJaccardPairs scans its input 3×, and
    // here each lazy scan re-reads the ARCHIVE for the corpus-candidate
    // slice plus re-shingles the batch. The union is candidate-sized.
    val pairs = exactJaccardPairs(
      corpusCandShOf(candIds)
        .union(newSh.join(candIds, Seq("doc_id"), "left_semi"))
        .localCheckpoint(), thr)
    // keep pairs that involve a new doc; marker joins (not two semi-join
    // branches) so the pair frame is computed once. Join strategy left to
    // the planner: the aggregated id set is usually broadcast-sized, but
    // a forced broadcast would cap batch size for no reason.
    val newIds = newDocs.select(col("doc_id"))
    pairs
      .join(newIds.select(col("doc_id").as("id1"), lit(true).as("__n1")), Seq("id1"), "left")
      .join(newIds.select(col("doc_id").as("id2"), lit(true).as("__n2")), Seq("id2"), "left")
      .filter(col("__n1").isNotNull || col("__n2").isNotNull)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Prefix-filtered exact Jaccard join (PPJoin-style): under a single
    * global shingle order (ascending document frequency — rarest first),
    * any pair with J ≥ thr MUST share a shingle within each doc's first
    * ⌊(1−thr)·|d|⌋+1 shingles, so only those prefixes are indexed for
    * candidate generation — the candidate join touches the rare end of
    * the frequency distribution instead of every hot shingle. Recall is
    * 1 by the prefix-filter theorem, and candidates are then verified
    * with the full exact Jaccard, so the output equals
    * [[exactJaccardPairs]] bit-for-bit (pinned in DedupSpec). */
  def prefixFilteredJaccardPairs(docs: DataFrame, k: Int = 3,
                                 thr: Double = 0.8,
                                 maxDf: Option[Long] = None): DataFrame = {
    val shAll = shingleDF(docs, k = k)
    // ~6 consumers here (df table, sizes, prefix index, semi-join, 3-way
    // verify) — capped production runs materialize the substrate once;
    // the uncapped lazy path keeps pipelined recompute (see
    // minhashNearDupFromShingles for the measured tradeoff)
    val sh = maxDf.fold(shAll)(m => checkpointSubstrate(capDocumentFrequency(shAll, m)))
    val docFreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    // rank + doc size in ONE window pass: both functions partition by
    // doc_id, so Spark serves them from a single shuffle+sort (a separate
    // groupBy-sizes + join would add a second doc_id shuffle)
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("shingle"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val prefixes = sh.join(docFreq, "shingle")
      .select(col("doc_id"), col("shingle"),
        row_number().over(wOrd).as("r"), count(lit(1)).over(wAll).as("n"))
      .filter(col("r") <= floor((lit(1.0) - thr) * col("n")) + 1)
      .select("doc_id", "shingle", "n")
    // PPJoin length filter: J ≥ t ⇒ |A∩B| ≤ min(n_a,n_b) and
    // J = i/(n_a+n_b−i) ≥ t ⇒ min ≥ t·max — prune size-mismatched pairs
    // at candidate time, before the distinct and the verify join.
    val cand = prefixes.as("x").join(prefixes.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id") &&
          col("x.n") >= col("y.n") * thr && col("y.n") >= col("x.n") * thr)
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    val candDocs = cand.select(col("id1").as("doc_id"))
      .union(cand.select(col("id2").as("doc_id"))).distinct()
    // verify sliver materialized once — see minhashNearDupFromBands
    exactJaccardPairs(
      sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi").localCheckpoint(), thr)
  }

  /** Connected components over a near-dup pair graph: every doc that
    * appears in some pair gets the MINIMUM doc_id reachable from it as
    * its cluster id — the transitive closure a real dedup needs (greedy
    * per-pair dropping over-keeps whenever two docs are linked only
    * through a common neighbor).
    *
    * Algorithm: ALTERNATING LARGE-STAR / SMALL-STAR contraction (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
    * in MapReduce and Beyond", SoCC'14). Each round rewires edges toward
    * neighborhood minima (large-star attaches every larger neighbor to
    * the local min; small-star attaches the smaller neighbors and self);
    * the edge set converges to a star forest whose centers are the
    * component minima in O(log² n) rounds on ANY graph (the proven bound
    * for the Alternating variant; Kiveris et al. prove O(log n) only for
    * Two-Phase, and empirically Alternating behaves ~log n) — unlike
    * plain min-label propagation, whose O(diameter) rounds abort on long
    * path-shaped components (incremental-version chains are exactly
    * that shape at corpus scale). Each round is two groupBy+join passes
    * over the EDGE LIST (orders of magnitude smaller than the corpus),
    * localCheckpoint'd so lineage stays flat; convergence is edge-set
    * stability (count + anti-join — per-round driver scalars, never a
    * data collect). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 64): DataFrame =
    connectedComponentsWithRounds(pairs, maxIters)._1

  /** [[connectedComponents]] exposing the number of contraction rounds
    * actually run — the seam DedupSpec uses to pin the O(log n) bound
    * on a long-chain graph. */
  def connectedComponentsWithRounds(pairs: DataFrame,
                                    maxIters: Int = 64): (DataFrame, Int) = {
    require(maxIters > 0, s"maxIters must be positive, got $maxIters")
    // Materialize the pair pipeline ONCE: both `edges` and `nodes` (and
    // through `nodes`, every re-evaluation of the returned label frame —
    // updateClusters joins it four times) otherwise re-run the upstream
    // candidate-generation pipeline per subtree. The pair set is a
    // sliver, and this function already materializes eagerly per round,
    // so the checkpoint changes cost shape, not laziness class.
    val p = pairs.localCheckpoint()
    // canonical undirected edges: (hi, lo) with hi > lo, deduped
    var edges = p
      .select(greatest(col("id1"), col("id2")).as("hi"),
        least(col("id1"), col("id2")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    val nodes = p.select(col("id1").as("doc_id"))
      .union(p.select(col("id2").as("doc_id"))).distinct()
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIters) {
      // ONE materializing job per round (r18 — previously three: the
      // next-edge checkpoint, a count, and an anti-join; the rounds are
      // job-overhead-bound on sliver graphs). The tagged union of the
      // round's RAW output (smallStar no longer distincts — duplicates
      // are multiplicity-noise the groupBy absorbs) with the previous
      // canonical set is grouped by edge: that one exchange
      // simultaneously (a) canonicalizes the round output, and (b)
      // decides exact set equality — a (hi, lo) group whose tags are
      // one-sided exists on only one side, so the sets are equal iff no
      // such group exists. The next round's edge set is a cheap filter
      // over the checkpointed comparison frame.
      val cmp = smallStar(largeStar(edges))
        .select(col("hi"), col("lo"), lit(1).as("__s"))
        .unionByName(edges.select(col("hi"), col("lo"), lit(2).as("__s")))
        .groupBy("hi", "lo").agg(min("__s").as("__mn"), max("__s").as("__mx"))
        .localCheckpoint()
      converged = cmp.filter(col("__mn") === col("__mx")).isEmpty
      edges = cmp.filter(col("__mn") === 1).select("hi", "lo")
      i += 1
    }
    // maxIters is a pure backstop now: the proven bound is O(log² n)
    // (Alternating), but measured behavior is ~log n (a 1000-node path
    // converges in 11 rounds — pinned in DedupSpec), so 64 rounds is
    // ample for any real component — hitting it means a bug, not a long
    // chain, so still fail loudly over silent wrong labels
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — edge set is not contracting")
    // fixed point is a star forest: child → component-min root. Roots
    // appear only on the lo side; every node keeps its own id if no
    // parent edge exists (= it is the component min).
    val roots = edges.groupBy(col("hi").as("doc_id")).agg(min("lo").as("root"))
    val labels = nodes.join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster"))
    (labels, i)
  }

  /** Incremental connected-components maintenance: fold a NEW batch's
    * pair edges into a PERSISTED label table ([[connectedComponents]]
    * output — doc_id → component-min cluster) without recomputing CC
    * over the full pair graph — the cluster-resolution step of the
    * incremental-dedup story ([[incrementalNearDup]] emits the pairs;
    * this maintains the clusters).
    *
    * Contraction argument: every existing component is connected, so
    * replacing each new edge's endpoints by their current cluster
    * representative (identity for docs not yet in the table) preserves
    * the component structure of old ∪ new. CC therefore only runs on the
    * CONTRACTED graph — one node per touched component or new doc,
    * |newPairs| edges — and its output relabels whole components by
    * representative. Output == [[connectedComponents]] over the full
    * grown pair set, bit for bit, and the update composes across
    * successive batches (both pinned in DedupSpec).
    *
    * Scale shape: two key-equality joins of the batch-sized pair set
    * against the label table (AQE broadcasts the pair sliver), CC on a
    * batch-sized graph, then ONE scan of the label table joined against
    * the relabel sliver. Work ∝ batch + one label-table pass — never the
    * historical pair graph. */
  def updateClusters(labels: DataFrame, newPairs: DataFrame,
                     maxIters: Int = 64): DataFrame = {
    val delta = contractedCC(labels, newPairs, maxIters)
    // relabel every member of a moved component via its representative
    val moved = delta.select(col("doc_id").as("cluster"), col("cluster").as("__newc"))
    val updated = labels.join(moved, Seq("cluster"), "left")
      .select(col("doc_id"), coalesce(col("__newc"), col("cluster")).as("cluster"))
    // docs the delta graph introduced (new docs, or previously isolated
    // ones first clustered by this batch) — reps themselves are already
    // in the table (a component min is one of its members)
    val introduced = delta.join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
    updated.unionByName(introduced)
  }

  /** The CHANGED-ROWS form of [[updateClusters]]: only the label rows the
    * batch's pairs actually touch — members of components whose
    * representative moved, plus docs the batch introduces. Applying these
    * as upserts over the previous table
    * ([[graft.ops.Merge.applyChangeLog]] / [[graft.io.Versioned.writeDelta]])
    * reproduces [[updateClusters]] exactly (pinned in DedupSpec), which
    * makes the persisted label artifact delta-sized per epoch: rows
    * written ∝ touched components + batch, never the label table. */
  def updateClustersDelta(labels: DataFrame, newPairs: DataFrame,
                          maxIters: Int = 64): DataFrame = {
    val delta = contractedCC(labels, newPairs, maxIters)
    val moved = delta.select(col("doc_id").as("cluster"), col("cluster").as("__newc"))
    val changed = labels.join(moved, Seq("cluster"), "inner")
      .filter(col("__newc") =!= col("cluster"))
      .select(col("doc_id"), col("__newc").as("cluster"))
    val introduced = delta.join(labels.select("doc_id"), Seq("doc_id"), "left_anti")
    changed.unionByName(introduced)
  }

  /** Shared core of [[updateClusters]]/[[updateClustersDelta]]: CC over
    * the representative-contracted batch graph — one node per touched
    * component or new doc, |newPairs| edges. */
  private def contractedCC(labels: DataFrame, newPairs: DataFrame,
                           maxIters: Int): DataFrame = {
    val contracted = newPairs
      .join(labels.select(col("doc_id").as("id1"), col("cluster").as("__r1")),
        Seq("id1"), "left")
      .join(labels.select(col("doc_id").as("id2"), col("cluster").as("__r2")),
        Seq("id2"), "left")
      .select(coalesce(col("__r1"), col("id1")).as("id1"),
        coalesce(col("__r2"), col("id2")).as("id2"))
    // batch-sized CC, localCheckpoint'd inside CC already
    connectedComponents(contracted, maxIters)
  }

  /** Large-star: for each node u, attach every STRICTLY LARGER neighbor
    * to min(Γ(u) ∪ {u}). Components are preserved; tall trees flatten
    * geometrically. Input: canonical (hi, lo) edge set. Output MAY carry
    * duplicates (r18: the explicit distinct was a whole exchange per
    * round, and the only consumer — [[smallStar]] — is duplicate-safe:
    * its min-aggregation ignores multiplicity and its own final distinct
    * canonicalizes the round's output, which is what the convergence
    * check compares). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
      .union(edges.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    // v > u ≥ m ⇒ (v, m) is already canonical and never a self-loop
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
  }

  /** Small-star: for each node u, attach its SMALLER-OR-EQUAL neighbors
    * (and u itself) to min(smaller neighbors). Canonical (hi, lo) edges
    * already orient every edge large→small, so u's smaller neighborhood
    * is exactly its lo side. Duplicate-tolerant on both sides (r18): the
    * input may carry [[largeStar]]'s duplicates (min-agg ignores
    * multiplicity) and the output is NOT distinct'd here — the round
    * loop's tagged-union groupBy canonicalizes it in the same exchange
    * that decides convergence. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy("hi").agg(min("lo").as("m")) // m < hi
    val joined = edges.join(mins, "hi")
    joined.filter(col("lo") =!= col("m"))
      .select(col("lo").as("hi"), col("m").as("lo")) // lo > m by minimality
      .union(mins.select(col("hi"), col("m").as("lo")))
  }

  /** 64-bit SimHash over term-frequency-weighted whitespace tokens: bit b
    * of the signature is the sign of Σ_tokens (±1 per token depending on
    * bit b of xxhash64(token)). One wide conditional aggregation. */
  /** Engine-portable 60-bit word hash: the first 15 hex chars of md5,
    * decoded to a long — the o8/o3b/o7 discipline applied to SimHash, so
    * signatures (and the near-dup pair set) replay identically in any
    * engine with md5 (DuckDB: `CAST('0x' || substr(md5(w),1,15) AS
    * BIGINT)`). Bits 60–63 of the signature are then always 0 on both
    * sides; the 4×16 banding's pigeonhole argument is unaffected. */
  def portableWordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text",
              wordHash: Column => Column = xxhash64(_)): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("w"))
      .select(col("doc_id"), wordHash(col("w")).as("h"))
    val sums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (0 until 64).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    words.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * chunks (pigeonhole: hamming ≤ 3 ⇒ at least one identical chunk),
    * bucket-join on chunks, verify with exact popcount of the XOR. */
  def simhashNearDup(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val banded = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
