package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the train/test hygiene pass every LLM
  * training pipeline runs before packaging shards: flag (or drop) training
  * documents that share long word n-grams with a benchmark/eval set, so
  * measured eval performance isn't memorization of leaked test items
  * (the GPT-3 appendix-C / PaLM / Llama decontamination procedure).
  *
  * Scale shape: the eval set is benchmark-sized (thousands of docs, MBs) —
  * its shingle set is exploded and BROADCAST; the 100 TB train side is
  * scanned once, shingled map-side, and hash-joined against the broadcast
  * with zero shuffle of train data. The per-doc aggregation shuffles only
  * (doc_id, shingle-hit) pairs — the contaminated sliver, not the corpus.
  * k defaults higher than near-dup shingling (5 here, 8–13 in production)
  * because decontamination wants high-precision exact overlap, not
  * fuzzy similarity.
  */
object Decontam {

  /** One contamination plan, parameterized by the shingle builder so the
    * string (oracle) and hashed (production) forms cannot drift apart —
    * DecontamSpec pins their parity. */
  private def contaminationFrom(shingle: DataFrame => DataFrame)(
      train: DataFrame, evalSet: DataFrame): DataFrame = {
    val trainSh = shingle(train)
    val evalSh = shingle(evalSet).withColumnRenamed("doc_id", "eval_id")
    trainSh
      .join(broadcast(evalSh), Seq("shingle"))
      // plan note: the two-distinct aggregate becomes Catalyst's
      // RewriteDistinctAggregates shape — Expand (2× the hit sliver)
      // capped by a pure-dedup partial aggregate that absorbs the
      // replication map-side before any shuffle. No single-pass
      // sliver-first alternative exists for two distinct dimensions (an
      // explicit pre-distinct is absorbed by the optimizer — verified);
      // PlanGuard's expand-over-fact rule exempts exactly this capped
      // shape, and the hit triples are already repeat-free because
      // shinglesFromTokens dedupes per doc (array_distinct).
      .groupBy("doc_id")
      .agg(
        countDistinct(col("eval_id")).as("n_eval_docs"),
        countDistinct(col("shingle")).as("n_shared_shingles"))
  }

  /** Per-train-doc contamination report: how many distinct eval docs and
    * distinct k-gram shingles it shares with the eval set. Only
    * contaminated docs appear (inner join); survivors = anti-join on the
    * result. Strings are joined for oracle parity; [[contaminationHashed]]
    * is the 8-byte production form. */
  def contamination(train: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame =
    contaminationFrom(Dedup.shingleDF(_, k = k))(train, evalSet)

  /** Production form: shingles collapse to xxhash64 before the broadcast
    * join, so the hash table holds 8-byte keys instead of k-word strings
    * and the probe never materializes shingle text. A collision can only
    * ADD a spurious shared-shingle (2⁻⁶⁴ per pair) — decontamination is
    * deliberately recall-biased, so that failure mode is the safe one. */
  def contaminationHashed(train: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame =
    contaminationFrom(Dedup.hashedShingleDF(_, k = k))(train, evalSet)

  /** The clean corpus: train docs with NO k-gram overlap with the eval
    * set — broadcast anti-join against the contaminated id set.
    *
    * Scan shape: `train` is consumed TWICE — once by the shingle probe
    * inside [[contaminationHashed]] and once as the anti-join's left side.
    * The contaminated id set (a sliver) is localCheckpoint'd LAZILY
    * (eager = false): constructing this plan stays free — no Spark job
    * until the caller executes — and on first execution the probe job
    * runs exactly once and its sliver is pinned for every subsequent
    * consumer. The second train scan is inherent to emit survivors.
    * Callers whose train frame is DERIVED (not a raw parquet scan)
    * should pass a pre-checkpointed frame so the upstream work isn't
    * recomputed — exactly llm4 shardBuild's localCheckpoint discipline. */
  def decontaminated(train: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame =
    train.join(
      broadcast(
        contaminationHashed(train, evalSet, k).select("doc_id")
          .localCheckpoint(eager = false)),
      Seq("doc_id"), "left_anti")

  /** Stream-safe flag form: just the contaminated doc ids. The count
    * aggregates in [[contamination]] need `countDistinct` (unsupported
    * over streams); this shape is explode → broadcast-join → per-doc
    * dropDuplicates — legal in a Structured Streaming append query, so an
    * INGEST stream can flag leaked docs on arrival against the same
    * broadcast eval index (batch == stream pinned in StreamingSpec). */
  def contaminatedIds(train: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame = {
    val evalSh = Dedup.hashedShingleDF(evalSet, k = k)
      .select("shingle").distinct()
    Dedup.hashedShingleDF(train, k = k)
      .join(broadcast(evalSh), Seq("shingle"))
      .select("doc_id")
      .dropDuplicates("doc_id")
  }

  /** EVAL-side burn report — the mirror of [[contamination]]: per eval
    * doc, how much of ITS OWN k-gram content exists anywhere in train
    * (n_grams_own, n_shared, burn share in integer ppm). [[contamination]]
    * answers "which train docs to drop"; this answers the question the
    * benchmark owner asks — "which eval items are already memorizable and
    * by how much", including the clean zero-burn rows (a left join, so
    * every eval doc appears — an eval score is only trustworthy with the
    * whole column visible). Same scale shape as the forward report: eval
    * shingles broadcast, train scanned once map-side, only the distinct
    * (eval_id, shingle) HIT sliver ever shuffles — the train side is
    * never globally deduplicated. */
  def evalBurn(train: DataFrame, evalSet: DataFrame, k: Int = 5): DataFrame = {
    val evalSh = Dedup.shingleDF(evalSet, k = k).withColumnRenamed("doc_id", "eval_id")
    val hits = Dedup.shingleDF(train, k = k)
      .join(broadcast(evalSh), Seq("shingle"))
      .select("eval_id", "shingle").distinct()
      .groupBy("eval_id").agg(count(lit(1)).as("n_shared"))
    evalSh.groupBy("eval_id").agg(count(lit(1)).as("n_grams_own"))
      .join(hits, Seq("eval_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("burn_ppm", expr("n_shared * 1000000 div n_grams_own"))
  }
}
