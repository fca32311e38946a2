package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.VectorIndex
import graft.streaming.StreamingStats

/** The right-to-be-forgotten CASCADE, composed: one erasure request
  * (doc ids) propagates through every persisted artifact class the
  * engine maintains —
  *
  *  1. the maintained STATE FAMILIES ([[StreamingStats.forget]]):
  *     retractable states subtract, bottom-k states rebuild their dirty
  *     keys, and the irreversible bloom/hll sketches rebuild from the
  *     surviving corpus — without this leg a forgotten id keeps
  *     answering `maybe_member = true` from the bloom state and keeps
  *     counting in every estimate (a membership leak, the round-9 gap);
  *  2. the INGEST ARTIFACTS ([[IncrementalIngest.forget]]): archive
  *     files (manifest-pruned rewrite), shingle-df table (delta
  *     subtraction), cluster labels (sliver recompute), LSH band index;
  *  3. the VECTOR INDEX ([[VectorIndex.forget]]): affected partitions
  *     rewritten, emptied ones cleared.
  *
  * Ordering: the state leg runs FIRST, while the pre-rewrite archive
  * still serves the survivor scan (the survivor ROWS are identical
  * before and after the archive rewrite — the anti-join defines them —
  * but the files backing the lazy frame are not, so the scan must
  * complete before leg 2 swaps them). Each leg is itself idempotent, so
  * a crash between legs is repaired by re-running the cascade with the
  * same ids.
  *
  * The reference has no erasure story at all (batch rewrites only,
  * ref:src/main.py:88-309); at 100 TB "re-run the pipeline without the
  * user" is exactly the non-answer this cascade exists to avoid. */
object Gdpr {

  /** What each leg reported; a leg is None when not configured. */
  final case class CascadeResult(
      ingest: Option[IncrementalIngest.ForgetResult],
      statsEpoch: Option[Long],
      vectorIndexTouched: Boolean)

  /** Run the cascade for `forgetIds` (column `doc_id`).
    *
    * @param ingestRoot  [[IncrementalIngest]] state root (archive +
    *                    dedup artifacts). Required when `stats` is set —
    *                    the archive is the system of record the state
    *                    leg derives its forgotten/survivor slices from.
    * @param stats       the maintained state to erase from: its config
    *                    plus the row-prep function that turned archive
    *                    rows into the columns the state was fed with
    *                    (identity when the state consumed raw doc rows).
    * @param vectorRoot  [[VectorIndex]] root; the forgotten doc ids are
    *                    the vector ids (the composed-pipeline contract —
    *                    embeddings are keyed by the document they embed).
    */
  def cascade(spark: SparkSession, forgetIds: DataFrame,
              ingestRoot: Option[String] = None,
              stats: Option[(StreamingStats.Config, DataFrame => DataFrame)] = None,
              vectorRoot: Option[String] = None): CascadeResult = {
    val ids = forgetIds.select("doc_id").distinct().localCheckpoint()

    val statsEpoch = stats.map { case (cfg, prepare) =>
      require(ingestRoot.isDefined,
        "the stats leg derives its slices from the archive — pass ingestRoot")
      val archive = spark.read.parquet(
        IncrementalIngest.StatePaths(ingestRoot.get).archive)
      StreamingStats.forget(spark, cfg,
        forgotten = prepare(archive.join(ids, Seq("doc_id"), "left_semi")),
        survivors = prepare(archive.join(ids, Seq("doc_id"), "left_anti")))
    }

    val ingestRes = ingestRoot.map(r => IncrementalIngest.forget(spark, ids, r))

    val vecTouched = vectorRoot.exists { r =>
      VectorIndex.forget(spark, ids.withColumnRenamed("doc_id", "vec_id"), r)
      true
    }

    CascadeResult(ingestRes, statsEpoch, vecTouched)
  }
}
