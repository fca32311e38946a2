package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.QuerySpec.{rowsOnly, sql}
import graft.model.Tables
import graft.ops.Multimodal

/** Multimodal plumbing over a media table derived deterministically from
  * `documents` (payload = utf-8 bytes, kind cycles by id — see
  * Multimodal.mediaFromDocuments). mm1 proves opaque binary columns flow
  * through the relational surface (oracle on byte lengths); mm2 runs the
  * partition-batched decode stub.
  */
object MultimodalQueries {

  val all: Seq[QuerySpec] = Seq(

    sql("mm1_payload_stats",
      "Multimodal: per-kind counts + byte volumes over opaque binary payloads (no decode)",
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | COUNT(*) AS n_items,
        | CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | ROUND(AVG(octet_length(encode(text))), 4) AS avg_bytes
        | FROM documents GROUP BY 1 ORDER BY kind""".stripMargin.replace("\n", "")) {
      (s, d) =>
        Multimodal.payloadStats(
          Multimodal.mediaFromDocuments(Tables.documents(s, d)))
          .orderBy("kind")
    },

    rowsOnly("mm2_decode_features",
      "Multimodal: partition-batched decode (mapPartitions; deterministic stub) → typed feature rows") {
      (s, d) =>
        Multimodal.decodeFeatures(
          Multimodal.asMedia(
            Multimodal.mediaFromDocuments(Tables.documents(s, d))))
          .toDF()
          .orderBy("media_id")
    }
  )
}
