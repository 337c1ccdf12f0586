package graft.harness

import graft.Tables
import graft.ops.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north-star ops):
  * brute-force cosine top-k as the correctness baseline, with
  * `VectorOps.blockedPairs` as the bucketed scale path (exercised by
  * `dedup_embedding`). Cosine arithmetic is a left-to-right double
  * fold, bit-identical to DuckDB's list_cosine_similarity.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ANN baseline: 50 query vectors against the full corpus, top-5
    // by (rounded cosine desc, vec_id) — the query side is broadcast,
    // the corpus streams, so the plan scales with corpus size only.
    "ann_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      VectorOps.bruteForceTopK(q, emb, "qid", "vec_id", "qe", "embedding", 5)
        .select("qid", "vec_id", "sim", "rk")
    })
  )

  val oracle: Map[String, String] = Map(
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                    WHERE vec_id < 50),
          s AS (SELECT qid, vec_id,
                       round(list_cosine_similarity(qe::DOUBLE[],
                                                    embedding::DOUBLE[]), 6) AS sim
                FROM q, embeddings WHERE vec_id <> qid)
          SELECT qid, vec_id, sim, rk
          FROM (SELECT *, row_number() OVER (PARTITION BY qid
                  ORDER BY sim DESC, vec_id) AS rk FROM s)
          WHERE rk <= 5"""
  )
}
