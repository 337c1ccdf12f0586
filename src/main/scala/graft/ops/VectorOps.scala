package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives (ANN / near-dup, north-star ops).
  *
  * All arithmetic is element-wise double with a left-to-right fold, so
  * the result is bit-identical to any engine that evaluates the same
  * IEEE-754 sequence (DuckDB's list_cosine_similarity over DOUBLE[]).
  * Higher-order functions stay inside codegen; no UDFs.
  */
object VectorOps {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query row (small side, broadcast)
    * against the full corpus — the correctness baseline. Scale path:
    * block the corpus (e.g. coarse quantization / LSH buckets) so each
    * query only meets its bucket, then apply the same ranking; see
    * `blockedPairs`.
    *
    * Similarity is rounded to 6 dp *before* ranking and tie-broken by
    * corpus id, so the top-k set is stable across engines.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                     cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("sim",
        round(cosine(asDouble(col(qVec)), asDouble(col(cVec))), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Blocked all-pairs similarity: equi-join on a blocking key (label,
    * LSH bucket, coarse centroid id) turns the quadratic cross join
    * into a per-block join — the shape that survives 100 TB. Pairs are
    * emitted once (leftId < rightId).
    */
  def blockedPairs(df: DataFrame, id: String, vec: String, block: String): DataFrame = {
    val a = df.select(col(block), col(id).as("ida"), col(vec).as("va"))
    val b = df.select(col(block).as("__blk"), col(id).as("idb"), col(vec).as("vb"))
    a.join(b, a(block) === b("__blk") && col("ida") < col("idb"))
      .withColumn("sim", round(cosine(asDouble(col("va")), asDouble(col("vb"))), 6))
      .drop("__blk", "va", "vb")
  }
}
