package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity primitives (ANN / near-dup, north-star ops).
  *
  * All arithmetic is element-wise double with an ascending-index
  * single-accumulator loop, so the result is bit-identical to any
  * engine that evaluates the same IEEE-754 sequence (DuckDB's
  * list_cosine_similarity over DOUBLE[]).
  *
  * The dot product is the native codegen expression
  * `graft.functions.ArrayDot` (registered by GraftExtensions); norms
  * are computed ONCE per input row before any join — never inside the
  * pair loop — which is what makes the all-pairs/top-k shapes hold up
  * at scale.
  */
object VectorOps {

  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column = call_function("array_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 random-hyperplane components, derived from md5
    * so the identical constants are embeddable in DuckDB oracle SQL
    * (no shared RNG needed). Shared by the ANN queries and the
    * embedding near-dup blocking.
    */
  def planeSign(p: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p:$i".getBytes("UTF-8"))
    if ((d(0) & 1) == 1) 1.0 else -1.0
  }

  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(p => (0 until dim).map(i => planeSign(p, i)))

  /** Sign-bit LSH bucket key of a DOUBLE vector column: one '0'/'1'
    * character per hyperplane. Bucket population halves per plane (in
    * expectation), so plane count is the knob that keeps bucket sizes
    * bounded as the corpus grows.
    */
  def lshBucket(vecDouble: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { pl =>
      val plane = array(pl.map(lit): _*)
      when(dot(vecDouble, plane) >= 0, "1").otherwise("0")
    }: _*)

  /** Brute-force cosine top-k: every query row (small side, broadcast)
    * against the full corpus — the correctness baseline. Scale path:
    * block the corpus (e.g. coarse quantization / LSH buckets) so each
    * query only meets its bucket, then apply the same ranking; see
    * `blockedPairs` and the LSH bucketing in VectorQueries.
    *
    * Vectors are cast to double and norms precomputed per input row
    * (cast+norm run below the join, once per row, not once per pair).
    * Similarity is rounded to 6 dp *before* ranking and tie-broken by
    * corpus id, so the top-k set is stable across engines.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: String,
                     cId: String, qVec: String, cVec: String, k: Int): DataFrame = {
    val q = queries
      .withColumn("__qv", asDouble(col(qVec)))
      .withColumn("__qn", norm(col("__qv")))
      .drop(qVec)
    val c = corpus
      .withColumn("__cv", asDouble(col(cVec)))
      .withColumn("__cn", norm(col("__cv")))
      .drop(cVec)
    val joined = c.crossJoin(broadcast(q))
      .filter(col(qId) =!= col(cId))
      // same FP sequence as cosine(): dot / (norm_q * norm_c)
      .withColumn("sim",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 6))
    val w = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .drop("__qv", "__qn", "__cv", "__cn")
  }

  /** Blocked all-pairs similarity: equi-join on a blocking key (label,
    * LSH bucket, coarse centroid id) turns the quadratic cross join
    * into a per-block join — the shape that survives 100 TB. Pairs are
    * emitted once (leftId < rightId).
    */
  def blockedPairs(df: DataFrame, id: String, vec: String, block: String): DataFrame = {
    val prepped = df
      .withColumn("__v", asDouble(col(vec)))
      .withColumn("__n", norm(col("__v")))
    val a = prepped.select(col(block), col(id).as("ida"),
      col("__v").as("va"), col("__n").as("na"))
    val b = prepped.select(col(block).as("__blk"), col(id).as("idb"),
      col("__v").as("vb"), col("__n").as("nb"))
    a.join(b, a(block) === b("__blk") && col("ida") < col("idb"))
      .withColumn("sim",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .drop("__blk", "va", "vb", "na", "nb")
  }
}
