package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA over an embedding column — the dimensionality
  * analysis step of an embedding-curation pipeline (variance
  * structure, whitening, compact projections for downstream ANN).
  *
  * The distributed part is the RAW MOMENT accumulation: every row
  * contributes its d(d+1)/2 upper-triangle products x_i*x_j (generated
  * per-row with higher-order functions — no self-join, no explode
  * shuffle), and the groupBy reduces them map-side, so exactly
  * d(d+1)/2 rows per partition ever reach the exchange regardless of
  * corpus size. Per-row terms are floor-scaled to 1e12 integers and
  * summed as DECIMAL(18,0) (Spark widens the sum to DECIMAL(28,0)) —
  * exact under the embedding domain bound |x_i*x_j| <= ~1e6, i.e.
  * per-term magnitude <= ~1e18 and a sum ceiling of 1e28 — so the
  * moment matrix is bit-reproducible (and DuckDB-replayable, see
  * the `embed_gram` oracle).
  *
  * The driver-side part is metadata-sized: the d x d covariance
  * (assembled from the moments via Cov = S_xy/n - mean_x*mean_y) and
  * its eigendecomposition by cyclic Jacobi rotations — a fixed sweep
  * order and threshold make it deterministic across runs and JVMs.
  * d is the embedding width (64 here, a few hundred in practice);
  * nothing corpus-sized is ever collected.
  */
object Pca {

  /** Upper-triangle product terms per row as ONE primitive double
    * array in canonical (i, j >= i) row-major order — positions are
    * decoded to (i, j) AFTER the aggregation via a d(d+1)/2-row
    * broadcast map, so the per-row hot loop allocates no structs
    * (warm A/B at sf0.1: 4.10 -> 3.28 s vs struct(i, j, t)
    * generation; the remaining cost is the per-term 12dp round,
    * i.e. the exactness discipline itself).
    * `v` must reference an ALREADY MATERIALIZED array column (the
    * HOF-CSE gotcha: an inlined expression would re-evaluate per
    * (i, j)).
    */
  def pairValues(v: Column, d: Int): Column =
    flatten(transform(v, (xi, i) =>
      transform(slice(v, i + 1, lit(d) - i),
        xj => floor(xi * xj * lit(1e12) + lit(0.5)))))

  /** Exact raw second moments: (i, j, gram) for i <= j with gram =
    * sum(round12(x_i*x_j)). The per-term rounding is PURE IEEE —
    * floor(x*1e12 + 0.5) on the exact float-product double, the same
    * three FP ops in both engines (a decimal HALF_UP round here
    * diverged from DuckDB's FP round by 1 ulp on ~1e-7 of terms,
    * caught by the sf1 gate at 83M terms) — and the scaled integers
    * sum exactly, with ONE deterministic double division at the end.
    * One scan; the shuffle carries d(d+1)/2 rows per partition.
    */
  def gram(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val posMap = broadcast(
      (for (i <- 0 until d; j <- i until d) yield (i, j))
        .zipWithIndex.map { case ((i, j), p) => (p, i, j) }
        .toDF("pos", "i", "j"))
    emb.select(asDoubleCol(vecCol).as("__v"))
      .select(posexplode(pairValues(col("__v"), d)).as(Seq("pos", "t12")))
      .groupBy(col("pos"))
      .agg((sum(col("t12").cast(DecimalType(18, 0))).cast("double") /
        lit(1e12)).as("gram"))
      .join(posMap, Seq("pos"))
      .select(col("i"), col("j"), col("gram"))
  }

  /** Exact column sums and count (for centering) — same pure-IEEE
    * 1e12 scaling as [[gram]].
    */
  def columnMoments(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(asDoubleCol(vecCol).as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(floor(col("x") * lit(1e12) + lit(0.5))
        .cast(DecimalType(18, 0))).cast("double") / lit(1e12)).as("sx"),
        count(lit(1)).as("n"))

  private def asDoubleCol(vecCol: String): Column =
    transform(col(vecCol), _.cast("double"))

  /** Fitted model: per-dimension means, eigenvalues descending, and
    * the matching orthonormal eigenvectors (rows of `basis`).
    */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
                         basis: Array[Array[Double]])

  /** Fit by moment collection + driver-side Jacobi. Collects exactly
    * d(d+1)/2 + d rows.
    */
  def fit(emb: DataFrame, vecCol: String, d: Int): Model = {
    val g = gram(emb, vecCol, d).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val cm = columnMoments(emb, vecCol).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    val n = cm.values.head._2.toDouble
    val mean = Array.tabulate(d)(i => cm(i)._1 / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val s = if (i <= j) g((i, j)) else g((j, i))
      s / n - mean(i) * mean(j)
    }
    val (values, vectors) = jacobi(cov)
    Model(mean, values, vectors)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic sweep order (p < q row-major), rotations applied
    * until the off-diagonal Frobenius mass drops below tol. Returns
    * (eigenvalues desc, eigenvectors as rows), ties on the eigenvalue
    * broken by first-differing-component sign canonicalization
    * (largest-|component| positive) so the basis is unique.
    */
  def jacobi(mIn: Array[Array[Double]], tol: Double = 1e-12,
             maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val a = Array.tabulate(d, d)((i, j) => mIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += 2 * a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      math.sqrt(s)
    }
    var sweep = 0
    while (off() > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case x => x
            }
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // canonical sign: the largest-|component| entry is positive
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  /** Project onto the top-k components: scores_c = (v - mean)·e_c,
    * computed per-row against the broadcast-literal basis (no join,
    * no shuffle — projection rides the scan).
    */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              model: Model, k: Int): DataFrame = {
    val centered = zip_with(asDoubleCol(vecCol),
      typedlit(model.mean.toSeq), (x, m) => x - m)
    val proj = emb.withColumn("__c", centered)
    val scores = (0 until k).map { c =>
      aggregate(
        zip_with(col("__c"), typedlit(model.basis(c).toSeq), (x, e) => x * e),
        lit(0.0), (acc, t) => acc + t).as(s"pc$c")
    }
    proj.select(col(idCol) +: scores: _*)
  }
}
