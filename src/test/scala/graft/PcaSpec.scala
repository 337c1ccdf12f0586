package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

/** PCA invariants the gram-matrix hash oracle can't state: the Jacobi
  * eigensolver must actually diagonalize (residuals, orthonormality,
  * descending spectrum summing to the trace), the projection must
  * carry exactly the variance its eigenvalue promises, and the whole
  * fit must be run-to-run deterministic (fixed sweep order + sign
  * canonicalization — no RNG anywhere).
  */
class PcaSpec extends SparkSpec {

  private val D = 64

  test("jacobi diagonalizes a known 2x2 exactly") {
    val (vals, vecs) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2)
    assert(math.abs(vecs(0)(0) - r) < 1e-12 && math.abs(vecs(0)(1) - r) < 1e-12)
    assert(math.abs(math.abs(vecs(1)(0)) - r) < 1e-12 &&
      math.abs(math.abs(vecs(1)(1)) - r) < 1e-12)
  }

  test("fit: orthonormal basis, descending spectrum, eigen residuals, trace") {
    val emb = Tables.embeddings(spark, sf)
    val m = Pca.fit(emb, "embedding", D)
    assert(m.eigenvalues.length == D && m.basis.length == D)
    // descending, non-negative (covariance is PSD)
    m.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-10, s"spectrum not descending: $a < $b")
    }
    assert(m.eigenvalues.last > -1e-8)
    // orthonormality
    for (i <- 0 until D; j <- i until D) {
      val dot = (0 until D).map(k => m.basis(i)(k) * m.basis(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"basis($i)·basis($j) = $dot")
    }
    // rebuild the covariance the same way fit does and check C e = λ e
    val g = Pca.gram(emb, "embedding", D).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val cm = Pca.columnMoments(emb, "embedding").collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    val n = cm.values.head._2.toDouble
    val mean = Array.tabulate(D)(i => cm(i)._1 / n)
    val cov = Array.tabulate(D, D) { (i, j) =>
      (if (i <= j) g((i, j)) else g((j, i))) / n - mean(i) * mean(j)
    }
    val trace = (0 until D).map(i => cov(i)(i)).sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-8 * math.abs(trace),
      "eigenvalues must sum to the trace")
    for (c <- 0 until 4) {
      val e = m.basis(c); val l = m.eigenvalues(c)
      val resid = (0 until D).map { i =>
        val ce = (0 until D).map(j => cov(i)(j) * e(j)).sum
        math.abs(ce - l * e(i))
      }.max
      assert(resid < 1e-9, s"eigen residual for component $c = $resid")
    }
  }

  test("projection variance matches the eigenvalue and is shuffle-free") {
    val emb = Tables.embeddings(spark, sf)
    val m = Pca.fit(emb, "embedding", D)
    val proj = Pca.project(emb, "vec_id", "embedding", m, 3)
    val rows = proj.collect()
    assert(rows.length == emb.count())
    // population variance of pc_c = eigenvalue_c (scores are centered
    // by construction)
    for (c <- 0 until 3) {
      val xs = rows.map(_.getDouble(1 + c))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(va - m.eigenvalues(c)) < 1e-6 *
        math.max(1.0, m.eigenvalues(c)),
        s"pc$c variance $va vs eigenvalue ${m.eigenvalues(c)}")
      assert(math.abs(mu) < 1e-9, s"pc$c mean $mu not centered")
    }
    // the projection rides the scan: no exchange in its plan
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection plan shuffles:\n$plan")
  }

  test("fit is deterministic across runs") {
    val emb = Tables.embeddings(spark, sf)
    val m1 = Pca.fit(emb, "embedding", D)
    val m2 = Pca.fit(emb, "embedding", D)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.basis.map(_.toSeq).toSeq == m2.basis.map(_.toSeq).toSeq)
    assert(m1.mean.toSeq == m2.mean.toSeq)
  }
}
