package graft

import graft.kernels.CountMin
import org.apache.spark.sql.functions._

import scala.util.Random

/** Count-Min properties the hash oracle can't state: the over-estimate
  * invariant on arbitrary streams, and EXACT partition invariance —
  * elementwise-add merging means the final counter array must be
  * identical under any partitioning, not merely bracket-consistent.
  */
class CountMinSpec extends SparkSpec {

  private def h52(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(7).map(b => f"${b & 0xff}%02x").mkString.take(13), 16)
  }

  private def skewed(nTokens: Int, scale: Int, seed: Int): Seq[String] = {
    val items = (0 until nTokens).flatMap(i =>
      Seq.fill(math.max(1, scale / (i + 1)))(f"cm$i%03d"))
    new Random(seed).shuffle(items)
  }

  test("counters are partition-invariant and estimates over-estimate every true count") {
    import spark.implicits._
    val d = 4; val w = 64
    val data = skewed(300, 3000, 11) // 300 tokens >> 64 cells: collisions guaranteed
    val truth = data.groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
    val params = graft.ops.TextOps.minhashParams(d)
    val p = graft.ops.TextOps.MinhashP

    val sketches = Seq(1, 7, 32).map { parts =>
      data.map(h52).toDF("x").repartition(parts).as[Long]
        .select(CountMin.sketch(d, w).toColumn).head()
    }
    assert(sketches.distinct.size === 1,
      "merge is elementwise add — counters must not depend on partitioning")

    val cms = sketches.head
    assert(cms.sum === d.toLong * data.size,
      "every row of the sketch counts every input exactly once")
    truth.foreach { case (t, n) =>
      val x = h52(t)
      val est = params.zipWithIndex.map { case ((a, b), j) =>
        cms(j * w + (((a * x + b) % p) % w).toInt)
      }.min
      assert(est >= n, s"$t: est $est under-counts true $n")
    }
  }

  test("keys outside the 52-bit non-negative domain fail fast") {
    val agg = graft.kernels.CountMin.sketch(2, 16)
    val b = agg.zero
    intercept[IllegalArgumentException](agg.reduce(b, -7L))
    intercept[IllegalArgumentException](agg.reduce(b, 1L << 52))
    agg.reduce(b, 0L)
    agg.reduce(b, (1L << 52) - 1)
  }
}
