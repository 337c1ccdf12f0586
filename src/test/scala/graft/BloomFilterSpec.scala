package graft

import graft.kernels.BloomFilter
import org.apache.spark.sql.functions._

import scala.util.Random

/** Bloom properties beyond the oracle row: zero false negatives on
  * arbitrary key sets, OR-merge partition invariance (the packed bit
  * array must be identical under any partitioning), and a sane false
  * positive rate at the designed load.
  */
class BloomFilterSpec extends SparkSpec {

  private def h52(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.take(7).map(b => f"${b & 0xff}%02x").mkString.take(13), 16)
  }

  test("no false negatives, partition-invariant bits, bounded false positives") {
    import spark.implicits._
    val m = 4096; val k = 3
    val rnd = new Random(5)
    val keys = Seq.fill(400)(s"key${rnd.nextInt(1000000)}").distinct
    val params = graft.ops.TextOps.minhashParams(k)
    val p = graft.ops.TextOps.MinhashP

    val blooms = Seq(1, 5, 32).map { parts =>
      keys.map(h52).toDF("x").repartition(parts).as[Long]
        .select(BloomFilter.sketch(m, k).toColumn).head()
    }
    assert(blooms.distinct.size === 1,
      "OR-merge — bits must not depend on partitioning")
    val bf = blooms.head

    def member(s: String): Boolean = {
      val x = h52(s)
      params.forall { case (a, b) =>
        val bit = (((a * x + b) % p) % m).toInt
        (bf(bit >>> 6) >>> (bit & 63) & 1L) == 1L
      }
    }
    keys.foreach(s => assert(member(s), s"false negative on $s"))
    val absent = Seq.tabulate(2000)(i => s"absent$i").filterNot(keys.contains)
    val fp = absent.count(member).toDouble / absent.size
    // designed rate (1 - e^{-kn/m})^k ~ 0.025 at n=400,m=4096,k=3;
    // allow generous slack for hash-family variance
    assert(fp < 0.10, s"false positive rate $fp implausibly high")
  }

  test("keys outside the 52-bit non-negative domain fail fast") {
    val agg = BloomFilter.sketch(64, 2)
    val b = agg.zero
    intercept[IllegalArgumentException](agg.reduce(b, -1L))
    intercept[IllegalArgumentException](agg.reduce(b, 1L << 52))
    intercept[IllegalArgumentException](agg.reduce(b, Long.MinValue))
    agg.reduce(b, 0L)
    agg.reduce(b, (1L << 52) - 1)
  }
}
