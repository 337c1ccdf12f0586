package graft.kernels

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter as a typed mergeable `Aggregator` over pre-hashed
  * keys: an m-bit set packed into m/64 Longs, k probe bits per key
  * from the public minhashParams hash family, merge = bitwise OR —
  * the membership pre-filter primitive (semi-join pruning, graftkv
  * bucket skipping) in the same deterministic-sketch discipline as
  * [[CountMin]]: given the hash family, every bit is reproducible, so
  * the DuckDB oracle replays membership answers exactly rather than
  * trusting an opaque engine bloom. No false negatives ever; false
  * positives at the standard (1-e^{-kn/m})^k rate.
  */
object BloomFilter {

  def sketch(mBits: Int, k: Int): Aggregator[Long, Array[Long], Seq[Long]] = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"bloom requires a multiple of 64 bits, got $mBits")
    require(k >= 1, s"bloom requires k >= 1 probes, got $k")
    val params = graft.ops.TextOps.minhashParams(k)
    val p = graft.ops.TextOps.MinhashP
    new Aggregator[Long, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](mBits / 64)

      override def reduce(b: Array[Long], x: Long): Array[Long] = {
        // Enforce the 52-bit non-negative input domain (minhashX values):
        // a <= 1022 so a*x+c stays under 2^63 only for x < 2^52, and the
        // DuckDB oracle replays (a*x+c)%p with the same no-overflow math.
        // A negative or wider key would silently produce a different (or
        // negative) bit index — fail fast instead.
        if ((x >>> 52) != 0L)
          throw new IllegalArgumentException(
            s"bloom sketch key out of the 52-bit non-negative domain: $x")
        var j = 0
        while (j < k) {
          val (a, c) = params(j)
          val bit = (((a * x + c) % p) % mBits).toInt
          b(bit >>> 6) |= 1L << (bit & 63)
          j += 1
        }
        b
      }

      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) |= y(i); i += 1 }
        x
      }

      override def finish(b: Array[Long]): Seq[Long] =
        scala.collection.immutable.ArraySeq.unsafeWrapArray(b)

      override def bufferEncoder: Encoder[Array[Long]] =
        Encoders.kryo[Array[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        ExpressionEncoder[Seq[Long]]()
    }
  }
}
