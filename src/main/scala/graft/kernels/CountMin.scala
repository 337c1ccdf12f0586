package graft.kernels

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, 2005) as a typed
  * mergeable `Aggregator` over pre-hashed tokens: d x w Long counters,
  * each input increments one counter per row, merge is elementwise
  * addition — the PERFECTLY mergeable frequency summary (no
  * truncation, no offsets), complementing SpaceSaving (which keeps
  * identities but evicts) with point-queryable estimates for ANY key
  * at fixed d*w memory.
  *
  * est(t) = min over rows j of counter[j][h_j(t)] — an OVER-estimate
  * (collisions only add), with est(t) <= true(t) + eps*N at
  * probability 1 - delta for w = e/eps, d = ln(1/delta). Unlike a
  * sampled sketch the estimate is DETERMINISTIC given the hash
  * parameters (graft.ops.TextOps.minhashParams — the same public
  * (a,b) family the minhash oracles mirror in SQL), so the DuckDB
  * oracle reproduces every counter and every estimate exactly.
  *
  * The buffer is a primitive Long array under the kryo encoder: the
  * aggregator stays on the object-buffer path, reduce is two integer
  * ops per row per token, and the shuffle moves d*w longs per
  * partition regardless of corpus size.
  */
object CountMin {

  def sketch(d: Int, w: Int): Aggregator[Long, Array[Long], Seq[Long]] = {
    require(d >= 1 && w >= 1, s"count-min requires d,w >= 1, got $d x $w")
    val params = graft.ops.TextOps.minhashParams(d)
    val p = graft.ops.TextOps.MinhashP
    new Aggregator[Long, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](d * w)

      override def reduce(b: Array[Long], x: Long): Array[Long] = {
        // Same 52-bit non-negative input contract as [[BloomFilter]]:
        // keeps (a*x+c) overflow-free so the oracle's SQL replay matches,
        // and turns a would-be negative cell index into a fast failure.
        if ((x >>> 52) != 0L)
          throw new IllegalArgumentException(
            s"count-min sketch key out of the 52-bit non-negative domain: $x")
        var j = 0
        while (j < d) {
          val (a, c) = params(j)
          b(j * w + (((a * x + c) % p) % w).toInt) += 1L
          j += 1
        }
        b
      }

      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
        var i = 0
        while (i < x.length) { x(i) += y(i); i += 1 }
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
