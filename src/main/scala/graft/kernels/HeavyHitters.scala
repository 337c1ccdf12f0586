package graft.kernels

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving frequent-items sketch (Metwally et al., ICDT 2005) as
  * a typed mergeable `Aggregator`: the frequent-tokens census that at
  * corpus scale replaces a full token groupBy — each map task carries
  * at most `k` counters, the shuffle moves one k-entry summary per
  * partition instead of the exploded token stream, and `merge` is the
  * associative combine Spark already calls for partial aggregation.
  *
  * Guarantees (property-tested in HeavyHittersSpec):
  *  - est(t) >= true(t) for every reported item, and
  *    est(t) - err(t) <= true(t) (the classic over-estimate bracket);
  *  - EXACT regime: while a summary never exceeds `k` distinct
  *    tokens, counts are exact and err = 0 — the corpus vocabulary is
  *    fixed by the generator (31 tokens at every SF), so the
  *    `text_heavy_hitters` query runs the sketch in its provably
  *    exact regime and the DuckDB oracle pins it to the true counts.
  *
  * Merge sums the union's counts/errors and truncates to the largest
  * `k` by count — the mergeable-summaries composition; truncation
  * only drops items, so the bracket above survives every merge.
  */
object HeavyHitters {

  case class Entry(token: String, count: Long, err: Long)
  case class SsBuf(entries: Seq[Entry])

  def spaceSaving(k: Int): Aggregator[String, SsBuf, Seq[Entry]] = {
    require(k >= 1, s"spaceSaving requires k >= 1, got $k")
    new Aggregator[String, SsBuf, Seq[Entry]] {
      override def zero: SsBuf = SsBuf(Seq.empty)

      override def reduce(b: SsBuf, t: String): SsBuf = {
        val i = b.entries.indexWhere(_.token == t)
        if (i >= 0) {
          val e = b.entries(i)
          SsBuf(b.entries.updated(i, e.copy(count = e.count + 1)))
        } else if (b.entries.size < k) {
          SsBuf(b.entries :+ Entry(t, 1L, 0L))
        } else {
          // evict the min-count entry; the newcomer inherits its count
          // as the over-estimate and records it as err
          val m = b.entries.minBy(e => (e.count, e.token))
          SsBuf(b.entries.filterNot(_ == m) :+
            Entry(t, m.count + 1, m.count))
        }
      }

      override def merge(x: SsBuf, y: SsBuf): SsBuf = {
        val summed = (x.entries ++ y.entries)
          .groupBy(_.token)
          .map { case (t, es) =>
            Entry(t, es.map(_.count).sum, es.map(_.err).sum)
          }
          .toSeq
        SsBuf(summed.sortBy(e => (-e.count, e.token)).take(k))
      }

      override def finish(b: SsBuf): Seq[Entry] =
        b.entries.sortBy(e => (-e.count, e.token))

      override def bufferEncoder: Encoder[SsBuf] = Encoders.product[SsBuf]
      override def outputEncoder: Encoder[Seq[Entry]] =
        ExpressionEncoder[Seq[Entry]]()
    }
  }
}
