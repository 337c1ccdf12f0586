package graft.kernels

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY.md §2.10): the reference's
  * `copy_dict` recursive monoid merge (interpro7dw/utils/utils.py:4-18
  * — counts add, sets union, nested dicts recurse) as a case-class
  * -buffer Aggregator. The buffer IS the monoid: `reduce` folds one
  * row, `merge` is the associative combine Spark calls across
  * partitions (map-side partial aggregation for free — the part the
  * reference hand-rolls with worker queues), and `finish` renders the
  * deterministic JSON document.
  */
object TypedAggs {

  /** (count, exact decimal total, distinct member set). */
  case class DictBuf(n: Long, total: BigDecimal, segs: Seq[String])

  /** Input row: (group key, set member, decimal amount). */
  type In = (Long, String, BigDecimal)

  val custDict: Aggregator[In, DictBuf, String] =
    new Aggregator[In, DictBuf, String] {
      override def zero: DictBuf = DictBuf(0L, BigDecimal(0), Seq.empty)

      override def reduce(b: DictBuf, a: In): DictBuf =
        DictBuf(b.n + 1, b.total + a._3,
          if (b.segs.contains(a._2)) b.segs else b.segs :+ a._2)

      override def merge(x: DictBuf, y: DictBuf): DictBuf =
        DictBuf(x.n + y.n, x.total + y.total,
          (x.segs ++ y.segs).distinct)

      override def finish(b: DictBuf): String = {
        // scale pinned at render time: the buffer encoder transports
        // BigDecimal as Decimal(38,18), so toPlainString without
        // setScale would emit 18 trailing zeros
        val total = b.total.setScale(2).bigDecimal.toPlainString
        val segs = b.segs.sorted.mkString("\"", "\",\"", "\"")
        s"""{"n":${b.n},"total":"$total","segments":[$segs]}"""
      }

      override def bufferEncoder: Encoder[DictBuf] = Encoders.product[DictBuf]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
