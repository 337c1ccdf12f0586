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
  * The aggregation buffer is a mutable Stream-Summary ([[Summary]]):
  * a token->counter hash map plus a count-bucketed index
  * (TreeMap[count, TreeSet[token]]), so every input token costs O(log
  * #distinct-counts) — two bucket moves — instead of an O(k) scan and
  * a fresh k-entry Seq per token. The kryo buffer encoder keeps Spark
  * on the object-buffer (TypedImperativeAggregate) path: the summary
  * lives as one live object per partition and serializes only at the
  * partial-aggregation boundary.
  *
  * Guarantees (property-tested in HeavyHittersSpec):
  *  - est(t) >= true(t) for every reported item, and
  *    est(t) - err(t) <= true(t) (the classic over-estimate bracket),
  *    and both survive every partial-aggregation merge: when merging,
  *    an item absent from a LOSSY other summary gains that summary's
  *    minimum count as offset on both count and err (the
  *    mergeable-summaries composition — an absent item's true count
  *    in a lossy summary's substream is at most its min count);
  *  - EXACT regime: while no summary ever exceeds `k` distinct
  *    tokens, no eviction or truncation fires, the `lossy` flag stays
  *    false, merge offsets are zero, and counts are exact with
  *    err = 0 — the corpus vocabulary is fixed by the generator (31
  *    tokens x the ScaleUp replica factor), so the
  *    `text_heavy_hitters` query runs the sketch in its provably
  *    exact regime and the DuckDB oracle pins it to the true counts.
  *
  * Merge truncates the combined summary to the largest `k` by count;
  * truncation only drops items (and marks the summary lossy), so the
  * bracket above survives every merge.
  */
object HeavyHitters {

  case class Entry(token: String, count: Long, err: Long)

  /** Wire/state form of a summary (streaming/StreamTopK state rows,
    * spec-level folds). `lossy` records whether an eviction or
    * truncation ever fired — the gate for merge min-offsets.
    */
  case class SsBuf(entries: Seq[Entry], lossy: Boolean)

  private final class Cell(var count: Long, var err: Long)
      extends Serializable

  /** Mutable Stream-Summary holding at most `k` counters.
    *
    * `cells` is the token->counter map; `buckets` indexes tokens by
    * current count (sorted, tokens lexicographic within a bucket) so
    * the minimum entry — the eviction victim, deterministic as
    * (count, token) min — is an O(log) lookup. `buckets` is transient
    * and rebuilt lazily after deserialization: only `add` needs it,
    * and merge rebuilds wholesale anyway.
    */
  final class Summary(val k: Int) extends Serializable {
    private val cells = new java.util.HashMap[String, Cell]()
    private var lossyFlag: Boolean = false
    @transient private var buckets:
        java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]] = _

    def lossy: Boolean = lossyFlag
    def size: Int = cells.size

    private def index():
        java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]] = {
      if (buckets == null) {
        buckets = new java.util.TreeMap[java.lang.Long, java.util.TreeSet[String]]()
        cells.forEach { (t, c) => bucketAdd(c.count, t) }
      }
      buckets
    }

    private def bucketAdd(count: Long, t: String): Unit = {
      val key = java.lang.Long.valueOf(count)
      var set = buckets.get(key)
      if (set == null) {
        set = new java.util.TreeSet[String]()
        buckets.put(key, set)
      }
      set.add(t)
    }

    private def bucketRemove(count: Long, t: String): Unit = {
      val key = java.lang.Long.valueOf(count)
      val set = buckets.get(key)
      if (set != null) {
        set.remove(t)
        if (set.isEmpty) buckets.remove(key)
      }
    }

    /** One stream token: increment, insert, or evict-min-and-replace. */
    def add(t: String): Unit = {
      val idx = index()
      val c = cells.get(t)
      if (c != null) {
        bucketRemove(c.count, t)
        c.count += 1
        bucketAdd(c.count, t)
      } else if (cells.size < k) {
        cells.put(t, new Cell(1L, 0L))
        bucketAdd(1L, t)
      } else {
        // evict the (count, token)-minimum entry; the newcomer
        // inherits its count as the over-estimate and records it as err
        val minEntry = idx.firstEntry()
        val minCount = minEntry.getKey.longValue()
        val victim = minEntry.getValue.first()
        bucketRemove(minCount, victim)
        cells.remove(victim)
        cells.put(t, new Cell(minCount + 1L, minCount))
        bucketAdd(minCount + 1L, t)
        lossyFlag = true
      }
    }

    /** Minimum count over the summary (0 when empty). */
    def minCount: Long =
      if (cells.isEmpty) 0L else index().firstKey.longValue()

    /** Offset a merge partner applies to items absent from THIS
      * summary: such an item's true count in this substream is at
      * most `minCount` — but only when this summary is lossy; a
      * never-evicted, never-truncated summary saw every distinct
      * token, so absent means a true count of zero.
      */
    private def absentOffset: Long = if (lossyFlag) minCount else 0L

    /** Mergeable-summaries combine (Agarwal et al., PODS 2012 shape):
      * sum shared items, min-offset one-sided items, truncate to k.
      * Mutates and returns this.
      */
    def mergeIn(o: Summary): Summary = {
      if (o.cells.isEmpty) return this
      val offSelf = absentOffset   // applied to items only in o
      val offOther = o.absentOffset // applied to items only in this
      if (offOther != 0L) {
        cells.forEach { (t, c) =>
          if (o.cells.get(t) == null) {
            c.count += offOther
            c.err += offOther
          }
        }
      }
      o.cells.forEach { (t, oc) =>
        val c = cells.get(t)
        if (c != null) {
          c.count += oc.count
          c.err += oc.err
        } else {
          cells.put(t, new Cell(oc.count + offSelf, oc.err + offSelf))
        }
      }
      lossyFlag = lossyFlag || o.lossyFlag
      if (cells.size > k) {
        // keep the k largest by (count desc, token asc) — truncation
        // only drops items, so the bracket survives
        val arr = new Array[Entry](cells.size)
        var i = 0
        cells.forEach { (t, c) => arr(i) = Entry(t, c.count, c.err); i += 1 }
        java.util.Arrays.sort(arr, entryOrdering)
        cells.clear()
        i = 0
        while (i < k) {
          val e = arr(i)
          cells.put(e.token, new Cell(e.count, e.err))
          i += 1
        }
        lossyFlag = true
      }
      buckets = null // lazily rebuilt if this buffer keeps reducing
      this
    }

    def toEntries: Seq[Entry] = {
      val arr = new Array[Entry](cells.size)
      var i = 0
      cells.forEach { (t, c) => arr(i) = Entry(t, c.count, c.err); i += 1 }
      java.util.Arrays.sort(arr, entryOrdering)
      scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
    }

    def toBuf: SsBuf = SsBuf(toEntries, lossyFlag)

    private[HeavyHitters] def restore(e: Entry): Unit =
      cells.put(e.token, new Cell(e.count, e.err))
    private[HeavyHitters] def setLossy(v: Boolean): Unit = lossyFlag = v
  }

  /** (count desc, token asc) — the report order and truncation rank. */
  private val entryOrdering: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] with Serializable {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Long.compare(b.count, a.count)
        if (c != 0) c else a.token.compareTo(b.token)
      }
    }

  object Summary {
    def fromBuf(k: Int, buf: SsBuf): Summary = {
      val s = new Summary(k)
      // rebuild the counter map directly; the bucket index is lazy
      buf.entries.foreach(s.restore)
      s.setLossy(buf.lossy)
      s
    }
  }

  def spaceSaving(k: Int): Aggregator[String, Summary, Seq[Entry]] = {
    require(k >= 1, s"spaceSaving requires k >= 1, got $k")
    new Aggregator[String, Summary, Seq[Entry]] {
      override def zero: Summary = new Summary(k)

      override def reduce(b: Summary, t: String): Summary = {
        b.add(t); b
      }

      override def merge(x: Summary, y: Summary): Summary = x.mergeIn(y)

      override def finish(b: Summary): Seq[Entry] = b.toEntries

      override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
      override def outputEncoder: Encoder[Seq[Entry]] =
        ExpressionEncoder[Seq[Entry]]()
    }
  }
}
