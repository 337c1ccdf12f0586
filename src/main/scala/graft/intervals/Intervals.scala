package graft.intervals

/** Pure interval algebra used by the match-merging kernels.
  *
  * Semantics derived from the reference's behavior (not ported code):
  *  - fragment strings "start-end-status,..." (interpro/oracle/matches.py:33-53)
  *  - condensation sweep merging when the overlap covers >= 10% of the
  *    shorter interval (interpro/oracle/matches.py:60-103)
  *  - overlap test / length (interpro/utils.py:21-40)
  *
  * All intervals are inclusive [start, end] residue coordinates.
  */
object Intervals {

  final case class Fragment(start: Int, end: Int, status: String)

  /** Inclusive overlap length; <= 0 means disjoint. */
  def overlapLen(s1: Int, e1: Int, s2: Int, e2: Int): Int =
    math.min(e1, e2) - math.max(s1, s2) + 1

  def overlaps(s1: Int, e1: Int, s2: Int, e2: Int): Boolean =
    overlapLen(s1, e1, s2, e2) > 0

  /** Fraction of the shorter interval covered by the overlap. */
  def overlapRatioShorter(s1: Int, e1: Int, s2: Int, e2: Int): Double = {
    val ov = overlapLen(s1, e1, s2, e2)
    if (ov <= 0) 0.0
    else ov.toDouble / math.min(e1 - s1 + 1, e2 - s2 + 1)
  }

  /** Parse "s-e-S,s-e-N" fragment strings; fragments sorted by
    * (start, end). Unparseable input yields an empty result rather
    * than throwing (source rows are untrusted).
    */
  def parseFragments(s: String): Seq[Fragment] =
    if (s == null || s.isEmpty) Seq.empty
    else s.split(',').toSeq.flatMap { part =>
      part.split('-') match {
        case Array(a, b, st) =>
          try Some(Fragment(a.trim.toInt, b.trim.toInt, st.trim)) catch {
            case _: NumberFormatException => None
          }
        case _ => None
      }
    }.sortBy(f => (f.start, f.end))

  /** Condense a bag of intervals into a minimal set: sort by
    * (start, end), sweep left to right, merge the next interval into
    * the running one when their overlap covers at least `minRatio` of
    * the shorter of the two. With minRatio = 0 this merges anything
    * touching; the reference uses 0.1.
    */
  def condense(ivs: Seq[(Int, Int)], minRatio: Double = 0.1): Seq[(Int, Int)] = {
    if (ivs.isEmpty) return Seq.empty
    val sorted = ivs.sortBy(identity)
    val out = Seq.newBuilder[(Int, Int)]
    var (cs, ce) = sorted.head
    for ((s, e) <- sorted.tail) {
      val ov = overlapLen(cs, ce, s, e)
      val shorter = math.min(ce - cs + 1, e - s + 1)
      if (ov > 0 && ov >= minRatio * shorter) ce = math.max(ce, e)
      else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.result()
  }

  /** Total residue coverage of a set of (possibly overlapping)
    * intervals — union length, computed by a zero-ratio condense.
    */
  def coverage(ivs: Seq[(Int, Int)]): Long =
    condense(ivs, 0.0).map { case (s, e) => (e - s + 1).toLong }.sum

  // ---- residue-SET algebra over disjoint sorted interval lists ----
  // A residue set {1..5, 7..9} is represented as Array((1,5),(7,9)):
  // sorted by start, non-overlapping, non-adjacent. These back the
  // match-merge kernel's coverage/overlap math (the semantic
  // equivalent of the reference's per-residue Python sets,
  // interpro/oracle/matches.py:119-128) without materializing one
  // element per residue.

  /** Canonical residue set from arbitrary intervals: sort, merge
    * overlapping AND adjacent ([1,5]+[6,8] is the contiguous set 1..8).
    */
  def normalize(ivs: Seq[(Int, Int)]): Array[(Int, Int)] = {
    if (ivs.isEmpty) return Array.empty
    val sorted = ivs.sortBy(identity)
    val out = Array.newBuilder[(Int, Int)]
    var (cs, ce) = sorted.head
    for ((s, e) <- sorted.tail) {
      if (s <= ce + 1) ce = math.max(ce, e)
      else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.result()
  }

  /** Set union of two canonical residue sets. */
  def setUnion(a: Array[(Int, Int)], b: Array[(Int, Int)]): Array[(Int, Int)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = Array.newBuilder[(Int, Int)]
    var i = 0; var j = 0
    var (cs, ce) = if (a(0)._1 <= b(0)._1) { i = 1; a(0) } else { j = 1; b(0) }
    while (i < a.length || j < b.length) {
      val (s, e) =
        if (j >= b.length || (i < a.length && a(i)._1 <= b(j)._1)) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (s <= ce + 1) ce = math.max(ce, e)
      else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.result()
  }

  /** |A ∩ B| for two canonical residue sets (two-pointer sweep). */
  def setIntersectionLen(a: Array[(Int, Int)], b: Array[(Int, Int)]): Long = {
    var i = 0; var j = 0
    var total = 0L
    while (i < a.length && j < b.length) {
      val ov = math.min(a(i)._2, b(j)._2) - math.max(a(i)._1, b(j)._1) + 1
      if (ov > 0) total += ov
      if (a(i)._2 <= b(j)._2) i += 1 else j += 1
    }
    total
  }

  /** |A| for a canonical residue set. */
  def setSize(a: Array[(Int, Int)]): Long =
    a.foldLeft(0L) { case (acc, (s, e)) => acc + (e - s + 1) }

  /** Condense multi-fragment locations the way the reference's entry
    * synthesis does (interpro/oracle/matches.py:60-103): locations are
    * sorted by their leftmost fragment's (start, end), but each
    * location's effective span ends at the MAX fragment end (the
    * reference explicitly corrects the last-sorted-fragment quirk
    * here, matches.py:79-81). A location contained in the running span
    * is absorbed; an overlapping one merges only when the overlap
    * covers >= `minRatio` of the shorter span, otherwise a new span
    * starts (so outputs may overlap, as in the reference). Fragments
    * within each location must already be sorted by (start, end).
    */
  def condenseLocations(locations: Seq[Seq[Fragment]],
                        minRatio: Double = 0.1): Seq[(Int, Int)] = {
    if (locations.isEmpty) return Seq.empty
    val sorted = locations.sortBy(l => (l.head.start, l.head.end))
    val out = Seq.newBuilder[(Int, Int)]
    var cs = sorted.head.head.start
    var ce = sorted.head.map(_.end).max
    for (frags <- sorted.tail) {
      val s = frags.head.start
      val e = frags.map(_.end).max
      if (e <= ce) () // contained in the running span: absorbed
      else if (s <= ce &&
               math.min(ce, e) - math.max(cs, s) + 1 >=
                 (math.min(ce - cs, e - s) + 1) * minRatio) {
        ce = e
      } else { out += ((cs, ce)); cs = s; ce = e }
    }
    out += ((cs, ce))
    out.result()
  }
}
