package graft.kernels

import graft.intervals.Intervals
import graft.intervals.Intervals.Fragment

/** The irreducible business-logic kernels of the reference's match
  * pipeline (SURVEY.md §2.10 K1-K3), re-implemented fresh in Scala and
  * confined to typed `mapGroups` islands — everything around them stays
  * Catalyst-planned.
  *
  * Shapes derived from the reference's behavior:
  *  - per-protein merge of signature matches + synthesized InterPro
  *    entry matches with condensed locations
  *    (interpro/oracle/matches.py:287-393)
  *  - representative-domain selection over an overlap graph, bounded
  *    enumeration (interpro/oracle/matches.py:106-232, bound = 20)
  */
object MatchMerge {

  /** One raw match row (one model hit with its fragment list). */
  final case class RawMatch(proteinAcc: String, signatureAcc: String,
                            entryAcc: Option[String], isDomain: Boolean,
                            score: Double, fragments: Seq[Fragment])

  /** One merged location: the fragment span of a single hit. Location
    * start = leftmost fragment start; end = end of the LAST fragment in
    * (start, end) order — which is NOT guaranteed to be the rightmost
    * coordinate (reference quirk, interpro/oracle/matches.py:71-79).
    */
  final case class Location(start: Int, end: Int, fragments: Seq[Fragment],
                            score: Double, representative: Boolean)

  final case class MergedMatch(proteinAcc: String, acc: String,
                               isEntry: Boolean, locations: Seq[Location])

  def locationOf(m: RawMatch): Location = {
    val fs = m.fragments.sortBy(f => (f.start, f.end))
    Location(fs.head.start, fs.last.end, fs, m.score, representative = false)
  }

  /** K1: merge all raw matches of one protein into per-signature
    * matches (locations sorted by (start, end)) plus one synthesized
    * match per integrated InterPro entry whose locations are the
    * condensed union of its member signatures' locations.
    */
  def mergeProtein(proteinAcc: String, raw: Seq[RawMatch]): Seq[MergedMatch] = {
    val withLoc = raw.filter(_.fragments.nonEmpty).map(m => (m, locationOf(m)))

    val perSig = withLoc.groupBy(_._1.signatureAcc).toSeq.map {
      case (sig, ms) =>
        val domainLocs = ms.filter(_._1.isDomain).map(_._2)
        val repr = selectRepresentatives(domainLocs)
        val locs = ms.map { case (_, l) =>
          l.copy(representative = repr.contains((l.start, l.end)))
        }.sortBy(l => (l.start, l.end))
        MergedMatch(proteinAcc, sig, isEntry = false, locs)
    }

    val perEntry = withLoc.flatMap { case (m, l) => m.entryAcc.map(e => (e, l)) }
      .groupBy(_._1).toSeq.map { case (entry, ls) =>
        val condensed = Intervals.condense(ls.map(x => (x._2.start, x._2.end)))
        val locs = condensed.map { case (s, e) =>
          Location(s, e, Seq(Fragment(s, e, "CONTINUOUS")), 0.0,
            representative = false)
        }
        MergedMatch(proteinAcc, entry, isEntry = true, locs)
      }

    (perSig ++ perEntry).sortBy(m => (m.isEntry, m.acc))
  }

  val MaxDomainsPerGroup = 20

  /** K2: representative selection — group domain locations into
    * overlap islands; within each island (capped at the 20 best by
    * (coverage desc, start)) enumerate conflict-free subsets (two
    * locations conflict when their overlap covers >= 30% of the
    * shorter) and keep the subset with maximal residue coverage,
    * tiebreak (more locations, leftmost). Returns the (start, end)
    * keys of representative locations.
    */
  def selectRepresentatives(locs: Seq[Location]): Set[(Int, Int)] = {
    if (locs.isEmpty) return Set.empty
    // islands of transitively-overlapping locations
    val sorted = locs.map(l => (l.start, l.end)).distinct.sortBy(identity)
    val islands = Seq.newBuilder[Seq[(Int, Int)]]
    var cur = Vector(sorted.head)
    var curEnd = sorted.head._2
    for (iv <- sorted.tail) {
      if (iv._1 <= curEnd) { cur :+= iv; curEnd = math.max(curEnd, iv._2) }
      else { islands += cur; cur = Vector(iv); curEnd = iv._2 }
    }
    islands += cur

    islands.result().flatMap { group =>
      val best = group
        .sortBy { case (s, e) => (-(e - s + 1), s) }
        .take(MaxDomainsPerGroup)
      bestSubset(best.toVector)
    }.toSet
  }

  private def conflicts(a: (Int, Int), b: (Int, Int)): Boolean =
    Intervals.overlapRatioShorter(a._1, a._2, b._1, b._2) >= 0.3

  /** Bounded exact search for the max-coverage conflict-free subset.
    * 2^n bounded by MaxDomainsPerGroup (reference keeps the same bound
    * to contain the exponential enumeration).
    */
  private def bestSubset(cands: Vector[(Int, Int)]): Seq[(Int, Int)] = {
    import scala.math.Ordering.Implicits._
    var best: Seq[(Int, Int)] = Seq.empty
    // maximize (coverage, count, leftmost-start) — leftmost = larger -start
    var bestKey: (Long, Int, Int) = (Long.MinValue, 0, Int.MinValue)
    def rec(i: Int, chosen: List[(Int, Int)]): Unit = {
      if (i == cands.length) {
        if (chosen.nonEmpty) {
          val key = (Intervals.coverage(chosen), chosen.length, -chosen.map(_._1).min)
          if (key > bestKey) { best = chosen.sortBy(identity); bestKey = key }
        }
      } else {
        val c = cands(i)
        if (!chosen.exists(conflicts(_, c))) rec(i + 1, c :: chosen)
        rec(i + 1, chosen)
      }
    }
    rec(0, Nil)
    best
  }
}
