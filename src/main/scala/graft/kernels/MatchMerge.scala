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
  *    (interpro/oracle/matches.py:287-393): matches are classified
  *    into domains / families / regions; representative selection runs
  *    ONCE over all of the protein's domains and once over all its
  *    families — across signatures — never per signature.
  *  - representative-domain selection over an overlap graph with
  *    residue-set coverage, bounded subset enumeration
  *    (interpro/oracle/matches.py:106-232; MAX_DOM_BY_GROUP=20,
  *    DOM_OVERLAP_THRESHOLD=0.3).
  */
object MatchMerge {

  /** One raw match row (one model hit with its fragment list).
    * `kind` mirrors the reference's classification by signature
    * database+type into "domain" / "family" / "region"
    * (interpro/oracle/matches.py:304-310); `rank` is the database's
    * priority index within its kind (0 = most preferred, e.g. Pfam
    * for domains).
    */
  final case class RawMatch(proteinAcc: String, signatureAcc: String,
                            entryAcc: Option[String], kind: String, rank: Int,
                            score: Double, fragments: Seq[Fragment],
                            model: Option[String] = None)

  /** PANTHER subfamily models look like PTHR12345:SF67; a hit whose
    * model is a subfamily gets the subfamily annotation on its
    * location (interpro/oracle/matches.py:321,359-364).
    */
  val PantherSubfamily: scala.util.matching.Regex = """PTHR\d+:SF\d+""".r

  /** One merged location: the fragment span of a single hit. Location
    * start = leftmost fragment start; end = end of the LAST fragment in
    * (start, end) order — which is NOT guaranteed to be the rightmost
    * coordinate (reference quirk, interpro/oracle/matches.py:71-79).
    * `model`/`score` are per-hit (None on synthesized entry locations,
    * matches.py:352-357,380-386); `subfamily` is the PANTHER subfamily
    * model accession when the hit's model is one (the reference also
    * attaches the subfamily NAME from its signature dimension — here a
    * downstream join against the signatures frame, keeping the kernel
    * free of dimension lookups).
    */
  final case class Location(start: Int, end: Int, fragments: Seq[Fragment],
                            score: Option[Double], representative: Boolean,
                            model: Option[String] = None,
                            subfamily: Option[String] = None)

  final case class MergedMatch(proteinAcc: String, acc: String,
                               isEntry: Boolean, locations: Seq[Location])

  def locationOf(m: RawMatch): Location = {
    val fs = m.fragments.sortBy(f => (f.start, f.end))
    // reference: "model": model_acc or signature_acc (matches.py:298)
    val model = m.model.filter(_.nonEmpty).getOrElse(m.signatureAcc)
    Location(fs.head.start, fs.last.end, fs, Some(m.score),
      representative = false, model = Some(model),
      subfamily = Some(model).filter(PantherSubfamily.matches))
  }

  /** K1: merge all raw matches of one protein into per-signature
    * matches (locations sorted by the leftmost fragment) plus one
    * synthesized match per integrated InterPro entry whose locations
    * are the condensed union of its member signatures' locations.
    */
  def mergeProtein(proteinAcc: String, raw: Seq[RawMatch]): Seq[MergedMatch] = {
    val valid = raw.filter(_.fragments.nonEmpty)
      .map(m => m.copy(fragments = m.fragments.sortBy(f => (f.start, f.end))))

    // classify; domains and families take the boundary order the
    // reference's select_repr_domains applies IN PLACE (stable sort by
    // (first-frag start, last-frag end), interpro/oracle/
    // matches.py:107-109) — the later per-signature location sort is
    // stable, so this mutation is visible in tie order. Regions keep
    // input order (never re-sorted).
    def boundarySorted(ms: Seq[RawMatch]): Seq[RawMatch] =
      ms.sortBy(m => (m.fragments.head.start, m.fragments.last.end))
    val domains = boundarySorted(valid.filter(_.kind == "domain"))
    val families = boundarySorted(valid.filter(_.kind == "family"))
    val regions = valid.filterNot(m => m.kind == "domain" || m.kind == "family")

    // one representative pass over ALL domains of the protein, and a
    // second over ALL families (interpro/oracle/matches.py:312-316)
    val reprDom = selectRepresentatives(domains.map(m => (m.fragments, m.rank)))
    val reprFam = selectRepresentatives(families.map(m => (m.fragments, m.rank)))

    val flagged: Seq[(RawMatch, Boolean)] =
      domains.zipWithIndex.map { case (m, i) => (m, reprDom(i)) } ++
        families.zipWithIndex.map { case (m, i) => (m, reprFam(i)) } ++
        regions.map(m => (m, false))

    val perSig = flagged.groupBy(_._1.signatureAcc).toSeq.map {
      case (sig, ms) =>
        val locs = ms.map { case (m, repr) =>
          locationOf(m).copy(representative = repr)
        }.sortBy(l => (l.fragments.head.start, l.fragments.head.end))
        MergedMatch(proteinAcc, sig, isEntry = false, locs)
    }

    val perEntry = flagged.flatMap { case (m, _) => m.entryAcc.map(e => (e, m)) }
      .groupBy(_._1).toSeq.map { case (entry, ms) =>
        val condensed = Intervals.condenseLocations(ms.map(_._2.fragments))
        // entry locations carry no per-hit model/score
        // (matches.py:380-386)
        val locs = condensed.map { case (s, e) =>
          Location(s, e, Seq(Fragment(s, e, "CONTINUOUS")), None,
            representative = false)
        }
        MergedMatch(proteinAcc, entry, isEntry = true, locs)
      }

    (perSig ++ perEntry).sortBy(m => (m.isEntry, m.acc))
  }

  val MaxDomainsPerGroup = 20
  val OverlapThreshold = 0.3

  private final case class Dom(idx: Int, frags: Seq[Fragment], rank: Int) {
    // residue set as canonical disjoint intervals — semantically the
    // reference's per-residue set (matches.py:119-128) but O(#frags)
    // instead of O(protein length) to build and compare
    val residues: Array[(Int, Int)] =
      Intervals.normalize(frags.map(f => (f.start, f.end)))
    val residueCount: Long = Intervals.setSize(residues)
    def firstStart: Int = frags.head.start
    def lastEnd: Int = frags.last.end
  }

  /** K2: representative selection over one class of matches (domains
    * OR families) of a single protein. Group transitively-overlapping
    * locations into islands (running stop = max last-fragment end);
    * within each island keep the best 20 by (residue coverage desc,
    * rank asc), build the conflict graph — two locations conflict when
    * their shared residues cover >= 30% of the smaller residue set —
    * enumerate conflict-free subsets in the reference's DFS order and
    * keep its pick. Returns the representative flag per input
    * position.
    */
  def selectRepresentatives(locs: Seq[(Seq[Fragment], Int)]): IndexedSeq[Boolean] = {
    val repr = Array.fill(locs.length)(false)
    if (locs.isEmpty) return repr.toIndexedSeq

    val doms = locs.zipWithIndex
      .map { case ((fs, r), i) => Dom(i, fs, r) }
      .sortBy(d => (d.firstStart, d.lastEnd))

    // overlap islands (interpro/oracle/matches.py:111-130)
    val groups = Vector.newBuilder[Vector[Dom]]
    var group = Vector(doms.head)
    var stop = doms.head.lastEnd
    for (d <- doms.tail) {
      if (d.firstStart <= stop) { group :+= d; stop = math.max(stop, d.lastEnd) }
      else { groups += group; group = Vector(d); stop = d.lastEnd }
    }
    groups += group

    for (g <- groups.result()) {
      val best = g.sortBy(d => (-d.residueCount, d.rank)).take(MaxDomainsPerGroup)
      for (d <- bestSubset(best)) repr(d.idx) = true
    }
    repr.toIndexedSeq
  }

  private def conflicts(a: Dom, b: Dom): Boolean = {
    val ov = Intervals.setIntersectionLen(a.residues, b.residues)
    ov > 0 && ov.toDouble / math.min(a.residueCount, b.residueCount) >= OverlapThreshold
  }

  /** Bounded exact search for the chosen conflict-free subset.
    * Enumerates subsets in the reference's DFS order (include-current
    * branch first, interpro/oracle/matches.py:205-232) and applies its
    * exact update rule — skip when coverage drops, replace on strictly
    * higher coverage OR more rank-0 domains
    * (interpro/oracle/matches.py:156-182) — so ties resolve
    * identically. 2^n bounded by MaxDomainsPerGroup; the pairwise
    * conflict matrix is precomputed once (bitmask per candidate) and
    * union coverage is carried incrementally down the DFS, so each
    * node costs O(intervals) rather than O(protein length).
    */
  private def bestSubset(cands: Vector[Dom]): Seq[Dom] = {
    val n = cands.length
    val conflictMask = new Array[Long](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < i) {
        if (conflicts(cands(i), cands(j))) {
          conflictMask(i) |= 1L << j
          conflictMask(j) |= 1L << i
        }
        j += 1
      }
      i += 1
    }
    var best: Seq[Dom] = Seq.empty
    var maxCoverage = 0L
    var maxRank0 = 0
    def rec(i: Int, chosenMask: Long, chosen: List[Dom],
            union: Array[(Int, Int)], coverage: Long, rank0: Int): Unit = {
      if (i == n) {
        if (coverage >= maxCoverage &&
            (coverage > maxCoverage || rank0 > maxRank0)) {
          maxCoverage = coverage; maxRank0 = rank0; best = chosen.reverse
        }
      } else {
        val c = cands(i)
        if ((conflictMask(i) & chosenMask) == 0L) {
          val u = Intervals.setUnion(union, c.residues)
          rec(i + 1, chosenMask | (1L << i), c :: chosen,
            u, Intervals.setSize(u), rank0 + (if (c.rank == 0) 1 else 0))
        }
        rec(i + 1, chosenMask, chosen, union, coverage, rank0)
      }
    }
    rec(0, 0L, Nil, Array.empty, 0L, 0)
    best
  }
}
