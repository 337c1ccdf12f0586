package graft

import graft.intervals.Intervals
import graft.intervals.Intervals.Fragment
import graft.kernels.MatchMerge
import graft.kernels.MatchMerge.RawMatch
import org.scalatest.funsuite.AnyFunSuite

class MatchMergeSpec extends AnyFunSuite {

  private def frags(fs: (Int, Int)*): Seq[Fragment] =
    fs.map { case (s, e) => Fragment(s, e, "CONTINUOUS") }

  private def rm(sig: String, entry: Option[String], kind: String,
                 fs: (Int, Int)*): RawMatch =
    RawMatch("P1", sig, entry, kind, rank = 0, score = 1.0, fragments = frags(fs: _*))

  test("location end is the last fragment's end in (start,end) order, not the max") {
    // fragments (1,100) and (50,60): sorted order puts (50,60) last,
    // so end = 60 even though 100 is the rightmost coordinate
    // (reference quirk, interpro/oracle/matches.py:71-79).
    val loc = MatchMerge.locationOf(rm("S1", None, "region", (1, 100), (50, 60)))
    assert(loc.start === 1)
    assert(loc.end === 60)
    assert(loc.fragments.map(f => (f.start, f.end)) === Seq((1, 100), (50, 60)))
  }

  test("mergeProtein groups per signature and sorts locations") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, "region", (200, 300)),
      rm("S1", None, "region", (10, 50)),
      rm("S2", None, "region", (5, 8))))
    val bySig = merged.map(m => m.acc -> m).toMap
    assert(bySig("S1").locations.map(l => (l.start, l.end)) === Seq((10, 50), (200, 300)))
    assert(bySig("S2").locations.map(l => (l.start, l.end)) === Seq((5, 8)))
    assert(merged.forall(!_.isEntry))
  }

  test("integrated signatures synthesize a condensed entry match") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", Some("IPR1"), "region", (1, 100)),
      rm("S2", Some("IPR1"), "region", (90, 200)),   // 11% of shorter -> merge
      rm("S3", Some("IPR1"), "region", (400, 500))))
    val entry = merged.find(_.isEntry).get
    assert(entry.acc === "IPR1")
    assert(entry.locations.map(l => (l.start, l.end)) === Seq((1, 200), (400, 500)))
  }

  test("entry condensation uses the MAX fragment end, not the last-sorted end") {
    // discontinuous match [(1,100),(50,60)]: location 'end' is 60 (the
    // quirk) but the reference's condense corrects to max end = 100
    // (interpro/oracle/matches.py:79-81), so the entry span is (1,100).
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", Some("IPR1"), "region", (1, 100), (50, 60))))
    val entry = merged.find(_.isEntry).get
    assert(entry.locations.map(l => (l.start, l.end)) === Seq((1, 100)))
  }

  test("condenseLocations absorbs contained spans and splits low-overlap ones") {
    // contained: (10,200) absorbs (20,30); low overlap: (195,400)
    // overlaps (10,200) by 6 < 10% of shorter(191+1) -> new span even
    // though they overlap.
    val out = Intervals.condenseLocations(Seq(
      frags((10, 200)), frags((20, 30)), frags((195, 400))))
    assert(out === Seq((10, 200), (195, 400)))
  }

  test("representative selection runs globally across signatures, once per kind") {
    // Two heavily-overlapping domains from DIFFERENT signatures: only
    // one may be representative (the reference forbids both).
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, "domain", (1, 100)),
      rm("S2", None, "domain", (10, 110))))
    val reps = merged.flatMap(_.locations).filter(_.representative)
    assert(reps.map(l => (l.start, l.end)) === Seq((10, 110)))  // larger coverage wins
  }

  test("domains and families get separate representative passes") {
    // a domain and a family that overlap fully: each is representative
    // within its own class (reference runs select_repr_domains twice).
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, "domain", (1, 100)),
      rm("S2", None, "family", (1, 100))))
    val reps = merged.flatMap(_.locations).filter(_.representative)
    assert(reps.size === 2)
  }

  test("regions never get the representative flag") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, "region", (1, 100))))
    assert(merged.flatMap(_.locations).forall(!_.representative))
  }

  test("representative selection keeps max-coverage conflict-free subset") {
    // A (1,100) conflicts with B (50,150) (>=30% of shorter overlap);
    // C (140,240): overlap with B = 11 over shorter 101 -> ~11% -> no
    // conflict. {A,C} coverage 201 beats {B,C} 191.
    val flags = MatchMerge.selectRepresentatives(Seq(
      (frags((1, 100)), 0), (frags((50, 150)), 0), (frags((140, 240)), 0)))
    assert(flags === IndexedSeq(true, false, true))
  }

  test("property: representatives are non-conflicting and cover every island") {
    // single-fragment locations only: for discontinuous matches the
    // reference's island grouping keys on the LAST-sorted fragment end
    // (not the max), so overlapping locations can land in different
    // islands and both be flagged — faithful behavior, verified by the
    // differential spec. The no-conflict invariant holds when
    // last-sorted end == max end, i.e. single-fragment locations.
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 100) {
      val locs = Seq.fill(rnd.nextInt(12) + 1) {
        val s = rnd.nextInt(300)
        (Seq(Fragment(s, s + rnd.nextInt(120), "S")), rnd.nextInt(3))
      }
      val flags = MatchMerge.selectRepresentatives(locs)
      assert(flags.count(identity) >= 1, s"no representative for $locs")
      // no two representatives overlap >= 30% of the smaller residue set
      def residues(fs: Seq[Fragment]): Set[Int] =
        fs.flatMap(f => f.start to f.end).toSet
      val reps = locs.zipWithIndex.filter { case (_, i) => flags(i) }
        .map { case ((fs, _), _) => residues(fs) }
      for (Seq(a, b) <- reps.combinations(2)) {
        val ov = (a & b).size
        assert(ov == 0 || ov.toDouble / math.min(a.size, b.size) < 0.3,
          s"conflicting representatives in $locs")
      }
    }
  }

  test("rank breaks coverage ties with more rank-0 members") {
    // two singleton subsets tie on coverage 100; the reference replaces
    // the incumbent only when rank-0 count increases. First-sorted wins
    // unless the other adds a rank-0 domain.
    val flags = MatchMerge.selectRepresentatives(Seq(
      (frags((1, 100)), 1),        // sorted first (same coverage, rank 1... )
      (frags((1, 100)), 0)))       // rank 0 sorts first by (coverage, rank)
    // best-20 ordering puts rank 0 first; subsets enumerated
    // include-first, so {rank0} sets max first; {rank1} ties and does
    // NOT replace (no extra coverage, no extra rank-0).
    assert(flags === IndexedSeq(false, true))
  }
}
