package graft

import graft.intervals.Intervals.Fragment
import graft.kernels.MatchMerge
import graft.kernels.MatchMerge.{Location, RawMatch}
import org.scalatest.funsuite.AnyFunSuite

class MatchMergeSpec extends AnyFunSuite {

  private def rm(sig: String, entry: Option[String], dom: Boolean,
                 frags: (Int, Int)*): RawMatch =
    RawMatch("P1", sig, entry, dom, 1.0,
      frags.map { case (s, e) => Fragment(s, e, "CONTINUOUS") })

  test("location end is the last fragment's end in (start,end) order, not the max") {
    // fragments (1,100) and (50,60): sorted order puts (50,60) last,
    // so end = 60 even though 100 is the rightmost coordinate
    // (reference quirk, interpro/oracle/matches.py:71-79).
    val loc = MatchMerge.locationOf(rm("S1", None, dom = false, (1, 100), (50, 60)))
    assert(loc.start === 1)
    assert(loc.end === 60)
    assert(loc.fragments.map(f => (f.start, f.end)) === Seq((1, 100), (50, 60)))
  }

  test("mergeProtein groups per signature and sorts locations") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, dom = false, (200, 300)),
      rm("S1", None, dom = false, (10, 50)),
      rm("S2", None, dom = false, (5, 8))))
    val bySig = merged.map(m => m.acc -> m).toMap
    assert(bySig("S1").locations.map(l => (l.start, l.end)) === Seq((10, 50), (200, 300)))
    assert(bySig("S2").locations.map(l => (l.start, l.end)) === Seq((5, 8)))
    assert(merged.forall(!_.isEntry))
  }

  test("integrated signatures synthesize a condensed entry match") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", Some("IPR1"), dom = false, (1, 100)),
      rm("S2", Some("IPR1"), dom = false, (90, 200)),   // 11% of shorter -> merge
      rm("S3", Some("IPR1"), dom = false, (400, 500))))
    val entry = merged.find(_.isEntry).get
    assert(entry.acc === "IPR1")
    assert(entry.locations.map(l => (l.start, l.end)) === Seq((1, 200), (400, 500)))
  }

  test("representative selection keeps max-coverage conflict-free subset") {
    // A (1,100) conflicts with B (50,150) (>=30% of shorter overlap);
    // C (140,240): overlap with B = 11 over shorter 101 -> ~11% -> no
    // conflict. Best subset by coverage is {A, C} (200) over {B, C}
    // (~201? B=101+C=101-overlap... conflict-free means both allowed).
    val reps = MatchMerge.selectRepresentatives(Seq(
      Location(1, 100, Seq.empty, 0, representative = false),
      Location(50, 150, Seq.empty, 0, representative = false),
      Location(140, 240, Seq.empty, 0, representative = false)))
    // {B,C} coverage = union(50..150,140..240)=191; {A,C} = 100+101=201
    assert(reps === Set((1, 100), (140, 240)))
  }

  test("flags representatives only on domain locations of the chosen subset") {
    val merged = MatchMerge.mergeProtein("P1", Seq(
      rm("S1", None, dom = true, (1, 100)),
      rm("S1", None, dom = true, (50, 150)),
      rm("S1", None, dom = false, (300, 400))))
    val locs = merged.head.locations
    // (1,100) vs (50,150): conflict; singleton max coverage ties at 101
    // (50,150) wins coverage (101 > 100)
    assert(locs.filter(_.representative).map(l => (l.start, l.end)) === Seq((50, 150)))
  }
}
