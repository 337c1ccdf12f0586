package graft

import graft.intervals.Intervals
import graft.intervals.Intervals.Fragment
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class IntervalsSpec extends AnyFunSuite {

  test("parseFragments parses and sorts by (start, end)") {
    assert(Intervals.parseFragments("10-20-S,1-5-N,1-3-C") ===
      Seq(Fragment(1, 3, "C"), Fragment(1, 5, "N"), Fragment(10, 20, "S")))
    assert(Intervals.parseFragments("") === Seq.empty)
    assert(Intervals.parseFragments(null) === Seq.empty)
    assert(Intervals.parseFragments("bad,1-2-S") === Seq(Fragment(1, 2, "S")))
  }

  test("overlap helpers") {
    assert(Intervals.overlapLen(1, 10, 5, 20) === 6)
    assert(Intervals.overlapLen(1, 4, 5, 9) === 0)
    assert(!Intervals.overlaps(1, 4, 5, 9))
    assert(Intervals.overlaps(1, 5, 5, 9)) // inclusive touch
    assert(Intervals.overlapRatioShorter(1, 100, 91, 200) === 0.1)
  }

  test("condense: below-10% overlap keeps intervals apart") {
    // overlap 6 over shorter length 100 = 6% -> no merge
    assert(Intervals.condense(Seq((1, 100), (95, 200))) === Seq((1, 100), (95, 200)))
    // overlap 11 over shorter 100 = 11% -> merge
    assert(Intervals.condense(Seq((1, 100), (90, 200))) === Seq((1, 200)))
  }

  test("condense: chained merges extend the running interval") {
    assert(Intervals.condense(Seq((1, 50), (40, 90), (80, 130))) === Seq((1, 130)))
  }

  test("coverage is union length") {
    assert(Intervals.coverage(Seq((1, 10), (5, 14), (20, 21))) === 16L)
    assert(Intervals.coverage(Seq.empty) === 0L)
  }

  test("property: condensed intervals are sorted, disjoint-ish, and cover inputs") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val ivs = Seq.fill(rnd.nextInt(20) + 1) {
        val s = rnd.nextInt(500); (s, s + rnd.nextInt(80))
      }
      val out = Intervals.condense(ivs)
      // sorted
      assert(out === out.sortBy(identity))
      // every input is inside some output interval's span
      for ((s, e) <- ivs)
        assert(out.exists { case (os, oe) => os <= s && e <= oe },
          s"input ($s,$e) not covered by $out from $ivs")
      // idempotent at ratio 0 (already-condensed intervals stay put)
      val zero = Intervals.condense(ivs, 0.0)
      assert(Intervals.condense(zero, 0.0) === zero)
      // zero-ratio output is strictly disjoint
      zero.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("differential: condenseLocations matches the reference on 360 generated cases") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val url = getClass.getResource("/condense_fixture.json")
    val fixture = mapper.readTree(new java.io.File(url.toURI))
    import scala.jdk.CollectionConverters._
    var n = 0
    fixture.get("cases").elements().asScala.foreach { c =>
      val locations = c.get("locations").elements().asScala.toSeq.map { loc =>
        loc.elements().asScala.toSeq.map(f =>
          Fragment(f.get(0).asInt, f.get(1).asInt, "CONTINUOUS"))
      }
      val expected = c.get("expected").elements().asScala.toSeq
        .map(p => (p.get(0).asInt, p.get(1).asInt))
      assert(Intervals.condenseLocations(locations) === expected, s"case $n")
      n += 1
    }
    assert(n === 360)
  }

  test("property: condenseLocations outputs sorted spans covering every max end") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val locs = Seq.fill(rnd.nextInt(15) + 1) {
        Seq.fill(rnd.nextInt(3) + 1) {
          val s = rnd.nextInt(500); Intervals.Fragment(s, s + rnd.nextInt(80), "S")
        }.sortBy(f => (f.start, f.end))
      }
      val out = Intervals.condenseLocations(locs)
      assert(out.nonEmpty)
      assert(out === out.sortBy(_._1), s"unsorted: $out")
      // every location's leftmost start falls inside (or left-extends)
      // some span, and no span is empty
      for ((s, e) <- out) assert(s <= e)
      for (l <- locs) {
        val ls = l.head.start
        assert(out.exists { case (os, oe) => os <= ls && ls <= oe },
          s"location start $ls not inside any of $out")
      }
    }
  }
}
