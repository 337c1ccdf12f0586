package graft

import graft.streaming.Sessionize
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private val Min = 60L * 1000000L // one minute in micros
  private val gap = 30 * Min

  test("splits on gaps strictly greater than the gap, merges at the boundary") {
    val units = Seq((0L, 0L, 1L), (30 * Min, 30 * Min, 1L), (61 * Min, 61 * Min, 1L))
    val out = Sessionize.sessionsOf(7L, units, gap)
    // 0 -> 30min: diff == gap -> merge; 30 -> 61: diff 31min > gap -> split
    assert(out === Seq(
      Sessionize.SessionOut(7L, 0L, 30 * Min, 2L),
      Sessionize.SessionOut(7L, 61 * Min, 61 * Min, 1L)))
  }

  test("carried open session merges with the next batch") {
    val carried = Seq((0L, 10 * Min, 3L))
    val units = Seq((25 * Min, 25 * Min, 1L))
    val out = Sessionize.sessionsOf(1L, (carried ++ units).sortBy(_._1), gap)
    assert(out === Seq(Sessionize.SessionOut(1L, 0L, 25 * Min, 4L)))
  }

  test("duplicate timestamps stay in one session and count") {
    val units = Seq((5L, 5L, 1L), (5L, 5L, 1L), (6L, 6L, 1L))
    val out = Sessionize.sessionsOf(2L, units, gap)
    assert(out === Seq(Sessionize.SessionOut(2L, 5L, 6L, 3L)))
  }
}
