package graft

import org.apache.spark.sql.functions._

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Brute-force differentials for the event-analytics remainder —
  * window_rolling_distinct, window_anomaly, window_ema, window_cusum,
  * window_skyline — completing the family CdcEventDifferentialSpec
  * started (funnel/retention/merge/scd2). Each harness query runs end
  * to end against a naive Scala reimplementation sharing no code or
  * engine, and WHERE THE QUERY USES A CLEVER EQUIVALENT FORM the naive
  * truth implements the DEFINITION instead, so the equivalence itself
  * is under test:
  *
  *  - window_cusum lowers Page's recursion S_t = max(0, S_{t-1}+x_t)
  *    to a prefix-sum/prefix-min identity → the naive truth runs the
  *    literal recursion;
  *  - window_skyline collapses Pareto dominance to one sorted window
  *    pass → the naive truth is the quadratic dominance definition;
  *  - window_ema ships the closed-form denominator 2^8 − 2^(8−n) →
  *    the naive truth SUMS the geometric weights.
  *
  * Pinned edges: a zero-variance window (the z-score's v<=0 branch),
  * exact-tie timestamps forcing the (ts, event_id) order, a user whose
  * CUSUM statistic lands EXACTLY on the alarm threshold (strict > must
  * not fire) and one a hair above (must fire), duplicate skyline
  * points (distinct collapses them) and equal-quantity frontier ties.
  */
class EventAnalyticsDifferentialSpec extends SparkSpec {

  private val Base = 1700000000L
  private val CusumDrift = 10000000L
  private val CusumThreshold = 100000000L

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)
  private def fmtSec(sec: Long): String = fmt.format(Instant.ofEpochSecond(sec))

  // ---- seeded micro events ---------------------------------------------

  private case class Ev(id: Long, sec: Long, user: Long, micro: Long)

  private lazy val events: Seq[Ev] = {
    val rnd = new scala.util.Random(31416L)
    var id = 0L
    val organic = (1L to 60L).flatMap { u =>
      val n = 1 + rnd.nextInt(20)
      var last = 0L
      (0 until n).map { _ =>
        id += 1
        val sec = if (last != 0L && rnd.nextDouble() < 0.25) last // ts ties
                  else Base + rnd.nextInt(10 * 86400).toLong
        last = sec
        Ev(id, sec, u, rnd.nextInt(490000000).toLong)
      }
    }
    val pinned = Seq(
      // 9101: constant values → every 5-row window has zero variance
      // (the z-score's v<=0 → 0 branch on all rows)
      Ev(91011, Base, 9101, 42000000L), Ev(91012, Base + 10, 9101, 42000000L),
      Ev(91013, Base + 20, 9101, 42000000L), Ev(91014, Base + 30, 9101, 42000000L),
      Ev(91015, Base + 40, 9101, 42000000L), Ev(91016, Base + 50, 9101, 42000000L),
      // 9102: CUSUM statistic lands EXACTLY on the threshold — the
      // strict > gate must NOT alarm (values 0 and 220: mu=110e6,
      // s2 = 220e6 − 110e6 − 10e6 = 100e6 = threshold)
      Ev(91021, Base, 9102, 0L), Ev(91022, Base + 10, 9102, 220000000L),
      // 9103: one micro-unit above → must alarm
      Ev(91031, Base, 9103, 0L), Ev(91032, Base + 10, 9103, 220000002L))
    organic ++ pinned
  }

  private case class Li(part: Long, priceC: Long, qty: Long)

  private lazy val liRows: Seq[Li] = {
    val rnd = new scala.util.Random(2718L)
    val organic = (1 to 400).map { _ =>
      // groups 44 and 45 (= 300/301 mod 64) are reserved for the
      // pinned frontier points, so their dominance facts hold exactly
      val p0 = rnd.nextInt(200).toLong
      val p = if (p0 % 64 == 44 || p0 % 64 == 45) p0 + 2 else p0
      Li(p, 100L + rnd.nextInt(5000).toLong, 1L + rnd.nextInt(50)) }
    val pinned = Seq(
      Li(300, 1000, 10), Li(300, 1000, 10),  // exact duplicate point
      Li(300, 900, 10),                       // same qty, cheaper → dominates
      Li(300, 900, 12), Li(300, 1100, 12),   // same qty tie on the frontier
      Li(301, 500, 5))                        // singleton group
    organic ++ pinned
  }

  private lazy val microDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-event-diff").toString
    events.map(e => (e.id, e.sec * 1000000L, e.user, e.micro / 1e6))
      .toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    liRows.map(l => (l.part, l.priceC / 100.0, l.qty.toDouble))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(name: String) =
    harness.WindowQueries.queries(name)(spark, microDir)

  /** Per-user event streams in the queries' (ts, event_id) order, with
    * vu reconstructed exactly as floor(value·1e6 + 0.5).
    */
  private lazy val byUser: Map[Long, Seq[Ev]] =
    events.groupBy(_.user).view
      .mapValues(_.sortBy(e => (e.sec, e.id))
        .map(e => e.copy(micro = math.floor((e.micro / 1e6) * 1e6 + 0.5).toLong)))
      .toMap

  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  // ---- differentials ----------------------------------------------------

  test("window_rolling_distinct matches a naive 7-day distinct-user count") {
    val userDays = events.map(e =>
      (e.user, LocalDate.ofInstant(Instant.ofEpochSecond(e.sec), ZoneOffset.UTC)))
      .distinct
    val present = userDays.map(_._2).distinct
    val naive = present.map { t =>
      val n = userDays.collect { case (u, d)
        if !d.isAfter(t) && !d.isBefore(t.minusDays(6)) => u }.distinct.size
      (t.toString, n.toLong)
    }.toSet
    val got = run("window_rolling_distinct").collect()
      .map(r => (r.getString(0), num(r, 1))).toSet
    assert(got === naive)
  }

  test("window_anomaly matches a naive rolling z-score over the last 5 events") {
    val naive = byUser.toSeq.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (e, i) =>
        val win = evs.slice(math.max(0, i - 4), i + 1).map(_.micro)
        val n = win.size.toLong
        val s1 = win.sum
        val m = s1.toDouble / n
        val v = win.map(x => BigInt(x) * BigInt(x)).sum.toDouble / n - m * m
        val z = if (v <= 0) 0L
                else math.floor((e.micro - m) / math.sqrt(v) * 1e6 + 0.5).toLong
        (u, e.id, fmtSec(e.sec), e.micro, n, z, math.abs(z) > 2000000L)
      }
    }.toSet
    val got = run("window_anomaly").collect()
      .map(r => (num(r, 0), num(r, 1), r.getString(2), num(r, 3), num(r, 4),
        num(r, 5), r.getBoolean(6))).toSet
    assert(got === naive)
    // the zero-variance branch really fired
    assert(naive.exists(t => t._1 == 9101L && t._6 == 0L && !t._7))
  }

  test("window_ema matches a naive truncated geometric smoother (weights summed, not closed-form)") {
    val naive = byUser.toSeq.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (e, i) =>
        val lags = evs.slice(math.max(0, i - 7), i + 1).map(_.micro).reverse
        val n = lags.size.toLong
        val numr = lags.zipWithIndex.map { case (v, k) => v * (1L << (7 - k)) }.sum
        val den = lags.indices.map(k => 1L << (7 - k)).sum // Σ weights = 2^8 − 2^(8−n)
        val dev = e.micro * den - numr
        (u, e.id, fmtSec(e.sec), e.micro, n, numr, den, dev,
          math.abs(dev) > den * 500000L)
      }
    }.toSet
    val got = run("window_ema").collect()
      .map(r => (num(r, 0), num(r, 1), r.getString(2), num(r, 3), num(r, 4),
        num(r, 5), num(r, 6), num(r, 7), r.getBoolean(8))).toSet
    assert(got === naive)
  }

  test("window_cusum matches the LITERAL Page recursion, and the alarm gate is strict") {
    val naive = byUser.toSeq.flatMap { case (u, evs) =>
      val mu = math.floor(evs.map(_.micro).sum.toDouble / evs.size).toLong
      var s = 0L
      evs.map { e =>
        s = math.max(0L, s + (e.micro - mu - CusumDrift)) // the definition
        (u, e.id, fmtSec(e.sec), e.micro, mu, s, s > CusumThreshold)
      }
    }.toSet
    val got = run("window_cusum").collect()
      .map(r => (num(r, 0), num(r, 1), r.getString(2), num(r, 3), num(r, 4),
        num(r, 5), r.getBoolean(6))).toSet
    assert(got === naive)
    // the pinned boundary users: exactly-at-threshold silent, +1 alarms
    assert(naive.exists(t => t._1 == 9102L && t._6 == CusumThreshold && !t._7))
    assert(naive.exists(t => t._1 == 9103L && t._7))
  }

  test("window_skyline matches the QUADRATIC Pareto-dominance definition") {
    val pts = liRows.map(l => ((l.part % 64), l.priceC, l.qty)).distinct
    val naive = pts.filter { case (g, p, q) =>
      !pts.exists { case (g2, p2, q2) =>
        g2 == g && p2 <= p && q2 >= q && (p2 < p || q2 > q) }
    }.toSet
    val got = run("window_skyline").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2))).toSet
    assert(got === naive)
    // frontier tie pins: (900,12) dominates everything in its group —
    // the same-qty-pricier (1100,12), the same-price-lower-qty
    // (900,10), and the duplicate point (1000,10) after distinct
    assert(naive((44L, 900L, 12L)) && !naive((44L, 1100L, 12L)) &&
      !naive((44L, 1000L, 10L)) && !naive((44L, 900L, 10L)))
  }
}
