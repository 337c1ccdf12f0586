package graft

import org.apache.spark.sql.functions._

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Brute-force differentials for the CDC / event-analytics family:
  * merge_upsert, scd2_history, window_funnel, window_retention, and
  * the stateful stream_funnel. These five were gated ONLY by the
  * DuckDB oracle, which the same author wrote — a shared
  * misunderstanding of (say) funnel window inclusivity would pass both
  * sides. Here the truth is a naive Scala reimplementation over seeded
  * micro-tables written as a real sf-dir (orders.parquet /
  * events.parquet), so the actual harness queries run end-to-end
  * against an implementation that shares no code and no engine with
  * them (the CorpusOpsSpec posture applied to CDC/events).
  *
  * The micro-data is adversarial on the family's edge set: duplicate
  * (user, ts) rows force scd2's (ts, event_id) tie-break; hand-built
  * users pin the funnel's strict-lower / inclusive-upper window
  * bounds, clicks-before-view, purchase-without-click, and
  * purchase-after-window; retention sees multi-day gaps and single-day
  * users.
  */
class CdcEventDifferentialSpec extends SparkSpec {

  private val W = 86400000000L // funnel window (µs), must match the query
  private val Base = 1700000000L // whole-second epoch base (UTC)

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)
  private def fmtUs(us: Long): String = fmt.format(
    Instant.ofEpochSecond(us / 1000000L))

  // ---- seeded micro-tables -------------------------------------------

  private case class Ev(eventId: Long, sec: Long, userId: Long, etype: String)

  private lazy val microEvents: Seq[Ev] = {
    val rnd = new scala.util.Random(20160816L)
    val types = Array("view", "click", "purchase", "other")
    var id = 0L
    val organic = (1L to 80L).flatMap { u =>
      val n = 1 + rnd.nextInt(25)
      var last = 0L
      (0 until n).map { _ =>
        id += 1
        // 20% exact-tie timestamps to force the (ts, event_id) break
        val sec = if (last != 0L && rnd.nextDouble() < 0.2) last
                  else Base + rnd.nextInt(3 * 86400).toLong
        last = sec
        Ev(id, sec, u, types(rnd.nextInt(types.length)))
      }
    }
    val day = 86400L
    val pinned = Seq(
      // 9001: click exactly AT t1 (strictly-after bound → excluded),
      //       second click inside → that one wins
      Ev(90011, Base, 9001, "view"), Ev(90012, Base, 9001, "click"),
      Ev(90013, Base + 10, 9001, "click"),
      // 9002: click exactly at t1+W (inclusive upper bound → counts),
      //       purchase after t1+W (→ excluded, depth 2)
      Ev(90021, Base, 9002, "view"), Ev(90022, Base + day, 9002, "click"),
      Ev(90023, Base + day + 1, 9002, "purchase"),
      // 9003: click BEFORE the first view only → depth 1
      Ev(90031, Base + 100, 9003, "view"), Ev(90032, Base + 50, 9003, "click"),
      // 9004: purchase without any click → depth 1 (stage order binds)
      Ev(90041, Base, 9004, "view"), Ev(90042, Base + 20, 9004, "purchase"),
      // 9005: purchase between t1 and t2 → excluded (must follow t2)
      Ev(90051, Base, 9005, "view"), Ev(90052, Base + 30, 9005, "purchase"),
      Ev(90053, Base + 60, 9005, "click"), Ev(90054, Base + 90, 9005, "purchase"),
      // 9006: clicks only, never a view → absent from the funnel
      Ev(90061, Base, 9006, "click"), Ev(90062, Base + 5, 9006, "click"),
      // 9007: full depth-3 at the tightest legal spacing
      Ev(90071, Base, 9007, "view"), Ev(90072, Base + 1, 9007, "click"),
      Ev(90073, Base + 2, 9007, "purchase"))
    organic ++ pinned
  }

  private case class Ord(k: Long, cust: Long, status: String)

  private lazy val microOrders: Seq[Ord] = {
    val rnd = new scala.util.Random(416L)
    val statuses = Array("O", "F", "P")
    (1L to 400L).map(k => Ord(k, 1 + rnd.nextInt(50).toLong,
      statuses(rnd.nextInt(statuses.length))))
  }

  /** Writes the micro-tables as a real sf layout and returns the dir. */
  private lazy val microDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-diff").toString
    microEvents.map(e => (e.eventId, e.sec * 1000000L, e.userId, e.etype))
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), lit(0.0).as("value"),
        lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    microOrders.map(o => (o.k, o.cust, o.status))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        lit(0.0).as("o_totalprice"),
        expr("timestamp_micros(0)").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  // ---- naive truths ---------------------------------------------------

  /** Naive MERGE: the change batch (derived exactly as the query's
    * header documents) applied to the base snapshot key by key.
    */
  private def naiveMerge: Set[(Long, Long, String, String)] = {
    val base = microOrders.filter(_.k % 10 < 8).map(o => o.k -> o).toMap
    val upserts =
      microOrders.filter(_.k % 10 >= 8).map(o => o.k -> o.status) ++
      base.values.filter(_.k % 7 == 0).map(o => o.k -> "U")
    val deletes = base.values
      .filter(o => o.k % 7 != 0 && o.k % 13 == 0).map(_.k).toSet
    val custOf = microOrders.map(o => o.k -> o.cust).toMap
    val upserted = upserts.map { case (k, st) =>
      val action = if (base.contains(k)) "updated" else "inserted"
      (k, custOf(k), st, action)
    }
    val kept = (base.keySet -- deletes -- upserts.map(_._1))
      .map(k => (k, base(k).cust, base(k).status, "kept"))
    upserted.toSet ++ kept
  }

  /** Naive SCD2: per user, order by (ts, event_id), drop no-op
    * repeats, then number versions and close intervals.
    */
  private def naiveScd2: Set[(Long, String, Int, Long, Option[Long], Boolean)] =
    microEvents.groupBy(_.userId).flatMap { case (u, evs) =>
      val ordered = evs.sortBy(e => (e.sec, e.eventId))
      val changes = ordered.foldLeft(Vector.empty[Ev]) { (acc, e) =>
        if (acc.nonEmpty && acc.last.etype == e.etype) acc else acc :+ e
      }
      changes.zipWithIndex.map { case (e, i) =>
        val to = if (i + 1 < changes.size) Some(changes(i + 1).sec * 1000000L)
                 else None
        (u, e.etype, i + 1, e.sec * 1000000L, to, to.isEmpty)
      }
    }.toSet

  /** Naive funnel: t1 = first view; t2 = first click strictly after t1
    * and at or before t1+W; t3 = first purchase strictly after t2 and
    * at or before t1+W.
    */
  private def naiveFunnel: Set[(Long, String, Option[String], Option[String], Int)] =
    microEvents.groupBy(_.userId).flatMap { case (u, evs) =>
      val us = evs.map(e => (e.etype, e.sec * 1000000L))
      val views = us.collect { case ("view", t) => t }
      if (views.isEmpty) None else {
        val t1 = views.min
        val t2 = us.collect { case ("click", t)
          if t > t1 && t <= t1 + W => t } match {
          case s if s.nonEmpty => Some(s.min); case _ => None }
        val t3 = t2.flatMap(c => us.collect { case ("purchase", t)
          if t > c && t <= t1 + W => t } match {
          case s if s.nonEmpty => Some(s.min); case _ => None })
        val depth = 1 + t2.size + t3.size
        Some((u, fmtUs(t1), t2.map(fmtUs), t3.map(fmtUs), depth))
      }
    }.toSet

  /** Naive retention: cohort = each user's first active day; one row
    * per (cohort, day offset) counting distinct active users.
    */
  private def naiveRetention: Set[(String, Int, Long)] =
    microEvents.map { e =>
      val day = LocalDate.ofInstant(Instant.ofEpochSecond(e.sec), ZoneOffset.UTC)
      (e.userId, day)
    }.distinct.groupBy(_._1).toSeq.flatMap { case (u, days) =>
      val day0 = days.map(_._2).min(Ordering.by((d: LocalDate) => d.toEpochDay))
      days.map { case (_, d) =>
        (day0.toString, (d.toEpochDay - day0.toEpochDay).toInt, u) }
    }.groupBy(t => (t._1, t._2))
      .map { case ((c, o), us) => (c, o, us.map(_._3).distinct.size.toLong) }
      .toSet

  // ---- the differentials ----------------------------------------------

  test("merge_upsert matches a naive key-by-key MERGE") {
    val got = harness.CdcQueries.queries("merge_upsert")(spark, microDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(got === naiveMerge)
  }

  test("scd2_history matches a naive per-user interval fold") {
    val got = harness.CdcQueries.queries("scd2_history")(spark, microDir)
      .collect().map { r =>
        val toUs = if (r.isNullAt(4)) None
                   else Some(r.getTimestamp(4).getTime * 1000L)
        (r.getLong(0), r.getString(1), r.getInt(2),
          r.getTimestamp(3).getTime * 1000L, toUs, r.getBoolean(5))
      }.toSet
    assert(got === naiveScd2)
  }

  test("window_funnel matches a naive per-user stage walk") {
    val got = harness.WindowQueries.queries("window_funnel")(spark, microDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getInt(4))).toSet
    assert(got === naiveFunnel)
    // the pinned edges actually bind: depth per pinned user
    val depth = got.map(t => t._1 -> t._5).toMap
    assert(depth(9001L) === 2 && depth(9002L) === 2 && depth(9003L) === 1 &&
      depth(9004L) === 1 && depth(9005L) === 3 && depth(9007L) === 3)
    assert(!depth.contains(9006L))
  }

  test("stream_funnel's drained state matches the same naive walk") {
    val got = harness.StreamQueries.queries("stream_funnel")(spark, microDir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getInt(4))).toSet
    assert(got === naiveFunnel)
  }

  test("window_retention matches a naive cohort count") {
    val got = harness.WindowQueries.queries("window_retention")(spark, microDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === naiveRetention)
  }
}
