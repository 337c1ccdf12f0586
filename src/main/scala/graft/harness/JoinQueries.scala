package graft.harness

import graft.Tables
import graft.ops.RelOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join operators (SURVEY.md §2.3 J1-J11). Big-big joins stay
  * shuffle-based equi-joins (sort-merge under AQE); genuinely small
  * dimensions get explicit `broadcast()` hints, matching the reference's
  * hand impl (dims as in-memory dicts, big sides as co-sorted zip joins).
  */
object JoinQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  val queries: Map[String, Q] = Map(
    // J1: inner equi-join of two fact tables
    // (METHOD×CV_DATABASE, interpro/oracle/entries.py:721-754).
    "join_inner" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("o_orderstatus"), col("l_extendedprice"))
    }),

    // J2: left outer join with a filtered right side
    // (entries×descriptions, interpro/oracle/entries.py:119-133).
    "join_left" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 5000).select("c_custkey", "c_name")
      o.join(rich, o("o_custkey") === rich("c_custkey"), "left_outer")
        .select(col("o_orderkey"), col("c_name"))
    }),

    // J3: broadcast hash join against a small dimension (dict probe of
    // member2clan/signatures, interpro/xrefs/clans.py:102-114).
    "join_broadcast" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      // exact decimal sum, then one cast to double so the value renders
      // identically in Spark parquet and the DuckDB oracle (a Decimal
      // "123.40" vs float "123.4" hash-mismatch otherwise)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
             sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
    }),

    // J4: multiway sort-merge join over co-keyed datasets (7-store zip
    // join on protein_acc, interpro/xrefs/entries.py:157-254).
    "join_multiway" -> ((s, d) => {
      val r = Tables.region(s, d); val n = Tables.nation(s, d)
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
             sum(dec2(col("l_extendedprice")) *
                 dec2(lit(1.0) - col("l_discount"))).cast("double").as("revenue"))
    }),

    // J5: left semi join (keep rows whose key exists in dim,
    // interpro/oracle/entries.py:197-199).
    "join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hot = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(hot, o("o_orderkey") === hot("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    }),

    // J6: anti join (retired signatures NOT IN,
    // interpro/oracle/entries.py:596-603).
    "join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J7: as-of join — map each event to the next release freeze (bisect
    // over freeze dates, interpro/oracle/entries.py:330-346). Freezes =
    // day boundaries of the event month (small bounded dim → broadcast
    // sorted-array probe, zero shuffle of the fact side).
    "join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
      val freezes = Tables.events(s, d).select(date_trunc("day", col("ts")).as("f"))
      RelOps.asofNext(e, col("ts"), freezes, col("f"), "freeze_ts")
        .filter(col("freeze_ts").isNotNull)
        .select(col("event_id"),
          date_format(col("freeze_ts"), "yyyy-MM-dd").as("freeze_day"))
    }),

    // J7b: BIG-BIG as-of join via union + running window — when the
    // right side is not a broadcastable dimension, tag both sides,
    // union, and carry the latest right-side timestamp down each
    // (key, time)-sorted partition: one shuffle, no per-row probe.
    // Here: every event gets the most recent 'purchase' ts (<=) of
    // its user.
    "join_asof_union" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("src"),
          lit(null).cast("long").as("event_id"))
      val all = e.select(col("user_id"), col("ts"), lit(1).as("src"),
        col("event_id")).unionByName(purchases)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("src"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      all.withColumn("last_purchase_ts",
          last(when(col("src") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("src") === 1)
        .select(col("event_id"),
          date_format(col("last_purchase_ts"), "yyyy-MM-dd HH:mm:ss")
            .as("last_purchase"))
    }),

    // J8: interval-overlap join with an equi key (match locations vs PDB
    // chain segments, interpro/utils.py:21-40). Catalyst plans the equi
    // part as SMJ; the overlap predicate is a residual filter.
    "join_interval" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").as("ls"),
        (col("l_linenumber") + floor(col("l_quantity") / 10).cast("int")).as("le"))
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        (col("o_custkey") % 5).cast("int").as("os"),
        ((col("o_custkey") % 5) + 3).cast("int").as("oe"))
      RelOps.intervalJoin(li, o, li("l_orderkey") === o("o_orderkey"),
          col("ls"), col("le"), col("os"), col("oe"))
        .select(col("l_orderkey"), col("l_linenumber"), col("ls"), col("le"),
          col("os"), col("oe"),
          (least(col("le"), col("oe")) - greatest(col("ls"), col("os")) + 1)
            .as("overlap_len"))
    }),

    // J8b: KEYLESS interval-overlap join via bin bucketing
    // (SURVEY.md §4.1): each interval explodes into its covering
    // W-wide bins, bins equi-join, each pair kept once at the overlap's
    // left-edge bin — a shuffled equi-join instead of the
    // broadcast-nested-loop a raw theta join would plan.
    "join_interval_binned" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 1000).cast("long").as("ls"))
        .withColumn("le", col("ls") + (col("l_linenumber") * 10).cast("long"))
      val o = Tables.orders(s, d).filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), (col("o_custkey") % 1000).cast("long").as("os"))
        .withColumn("oe", col("os") + 5L)
      RelOps.binnedIntervalJoin(li, o, binWidth = 100, "ls", "le", "os", "oe")
        .select(col("l_orderkey"), col("l_linenumber"), col("ls"), col("le"),
          col("o_orderkey"), col("os"), col("oe"),
          (least(col("le"), col("oe")) - greatest(col("ls"), col("os")) + 1)
            .as("overlap_len"))
    }),

    // J9: self-join with key inequality for pair enumeration
    // (entry-vs-entry overlap pairs, interpro/xrefs/entries.py:62-64).
    "join_self_pairs" -> ((s, d) => {
      val a = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber").as("ln_a"), col("l_partkey").as("pk_a"))
      val b = Tables.lineitem(s, d).select(
        col("l_orderkey").as("ok_b"), col("l_linenumber").as("ln_b"),
        col("l_partkey").as("pk_b"))
      a.join(b, a("l_orderkey") === b("ok_b") && col("ln_a") < col("ln_b"))
        .select("l_orderkey", "ln_a", "ln_b", "pk_a", "pk_b")
    })
  )

  val oracle: Map[String, String] = Map(
    "join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_orderstatus, l_extendedprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "join_left" ->
      """SELECT o_orderkey, c.c_name
         FROM orders o LEFT JOIN
           (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
           ON o.o_custkey = c.c_custkey""",
    "join_broadcast" ->
      """SELECT p_brand, COUNT(*) AS n,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "join_multiway" ->
      """SELECT r_name, n_name, COUNT(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                         CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "join_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderpriority = '1-URGENT')""",
    "join_asof" ->
      """WITH freezes AS (SELECT DISTINCT date_trunc('day', ts) AS f FROM events)
         SELECT event_id, strftime(MIN(f), '%Y-%m-%d') AS freeze_day
         FROM events JOIN freezes ON f >= ts
         GROUP BY event_id""",
    "join_asof_union" ->
      """SELECT e.event_id,
                (SELECT strftime(MAX(p.ts), '%Y-%m-%d %H:%M:%S')
                 FROM events p
                 WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                   AND p.ts <= e.ts) AS last_purchase
         FROM events e""",
    "join_interval" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
                            l_linenumber AS ls,
                            l_linenumber + CAST(floor(l_quantity / 10) AS INT) AS le
                     FROM lineitem),
              o AS (SELECT o_orderkey,
                           CAST(o_custkey % 5 AS INT) AS os,
                           CAST(o_custkey % 5 + 3 AS INT) AS oe
                    FROM orders)
         SELECT l_orderkey, l_linenumber, ls, le, os, oe,
                least(le, oe) - greatest(ls, os) + 1 AS overlap_len
         FROM li JOIN o ON l_orderkey = o_orderkey AND ls <= oe AND os <= le""",
    "join_interval_binned" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
                            CAST(l_partkey % 1000 AS BIGINT) AS ls,
                            CAST(l_partkey % 1000 + l_linenumber * 10 AS BIGINT) AS le
                     FROM lineitem WHERE l_orderkey % 100 = 0),
              o AS (SELECT o_orderkey,
                           CAST(o_custkey % 1000 AS BIGINT) AS os,
                           CAST(o_custkey % 1000 + 5 AS BIGINT) AS oe
                    FROM orders WHERE o_orderkey % 50 = 0)
         SELECT l_orderkey, l_linenumber, ls, le, o_orderkey, os, oe,
                least(le, oe) - greatest(ls, os) + 1 AS overlap_len
         FROM li JOIN o ON ls <= oe AND os <= le""",
    "join_self_pairs" ->
      """SELECT a.l_orderkey, a.l_linenumber AS ln_a, b.l_linenumber AS ln_b,
                a.l_partkey AS pk_a, b.l_partkey AS pk_b
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber"""
  )
}
