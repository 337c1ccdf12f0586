package graft.harness

import graft.Tables
import graft.ops.RelOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window / gaps-and-islands / top-k operators (SURVEY.md §2.5 W1-W4,
  * §2.6 O3). Every window ordering carries a unique tiebreak column so
  * results are total-ordered and deterministic under both engines.
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Ordered-sequence funnel over the events table (the windowFunnel
    // analytics primitive): per user, the earliest view, the earliest
    // click AFTER that view, and the earliest purchase AFTER that
    // click — both within 24h of the first view. Three same-key
    // conditional-min aggregations chained by equi-joins on user_id
    // (every exchange hashes the same key, so the cascade co-locates);
    // timestamps compare as exact micros, render as strings (the
    // events discipline). depth = how far down the funnel the user got.
    "window_funnel" -> ((s, d) => {
      val dayUs = 86400000000L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val t2 = ev.join(t1, Seq("user_id"))
        .filter(col("event_type") === "click" &&
          col("us") > col("t1") && col("us") <= col("t1") + lit(dayUs))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val t3 = ev.join(t1, Seq("user_id")).join(t2, Seq("user_id"))
        .filter(col("event_type") === "purchase" &&
          col("us") > col("t2") && col("us") <= col("t1") + lit(dayUs))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      t1.join(t2, Seq("user_id"), "left_outer")
        .join(t3, Seq("user_id"), "left_outer")
        .select(col("user_id"),
          date_format(timestamp_micros(col("t1")), "yyyy-MM-dd HH:mm:ss")
            .as("first_view"),
          date_format(timestamp_micros(col("t2")), "yyyy-MM-dd HH:mm:ss")
            .as("first_click"),
          date_format(timestamp_micros(col("t3")), "yyyy-MM-dd HH:mm:ss")
            .as("first_purchase"),
          (lit(1) + when(col("t2").isNotNull, 1).otherwise(0) +
            when(col("t3").isNotNull, 1).otherwise(0)).as("depth"))
    }),

    // Cohort retention — the second classic event-analytics rollup:
    // users cohorted by first-activity day, counted distinct per
    // (cohort, day-offset). One min-per-user agg, one co-keyed join,
    // one (cohort, offset) distinct-count: the whole triangle is two
    // shuffles on user_id plus the final rollup.
    "window_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("day0"))
      ev.join(first, Seq("user_id"))
        .select(col("user_id"), col("day0"),
          datediff(col("day"), col("day0")).as("offset"))
        .groupBy(col("day0"), col("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("day0"), "yyyy-MM-dd").as("cohort"),
          col("offset"), col("n_users"))
    }),

    // Rolling 7-day distinct actives (the WAU primitive). Distinct
    // aggregates can't ride a window frame in either engine, so the
    // scale-correct plan is the contribution expansion: each distinct
    // (user, day) activity posts itself to the 7 trailing target days
    // it keeps alive, then one countDistinct per target day. The
    // expansion is a flat 7x of the (user, day) DISTINCT set (already
    // tiny next to raw events), the final agg dedupes map-side — no
    // per-day self-joins, no window over an unbounded user set.
    "window_rolling_distinct" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select(col("day").as("target")).distinct()
      ud.select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("o"))
        .select(col("user_id"), date_add(col("day"), col("o")).as("target"))
        .join(days, Seq("target"))
        .groupBy(col("target"))
        .agg(countDistinct(col("user_id")).as("wau_7d"))
        .select(date_format(col("target"), "yyyy-MM-dd").as("day"),
          col("wau_7d"))
    }),

    // W1/A6: ROW_NUMBER dedup — latest order per customer (first AI name
    // / latest signature, interpro/oracle/entries.py:96-109).
    // Rank-1 over an all-descending unique ordering IS an argmax, so
    // the operator lowers to max(struct(ord...)) — a partial/final
    // aggregate whose map-side partials collapse a hot key before the
    // shuffle (struct buffers sort- rather than hash-aggregate, but
    // the sorts are partition-local) — instead of a window, whose hot
    // partition sorts on ONE task (SCALE.md's named 100× straggler:
    // 276k rows for the sf1z hot customer). Output is bit-identical
    // (o_orderkey makes the order total, so rank-1 is unique); the
    // oracle keeps the row_number form; WindowShapeSpec pins the plan
    // (no Window, no global sort, partial agg) and the row-for-row
    // equality to the window form. General top-k per group keeps the
    // heap operator (window_topk_custom / TopKPerGroupExec).
    "window_rownum" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("m"))
        .select(col("o_custkey"), col("m.o_orderkey").as("latest_order"),
          date_format(col("m.o_orderdate"), "yyyy-MM-dd").as("latest_day"))),

    // W2: interval condensation via gaps-and-islands (condense_locations
    // sweep, interpro/oracle/matches.py:60-103): islands of chained
    // [start,end] per order, then per-island extents. Duplicate
    // intervals collapse to one weighted row FIRST — the synthetic
    // data has fully-identical rows, and a window order with
    // indistinguishable ties lets different engines (or different
    // window operators in the same engine) number island-boundary
    // rows differently; distinct (s, e) restores a total order.
    "window_islands" -> ((s, d) => {
      val iv = Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").as("s"),
        (col("l_linenumber") + floor(col("l_quantity") / 10).cast("int")).as("e"))
        .groupBy(col("l_orderkey"), col("s"), col("e"))
        .agg(count(lit(1)).as("cnt"))
      RelOps.islands(iv, Seq(col("l_orderkey")), col("s"), col("e"),
          col("e"), "island")
        .groupBy(col("l_orderkey"), col("island"))
        .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
          sum(col("cnt")).as("n_merged"))
    }),

    // W4/O3: bounded ranked selection per group (best 20 domains by
    // coverage, interpro/oracle/matches.py:136-141) — top 3 items per
    // order by price with unique tiebreak.
    "window_topk_group" -> ((s, d) =>
      RelOps.topKPerGroup(Tables.lineitem(s, d),
          Seq(col("l_orderkey")),
          Seq(col("l_extendedprice").desc, col("l_linenumber")), 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rk")),

    // W4 through the custom whole-operator (LocalTopKPerGroup →
    // TopKPerGroupExec via the injected planner strategy): bounded
    // per-group heap instead of a full partition sort — same contract,
    // same oracle shape as window_topk_group.
    "window_topk_custom" -> ((s, d) =>
      RelOps.topKPerGroupExact(Tables.lineitem(s, d),
          Seq(col("l_orderkey")),
          Seq(col("l_extendedprice").desc, col("l_linenumber")), 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rk")),

    // Lead/lag analytics (SURVEY §2.5 notes the reference has none —
    // Spark supplies them free): inter-event gap per user.
    "window_lead_lag" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .select(col("user_id"), col("event_id"), col("gap_us"))
    }),

    // Ranking-family windows beyond row_number: quartiles (ntile),
    // relative rank and cumulative distribution per priority class —
    // the percentile surface of §2.5. Total order (price, key) keeps
    // ties deterministic for the hash gate.
    "window_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"), col("o_orderkey").as("okey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"))
    }),

    // Explicit window FRAMES: a ROWS-frame running total and a
    // RANGE-frame peer-inclusive total over the same order — the two
    // differ exactly on tied order keys, which is what the frame
    // surface is about. Exact decimal keeps the running sums
    // deterministic under any partition order.
    "window_running_sum" -> ((s, d) => {
      val wRows = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wRange = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.orders(s, d).select(
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wRows)
          .cast("double").as("run_rows"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wRange)
          .cast("double").as("run_range"))
    }),

    // ROLLUP grouping sets: subtotal lattice over (returnflag,
    // linestatus) — OLAP surface beyond the reference's hand-rolled
    // per-level aggregations.
    "agg_grouping_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))),

    // CUBE grouping sets: the full subtotal lattice (both one-dim
    // margins, unlike ROLLUP's prefix lattice).
    "agg_grouping_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))),

    // O3 global: top-k with total order.
    "topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    // Rolling z-score anomaly flag per user over the trailing 5-event
    // frame — the metric-monitoring shape (rolling mean/std, flag
    // |z| > 2). Exactness discipline: values pin to integer micros at
    // the scan; n/Σv are BIGINT but Σv² multiplies THROUGH DECIMAL —
    // a bare BIGINT vu*vu wraps silently at |value| >= ~1360 in
    // non-ANSI Spark while DuckDB BIGINT multiplication raises an
    // out-of-range error on overflow (only SUM promotes to HUGEINT),
    // so the oracle widens the operand with CAST(vu AS HUGEINT)*vu
    // and Spark squares through DECIMAL — both engines keep the
    // squared sum exact in a wide integer type over the same domain
    // instead of trusting the value domain. The z formula is ONE
    // shared SQL string (the agg_moments pattern) with a var<=0
    // guard, pinned to integer micros before the gate. One
    // user-keyed window pass, no self-joins.
    "window_anomaly" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vu"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("vu")).over(w))
        .withColumn("s2",
          sum(col("vu").cast(DecimalType(19, 0)) * col("vu")).over(w))
        .withColumn("z_micro", expr(AnomalyZ))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("vu"), col("n"), col("z_micro"),
          (abs(col("z_micro")) > 2000000L).as("anomaly"))
    }),

    // Truncated exponential moving average per user: ema_t =
    // Σ_{k=0..7} 2^(7−k)·v_{t−k} / (2^8 − 2^(8−n)) over the last
    // n ≤ 8 events — the geometric-decay smoother monitoring
    // pipelines run, truncated at 8 lags so the weighted sum is
    // EXACT in 64-bit integers (no recursive float state to drift
    // cross-engine). Ships num/den as exact BIGINTs (micro values ×
    // power-of-two weights), dev = vu·den − num is the exact signed
    // deviation of the current value from the EMA scaled by den, and
    // the spike gate |dev| > den·500000 (half a value unit) is an
    // integer comparison — zero IEEE terms anywhere. One user-keyed
    // window pass (the 7 lags share one sort), no self-joins: at
    // 100 TB this is a single hash-partitioned sort per key.
    "window_ema" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val num = (0 to 7).map(k =>
        coalesce(lag(col("vu"), k).over(w), lit(0L)) * lit(1L << (7 - k)))
        .reduce(_ + _)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vu"))
        .withColumn("n", count(lit(1)).over(w.rowsBetween(-7, 0)))
        .withColumn("num", num)
        .withColumn("den", lit(256L) -
          call_function("shiftleft", lit(1L), (lit(8) - col("n")).cast("int")))
        .withColumn("dev", col("vu") * col("den") - col("num"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("vu"), col("n"), col("num"), col("den"), col("dev"),
          (abs(col("dev")) > col("den") * lit(500000L)).as("spike"))
    }),

    // One-sided CUSUM changepoint detection per user (Page 1954): the
    // sequential upward-shift detector S_t = max(0, S_{t-1} + x_t)
    // with x_t = vu_t − mean_u − k. The recursion is NOT directly
    // window-expressible, but the classic prefix identity
    //   S_t = P_t − min(0, min_{j<=t} P_j),  P_t = Σ_{i<=t} x_i
    // turns it into two passes over ONE user-keyed sort: a running
    // sum and a running min — everything stays exact BIGINT micros
    // (per-user baseline = floor(Σvu/n), an integer both engines
    // compute from the same exact sum). At 100 TB this is a single
    // hash-partitioned sort per user key, no state, no self-joins —
    // the batch replay of what a streaming monitor would keep as two
    // longs of state.
    "window_cusum" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val base = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vu"))
      val mu = base.groupBy(col("user_id"))
        .agg(floor(sum(col("vu")).cast("double") / count(lit(1)))
          .cast("long").as("mu"))
      base.join(mu, Seq("user_id"))
        .withColumn("x", col("vu") - col("mu") - lit(CusumDrift))
        .withColumn("p", sum(col("x")).over(w))
        .withColumn("s_micro",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("vu"), col("mu"), col("s_micro"),
          (col("s_micro") > lit(CusumThreshold)).as("alarm"))
    }),

    // 2-D skyline (Pareto frontier) per part bucket: the dominance
    // query — keep (price, qty) points no other point beats on both
    // axes (lower price AND higher quantity, one strict). The naive
    // form is a quadratic self-anti-join; sorted by (price asc, qty
    // desc) over DISTINCT points it collapses to ONE window pass — a
    // point is dominated iff the running max of qty over strictly
    // preceding rows reaches it (any preceding row with equal qty
    // must have strictly lower price after the distinct, so >= is
    // exactly dominance). Prices pin to integer cents, quantities are
    // integral — exact in any engine; one hash-partitioned sort per
    // group at any scale.
    "window_skyline" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g"))
        .orderBy(col("price_c").asc, col("qty").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 64).cast("long").as("g"),
          floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long")
            .as("price_c"),
          col("l_quantity").cast("long").as("qty"))
        .distinct()
        .withColumn("pm", max(col("qty")).over(w))
        .filter(col("pm").isNull || col("pm") < col("qty"))
        .select(col("g"), col("price_c"), col("qty"))
    })
  )

  // CUSUM reference drift k (micro units above the per-user mean that
  // don't count as shift) and alarm threshold h — both exact BIGINT
  // micros; value domain is ~0..490 units so k=10, h=100 units
  private val CusumDrift = 10000000L
  private val CusumThreshold = 100000000L

  // z-score formula shared VERBATIM with the DuckDB oracle (the
  // agg_moments discipline): one string, two parsers, identical IEEE
  // chain over the exact integer frame sums
  private val AnomalyZ = {
    val m = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val v = s"((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - $m*$m)"
    s"CASE WHEN $v <= 0 THEN 0 ELSE " +
      s"CAST(floor((CAST(vu AS DOUBLE) - $m) / sqrt($v) * 1e6 + 0.5) " +
      "AS BIGINT) END"
  }

  val oracle: Map[String, String] = Map(
    "window_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
          f AS (SELECT user_id, MIN(day) AS day0 FROM e GROUP BY user_id)
          SELECT strftime(day0, '%Y-%m-%d') AS cohort,
                 CAST(date_diff('day', day0, day) AS INT) AS offset,
                 CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
          FROM e JOIN f USING (user_id)
          GROUP BY day0, date_diff('day', day0, day)""",
    "window_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                     FROM events),
          days AS (SELECT DISTINCT day AS target FROM ud),
          c AS (SELECT user_id, day + CAST(o AS INT) AS target
                FROM ud, UNNEST(range(0, 7)) AS u(o))
          SELECT strftime(c.target, '%Y-%m-%d') AS day,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_7d
          FROM c JOIN days ON c.target = days.target
          GROUP BY c.target""",
    "window_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                    FROM events),
          t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY user_id),
          t2 AS (SELECT e.user_id, MIN(us) AS t2
                 FROM e JOIN t1 USING (user_id)
                 WHERE event_type = 'click' AND us > t1
                   AND us <= t1 + 86400000000 GROUP BY e.user_id),
          t3 AS (SELECT e.user_id, MIN(us) AS t3
                 FROM e JOIN t1 USING (user_id) JOIN t2 USING (user_id)
                 WHERE event_type = 'purchase' AND us > t2
                   AND us <= t1 + 86400000000 GROUP BY e.user_id)
          SELECT t1.user_id,
                 strftime(make_timestamp(t1), '%Y-%m-%d %H:%M:%S')
                   AS first_view,
                 strftime(make_timestamp(t2), '%Y-%m-%d %H:%M:%S')
                   AS first_click,
                 strftime(make_timestamp(t3), '%Y-%m-%d %H:%M:%S')
                   AS first_purchase,
                 CAST(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                        + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END
                      AS INT) AS depth
          FROM t1 LEFT JOIN t2 USING (user_id)
                  LEFT JOIN t3 USING (user_id)""",
    "window_rownum" ->
      """SELECT o_custkey, o_orderkey AS latest_order,
                strftime(o_orderdate, '%Y-%m-%d') AS latest_day
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1""",
    "window_islands" ->
      """WITH iv AS (
           SELECT l_orderkey, s, e, COUNT(*) AS cnt
           FROM (SELECT l_orderkey, l_linenumber AS s,
                        l_linenumber + CAST(floor(l_quantity / 10) AS INT) AS e
                 FROM lineitem)
           GROUP BY 1, 2, 3),
         flagged AS (
           SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS nf
           FROM (SELECT *, MAX(e) OVER (PARTITION BY l_orderkey
                   ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
                 FROM iv)),
         isl AS (
           SELECT *, CAST(SUM(nf) OVER (PARTITION BY l_orderkey
                   ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
           FROM flagged)
         SELECT l_orderkey, island, MIN(s) AS island_start, MAX(e) AS island_end,
                CAST(SUM(cnt) AS BIGINT) AS n_merged
         FROM isl GROUP BY l_orderkey, island""",
    "window_topk_group" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rk
         FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                      row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_extendedprice DESC, l_linenumber) AS rk
               FROM lineitem)
         WHERE rk <= 3""",
    "window_lead_lag" ->
      """SELECT user_id, event_id,
                epoch_us(ts) - lag(epoch_us(ts), 1)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         FROM events""",
    "window_ntile" ->
      """SELECT o_orderpriority AS prio, o_orderkey AS okey,
                ntile(4) OVER w AS quartile,
                round(percent_rank() OVER w, 6) AS prank,
                round(cume_dist() OVER w, 6) AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)""",
    "agg_grouping_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls,
                COUNT(*) AS n, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "agg_grouping_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                COALESCE(l_linestatus, 'ALL') AS ls,
                COUNT(*) AS n, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "window_running_sum" ->
      """SELECT o_custkey AS ck, o_orderkey AS ok,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS run_rows,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                  AS run_range
         FROM orders""",
    "window_topk_custom" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, rk
         FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
                      row_number() OVER (PARTITION BY l_orderkey
                        ORDER BY l_extendedprice DESC, l_linenumber) AS rk
               FROM lineitem)
         WHERE rk <= 3""",
    "topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "window_anomaly" ->
      s"""WITH b AS (SELECT user_id, event_id, ts,
                            CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vu
                     FROM events),
          w AS (SELECT user_id, event_id, ts, vu,
                       CAST(COUNT(*) OVER fr AS BIGINT) AS n,
                       CAST(SUM(vu) OVER fr AS BIGINT) AS s1,
                       SUM(CAST(vu AS HUGEINT) * vu) OVER fr AS s2
                FROM b WINDOW fr AS (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
          z AS (SELECT user_id, event_id,
                       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                       vu, n, $AnomalyZ AS z_micro
                FROM w)
          SELECT user_id, event_id, ts_s, vu, n, z_micro,
                 abs(z_micro) > 2000000 AS anomaly
          FROM z""",
    "window_ema" -> {
      val lags = (0 to 7).map(k =>
        s"COALESCE(lag(vu, $k) OVER o, 0) * ${1L << (7 - k)}").mkString(" +\n  ")
      s"""WITH b AS (SELECT user_id, event_id, ts,
                            CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vu
                     FROM events),
          w AS (SELECT user_id, event_id, ts, vu,
                       CAST(COUNT(*) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS n,
                       $lags AS num
                FROM b WINDOW o AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
          g AS (SELECT user_id, event_id,
                       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                       vu, n, num,
                       256 - (1 << CAST(8 - n AS INT)) AS den
                FROM w)
          SELECT user_id, event_id, ts_s, vu, n, num, den,
                 vu * den - num AS dev,
                 abs(vu * den - num) > den * 500000 AS spike
          FROM g"""
    },
    "window_cusum" ->
      s"""WITH b AS (SELECT user_id, event_id, ts,
                            CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vu
                     FROM events),
          m AS (SELECT user_id,
                       CAST(floor(CAST(SUM(vu) AS DOUBLE) / COUNT(*))
                         AS BIGINT) AS mu
                FROM b GROUP BY user_id),
          x AS (SELECT b.user_id, event_id, ts, vu, mu,
                       vu - mu - $CusumDrift AS x
                FROM b JOIN m USING (user_id)),
          p AS (SELECT user_id, event_id, ts, vu, mu,
                       CAST(SUM(x) OVER fr AS BIGINT) AS p
                FROM x WINDOW fr AS (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          r AS (SELECT user_id, event_id, ts, vu, mu, p,
                       MIN(p) OVER fr AS pmin
                FROM p WINDOW fr AS (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT user_id, event_id,
                 strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, vu, mu,
                 p - least(CAST(0 AS BIGINT), pmin) AS s_micro,
                 p - least(CAST(0 AS BIGINT), pmin) > $CusumThreshold
                   AS alarm
          FROM r""",
    "window_skyline" ->
      """WITH pts AS (SELECT DISTINCT CAST(l_partkey % 64 AS BIGINT) AS g,
                             CAST(floor(l_extendedprice * 100 + 0.5)
                               AS BIGINT) AS price_c,
                             CAST(l_quantity AS BIGINT) AS qty
                      FROM lineitem),
          m AS (SELECT g, price_c, qty,
                       MAX(qty) OVER (PARTITION BY g
                         ORDER BY price_c ASC, qty DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pm
                FROM pts)
          SELECT g, price_c, qty FROM m
          WHERE pm IS NULL OR pm < qty"""
  )
}
