package graft.harness

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture / warehouse-mutation operators. The reference
  * rebuilds its warehouse from scratch each release and DIFFS releases
  * at the aggregate level (interpro7dw release notes —
  * `agg_release_diff`); a Spark-native warehouse also needs the
  * row-level forms every incremental pipeline is built from:
  *
  *  - `merge_upsert`: MERGE a change batch (inserts/updates/deletes)
  *    into a base snapshot — ONE keyed full-outer join, no driver
  *    state, so the plan is a single co-partitioned shuffle at any
  *    scale (and a no-shuffle zipper when both sides are bucketed by
  *    the key, BucketingSpec's layout).
  *  - `cdc_snapshot_diff`: recover the change log FROM two snapshots
  *    (the inverse op): keyed full-outer join emitting
  *    insert/delete/update rows with the list of changed columns.
  *  - `scd2_history`: build a type-2 slowly-changing dimension from an
  *    event change log: collapse no-op changes, then assign
  *    [valid_from, valid_to) intervals, version numbers, and the
  *    current flag — two window passes over ONE user_id clustering
  *    (the second window reuses the first's partitioning, so the whole
  *    build is a single shuffle).
  */
object CdcQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic change batch derived from orders: keys ending 8-9
    * are "new" rows (absent from the base snapshot), every 7th
    * surviving key is an update (status rewrite), every 13th
    * non-updated key a delete.
    */
  private def baseAndChanges(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val base = o.filter(col("o_orderkey") % 10 < 8)
    val changes = o.filter(col("o_orderkey") % 10 >= 8)
      .withColumn("op", lit("upsert"))
      .unionByName(base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("op", lit("upsert")))
      .unionByName(base
        .filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("delete")))
    (base, changes)
  }

  val queries: Map[String, Q] = Map(

    // MERGE INTO semantics: one full-outer join on the key; a change
    // row wins over the base row, delete ops drop the key, unmatched
    // upserts insert. `action` records what the merge did per row —
    // the audit column an incremental pipeline publishes with each
    // snapshot.
    "merge_upsert" -> ((s, d) => {
      val (base, changes) = baseAndChanges(s, d)
      val b = base.select(col("o_orderkey").as("k"),
        col("o_custkey").as("b_cust"), col("o_orderstatus").as("b_status"))
      val c = changes.select(col("o_orderkey").as("k"),
        col("o_custkey").as("c_cust"), col("o_orderstatus").as("c_status"),
        col("op"))
      b.join(c, Seq("k"), "full_outer")
        .filter(coalesce(col("op"), lit("")) =!= "delete")
        .select(col("k").as("o_orderkey"),
          coalesce(col("c_cust"), col("b_cust")).as("o_custkey"),
          coalesce(col("c_status"), col("b_status")).as("o_orderstatus"),
          when(col("op").isNull, "kept")
            .when(col("b_cust").isNull, "inserted")
            .otherwise("updated").as("action"))
    }),

    // Row-level snapshot diff (the CDC extract): two releases of the
    // part dimension full-outer joined on the key; updates carry the
    // comma-joined list of changed columns so a downstream consumer
    // can subscribe per attribute. The "previous release" drops keys
    // ending in 0 (→ inserts), adds nothing (→ no deletes from cur),
    // and rewrites brand/size for every 3rd key (→ updates).
    "cdc_snapshot_diff" -> ((s, d) => {
      val cur = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val prev = cur.filter(col("p_partkey") % 10 =!= 0)
        .withColumn("p_brand",
          when(col("p_partkey") % 3 === 0, lit("Brand#00"))
            .otherwise(col("p_brand")))
        .withColumn("p_size",
          when(col("p_partkey") % 6 === 0, col("p_size") + 1)
            .otherwise(col("p_size")))
      val c = cur.select(col("p_partkey").as("k"), col("p_brand").as("cb"),
        col("p_size").as("cs"))
      val p = prev.select(col("p_partkey").as("k"), col("p_brand").as("pb"),
        col("p_size").as("ps"))
      c.join(p, Seq("k"), "full_outer")
        .withColumn("op",
          when(col("pb").isNull, "insert")
            .when(col("cb").isNull, "delete")
            .when(col("cb") =!= col("pb") || col("cs") =!= col("ps"), "update"))
        .filter(col("op").isNotNull)
        .select(col("k").as("p_partkey"), col("op"),
          when(col("op") === "update", concat_ws(",",
            when(col("cb") =!= col("pb"), lit("p_brand")),
            when(col("cs") =!= col("ps"), lit("p_size"))))
            .otherwise(lit("")).as("changed_cols"))
    }),

    // Type-2 dimension build: per user, the event_type stream ordered
    // by (ts, event_id) is the attribute's change log. Pass 1 drops
    // no-op changes (lag equal); pass 2 assigns versions and
    // [valid_from, valid_to) with lead(), is_current on the open row.
    // Both windows cluster on user_id → one exchange total.
    "scd2_history" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("state"),
          col("ts"), col("event_id"))
        .withColumn("prev", lag(col("state"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
      changes
        .withColumn("version", row_number().over(w))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("state"), col("version"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }))

  val oracle: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus
                       FROM orders WHERE o_orderkey % 10 < 8),
         changes AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, 'upsert' AS op
           FROM orders WHERE o_orderkey % 10 >= 8
           UNION ALL
           SELECT o_orderkey, o_custkey, 'U', 'upsert'
           FROM base WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, o_custkey, o_orderstatus, 'delete'
           FROM base WHERE o_orderkey % 7 <> 0 AND o_orderkey % 13 = 0)
         SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
                COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
                COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                CASE WHEN c.op IS NULL THEN 'kept'
                     WHEN b.o_orderkey IS NULL THEN 'inserted'
                     ELSE 'updated' END AS action
         FROM base b FULL OUTER JOIN changes c
           ON b.o_orderkey = c.o_orderkey
         WHERE COALESCE(c.op, '') <> 'delete'""",
    "cdc_snapshot_diff" ->
      """WITH cur AS (SELECT p_partkey, p_brand, p_size FROM part),
         prev AS (SELECT p_partkey,
                         CASE WHEN p_partkey % 3 = 0 THEN 'Brand#00'
                              ELSE p_brand END AS p_brand,
                         CASE WHEN p_partkey % 6 = 0 THEN p_size + 1
                              ELSE p_size END AS p_size
                  FROM cur WHERE p_partkey % 10 <> 0),
         j AS (SELECT COALESCE(c.p_partkey, p.p_partkey) AS p_partkey,
                      c.p_brand AS cb, c.p_size AS cs,
                      p.p_brand AS pb, p.p_size AS ps,
                      CASE WHEN p.p_partkey IS NULL THEN 'insert'
                           WHEN c.p_partkey IS NULL THEN 'delete'
                           WHEN c.p_brand <> p.p_brand
                             OR c.p_size <> p.p_size THEN 'update' END AS op
               FROM cur c FULL OUTER JOIN prev p
                 ON c.p_partkey = p.p_partkey)
         SELECT p_partkey, op,
                CASE WHEN op = 'update' THEN
                  array_to_string(list_filter(
                    [CASE WHEN cb <> pb THEN 'p_brand' END,
                     CASE WHEN cs <> ps THEN 'p_size' END],
                    x -> x IS NOT NULL), ',')
                ELSE '' END AS changed_cols
         FROM j WHERE op IS NOT NULL""",
    "scd2_history" ->
      """WITH c0 AS (SELECT user_id, event_type AS state, ts, event_id,
                            lag(event_type) OVER
                              (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
                     FROM events),
         ch AS (SELECT user_id, state, ts, event_id FROM c0
                WHERE prev IS NULL OR prev <> state)
         SELECT user_id, state,
                row_number() OVER w AS version,
                ts AS valid_from,
                lead(ts) OVER w AS valid_to,
                (lead(ts) OVER w IS NULL) AS is_current
         FROM ch
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")
}
