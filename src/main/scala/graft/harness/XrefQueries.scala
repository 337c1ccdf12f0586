package graft.harness

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship aggregation reproduced end-to-end
  * (SURVEY.md §3.3, interpro/xrefs/entries.py:258-505): multiway join
  * of protein-keyed datasets → invert the keying to entry → one wide
  * aggregation producing counts, distinct sets and nested per-category
  * maps — the whole fork/queue/spill machinery of the reference
  * collapses into one shuffle. Plus the skew-safe two-phase (salted)
  * variant of the ancestor rollup (SURVEY.md §4.6: the taxonomy root
  * receives every row; salting splits the hot key across reducers).
  */
object XrefQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // entry2xrefs bundle: lineitem=matches, orders=proteins,
    // customer=taxa, nation/region=lineage dims. Inverts
    // protein-keyed rows to entry-keyed xref bundles in one shuffle.
    "xref_entry_bundle" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey"),
          concat(lit("IPR"), (col("l_partkey") % 7).cast("string")).as("entry_acc"),
          col("l_quantity"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
        col("c_mktsegment"))
      val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("entry_acc"))
        .agg(
          count(lit(1)).as("n_matches"),
          countDistinct(col("l_orderkey")).as("n_proteins"),
          countDistinct(col("c_nationkey")).as("n_taxa"),
          concat_ws(",", sort_array(collect_set(col("n_name")))).as("taxa"),
          sum(col("l_quantity")).as("sum_qty"))
    }),

    // the same per-category nested map the taxa xrefs build
    // (interpro/xrefs/taxa.py:44-123), entry-keyed: db→count rendered
    // as a sorted "k:v" list inside the aggregation
    "xref_entry_dbmap" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 3 === 0)
        .select(
          concat(lit("IPR"), (col("l_partkey") % 7).cast("string")).as("entry_acc"),
          col("l_returnflag").as("db"))
      val inner = li.groupBy(col("entry_acc"), col("db")).agg(count(lit(1)).as("n"))
      inner.groupBy(col("entry_acc"))
        .agg(concat_ws(",",
          sort_array(collect_list(
            concat(col("db"), lit(":"), col("n").cast("string"))))).as("db_counts"))
    }),

    // Domain organisation: per protein, the ordered domain string →
    // md5 fingerprint → group by fingerprint with count + oldest
    // protein as representative (interpro/xrefs/domorgs.py:53-91; the
    // reference's sha1 becomes md5 — DuckDB has no sha1 — same
    // semantics). The reference merges per-worker dicts driver-side;
    // here it is one agg + one regroup, no driver state.
    "xref_domorg" -> ((s, d) => {
      // no pre-distinct: collect_set dedupes, and its PARTIAL
      // aggregation already shrinks the map side — a distinct() first
      // is a second full-fact shuffle for nothing
      val doms = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          concat(lit("PF"), (col("l_partkey") % 50).cast("string")).as("dom"))
      val ida = doms.groupBy(col("l_orderkey"))
        .agg(concat_ws("-", sort_array(collect_set(col("dom")))).as("ida"))
        .select(col("l_orderkey"), col("ida"), md5(col("ida")).as("ida_id"))
      ida.groupBy(col("ida_id"))
        .agg(min(col("ida")).as("ida"), count(lit(1)).as("n_proteins"),
          min(col("l_orderkey")).as("repr_protein"))
        .filter(col("n_proteins") > 1)
    }),

    // Mart: the webfront counts-JSON per entry
    // (interpro/mysql/entries.py:374-389) — the xref bundle rendered
    // as the JSON document the warehouse tables store.
    "mart_entry_counts" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_partkey") % 3 === 0)
        .select(col("l_orderkey"),
          concat(lit("IPR"), (col("l_partkey") % 7).cast("string")).as("entry_acc"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("entry_acc"))
        .agg(count(lit(1)).as("m"), countDistinct(col("l_orderkey")).as("p"),
          countDistinct(col("c_nationkey")).as("t"))
        .select(col("entry_acc"),
          concat(lit("{\"matches\":"), col("m").cast("string"),
            lit(",\"proteins\":"), col("p").cast("string"),
            lit(",\"taxa\":"), col("t").cast("string"), lit("}")).as("counts"))
    }),

    // mart_protein_counts (mysql/proteins.py:296-504): the PROTEIN-side
    // counts JSON assembled at webfront_protein insert time — the
    // mirror of mart_entry_counts with the fan-in inverted (per-protein
    // instead of per-entry). The reference walks one protein at a time
    // against seven KV stores; here each piece is a keyed agg on the
    // protein id and the domain-architecture count is a census join on
    // the architecture string (the domorgs_store "count" field).
    // Nested {"entries": {db: n}} renders through to_json over a
    // sort_array'd map so the JSON text is deterministic cross-engine.
    // Analogs: protein=order, matches=lineitems, member db=partkey%5,
    // clan(set)=partkey%11, structure=supplier, isoform=high-quantity
    // line, proteome membership=has a pfam match.
    "mart_protein_counts" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey").as("protein_id"),
        element_at(array(lit("cdd"), lit("panther"), lit("pfam"),
          lit("prosite"), lit("smart")),
          (col("l_partkey") % 5 + 1).cast("int")).as("db"),
        (col("l_partkey") % 11).as("clan"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
      // ONE protein-keyed pass over the fact: the member-db domain is
      // a fixed 5-value vocabulary, so per-db counts are conditional
      // counts (no (protein, db) pre-shuffle), and the distincts run
      // as bounded collect_sets (clan<=11, structures<=7 per protein)
      // instead of multi-countDistinct — which Catalyst plans as a 4x
      // Expand of the full fact. Before: two full-fact shuffles, one
      // 4x-expanded. After: one, un-expanded (A/B'd at 30x).
      val dbNames = Seq("cdd", "panther", "pfam", "prosite", "smart")
      val aggs: Seq[org.apache.spark.sql.Column] = Seq(
        size(collect_set(col("clan"))).cast("long").as("sets"),
        size(collect_set(col("l_suppkey"))).cast("long").as("structures"),
        size(collect_set(when(col("l_quantity") > 40, col("l_linenumber"))))
          .cast("long").as("isoforms"),
        max(when(col("db") === "pfam", 1L).otherwise(0L)).as("proteomes")) ++
        dbNames.map(db => count(when(col("db") === db, 1)).as(s"n_$db"))
      val agg1 = li.groupBy(col("protein_id")).agg(aggs.head, aggs.tail: _*)
      // dbNames is alphabetical, so the present-db struct array is
      // already sorted — same map order / ida text as the previous
      // sort_array(collect_list) form
      val present = filter(
        array(dbNames.map(db =>
          struct(lit(db).as("db"), col(s"n_$db").as("n"))): _*),
        e => e("n") > 0)
      val entries = agg1.select(col("protein_id"), col("sets"),
        col("structures"), col("isoforms"), col("proteomes"),
        map_from_entries(present).as("entries"),
        concat_ws("-", transform(present, e => e("db"))).as("ida"))
      // domain-architecture census: how many proteins share this
      // protein's member-db architecture (domorgs "count")
      val daCounts = entries.groupBy(col("ida"))
        .agg(count(lit(1)).as("da_n"))
      entries.join(daCounts, Seq("ida"))
        .select(col("protein_id"),
          to_json(struct(
            col("da_n").as("domain_architectures"), col("entries"),
            col("isoforms"), col("proteomes"), col("sets"),
            col("structures"), lit(1L).as("taxa"))).as("counts"))
    }),

    // A10 under skew: two-phase salted rollup — partial aggregate on
    // (node, salt), final on node. Same result as agg_rollup_lineage;
    // the extra narrow shuffle is what keeps the root taxon from
    // pinning a single reducer at 10^9 rows.
    "agg_rollup_salted" -> ((s, d) => {
      val o = Tables.orders(s, d); val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val fact = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .withColumn("lineage", array(
          concat(lit("R"), col("n_regionkey").cast("string")),
          concat(lit("N"), col("c_nationkey").cast("string")),
          concat(lit("C"), col("c_custkey").cast("string"))))
        .select(explode(col("lineage")).as("node_id"), col("o_totalprice"))
        .withColumn("__salt", pmod(hash(col("o_totalprice")), lit(16)))
      val partial = fact.groupBy(col("node_id"), col("__salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast("decimal(12,2)")).as("pt"))
      partial.groupBy(col("node_id"))
        .agg(sum(col("pn")).as("n_orders"),
          sum(col("pt")).cast("double").as("total"))
    })
  )

  val oracle: Map[String, String] = Map(
    "xref_entry_bundle" ->
      """WITH f AS (
           SELECT 'IPR' || CAST(l_partkey % 7 AS VARCHAR) AS entry_acc,
                  l_orderkey, l_quantity, c_nationkey, n_name
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
           WHERE l_partkey % 3 = 0),
         t AS (
           SELECT entry_acc, string_agg(nm, ',' ORDER BY nm) AS taxa
           FROM (SELECT DISTINCT entry_acc, n_name AS nm FROM f)
           GROUP BY entry_acc)
         SELECT f.entry_acc, COUNT(*) AS n_matches,
                COUNT(DISTINCT l_orderkey) AS n_proteins,
                COUNT(DISTINCT c_nationkey) AS n_taxa,
                ANY_VALUE(t.taxa) AS taxa,
                SUM(l_quantity) AS sum_qty
         FROM f JOIN t ON f.entry_acc = t.entry_acc
         GROUP BY f.entry_acc""",
    "xref_entry_dbmap" ->
      """SELECT entry_acc,
                string_agg(db || ':' || CAST(n AS VARCHAR), ',' ORDER BY db) AS db_counts
         FROM (SELECT 'IPR' || CAST(l_partkey % 7 AS VARCHAR) AS entry_acc,
                      l_returnflag AS db, COUNT(*) AS n
               FROM lineitem WHERE l_partkey % 3 = 0
               GROUP BY 1, 2)
         GROUP BY entry_acc""",
    "xref_domorg" ->
      """WITH doms AS (SELECT DISTINCT l_orderkey,
                              'PF' || CAST(l_partkey % 50 AS VARCHAR) AS dom
                       FROM lineitem),
           ida AS (SELECT l_orderkey,
                          array_to_string(list_sort(list(dom)), '-') AS ida
                   FROM doms GROUP BY l_orderkey)
         SELECT md5(ida) AS ida_id, MIN(ida) AS ida, COUNT(*) AS n_proteins,
                MIN(l_orderkey) AS repr_protein
         FROM ida GROUP BY md5(ida)
         HAVING COUNT(*) > 1""",
    "mart_entry_counts" ->
      """SELECT entry_acc,
                '{"matches":' || CAST(COUNT(*) AS VARCHAR) ||
                ',"proteins":' || CAST(COUNT(DISTINCT l_orderkey) AS VARCHAR) ||
                ',"taxa":' || CAST(COUNT(DISTINCT c_nationkey) AS VARCHAR) || '}'
                  AS counts
         FROM (SELECT 'IPR' || CAST(l_partkey % 7 AS VARCHAR) AS entry_acc,
                      l_orderkey, c_nationkey
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
               WHERE l_partkey % 3 = 0)
         GROUP BY entry_acc""",
    "mart_protein_counts" ->
      """WITH li AS (
           SELECT l_orderkey AS protein_id,
                  ['cdd','panther','pfam','prosite','smart']
                    [CAST(l_partkey % 5 + 1 AS INT)] AS db,
                  l_partkey % 11 AS clan, l_suppkey, l_linenumber, l_quantity
           FROM lineitem),
         perdb AS (SELECT protein_id, db, COUNT(*) AS n
                   FROM li GROUP BY 1, 2),
         ent AS (SELECT protein_id,
                        '{' || string_agg('"' || db || '":' || CAST(n AS VARCHAR),
                                          ',' ORDER BY db) || '}' AS entries,
                        string_agg(db, '-' ORDER BY db) AS ida
                 FROM perdb GROUP BY protein_id),
         da AS (SELECT ida, COUNT(*) AS da_n FROM ent GROUP BY ida),
         per AS (SELECT protein_id,
                        COUNT(DISTINCT clan) AS sets,
                        COUNT(DISTINCT l_suppkey) AS structures,
                        COUNT(DISTINCT CASE WHEN l_quantity > 40
                                            THEN l_linenumber END) AS isoforms,
                        MAX(CASE WHEN db = 'pfam' THEN 1 ELSE 0 END) AS proteomes
                 FROM li GROUP BY protein_id)
         SELECT e.protein_id,
                '{"domain_architectures":' || CAST(da_n AS VARCHAR) ||
                ',"entries":' || e.entries ||
                ',"isoforms":' || CAST(isoforms AS VARCHAR) ||
                ',"proteomes":' || CAST(proteomes AS VARCHAR) ||
                ',"sets":' || CAST(sets AS VARCHAR) ||
                ',"structures":' || CAST(structures AS VARCHAR) ||
                ',"taxa":1}' AS counts
         FROM ent e JOIN da USING (ida) JOIN per USING (protein_id)""",
    "agg_rollup_salted" ->
      """WITH fact AS (
           SELECT o_orderkey, o_totalprice, c_custkey, c_nationkey, n_regionkey
           FROM orders JOIN customer ON o_custkey = c_custkey
                       JOIN nation ON c_nationkey = n_nationkey)
         SELECT 'R' || CAST(n_regionkey AS VARCHAR) AS node_id, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
         FROM fact GROUP BY 1
         UNION ALL
         SELECT 'N' || CAST(c_nationkey AS VARCHAR), COUNT(*),
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         FROM fact GROUP BY 1
         UNION ALL
         SELECT 'C' || CAST(c_custkey AS VARCHAR), COUNT(*),
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         FROM fact GROUP BY 1"""
  )
}
