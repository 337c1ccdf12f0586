package graft.harness

import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scans, filters, projections, sorts, set ops and scalar functions
  * (SURVEY.md §2.1 S1-S2, §2.2 P1-P7, §2.6 O1, §2.7 U1-U4, §2.8 F1-F10).
  *
  * Every query aliases computed columns identically to its DuckDB oracle
  * SQL (driver hash-compares after sorting columns by name). Money sums
  * are cast to DECIMAL(12,2) *before* aggregation on both sides so the
  * comparison is exact, not float-order-dependent.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // S1/P1: projection + pushed-down predicate (reference pushes SELECT
    // lists + WHERE into Oracle, interpro/oracle/matches.py:250-256).
    "scan_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")),

    // P2: equality/IN filters (interpro/oracle/entries.py:133).
    "filter_in" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O") &&
                col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")),

    // P4: regex predicate (PANTHER/FunFam patterns,
    // interpro/oracle/matches.py:321,359).
    "filter_regex" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").rlike("^(small|large) .*(bolt|widget)$"))
        .select("p_partkey", "p_name", "p_type")),

    // P5/P7: derived columns + conditional rewrite
    // (interpro/oracle/proteins.py:25-33, taxa.py:20-31).
    "project_derived" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderstatus") === "F").as("is_final"),
        when(col("o_totalprice") > 1500, "big").otherwise("small").as("size_class"),
        concat(lit("O-"), col("o_orderkey").cast("string")).as("acc"))),

    // P6: distinct (uniprot/proteins.py:191-205).
    "distinct_rows" -> ((s, d) =>
      Tables.lineitem(s, d).select("l_orderkey", "l_suppkey").distinct()),

    // S2/O1: global sort (ORDER BY PROTEIN_AC scans,
    // interpro/oracle/proteins.py:21).
    "sort_global" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    // U1: union of heterogeneous sources (matches ∪ feature matches,
    // interpro/oracle/matches.py:249-257).
    "setop_union" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        concat(lit("C"), col("c_custkey").cast("string")).as("node_id"),
        col("c_nationkey").cast("int").as("nationkey"))
      val sup = Tables.supplier(s, d).select(
        concat(lit("S"), col("s_suppkey").cast("string")).as("node_id"),
        col("s_nationkey").cast("int").as("nationkey"))
      c.unionByName(sup)
    }),

    // U3: set intersection (residue overlap test,
    // interpro/oracle/matches.py:194-201).
    "setop_intersect" -> ((s, d) => {
      // Same set as INTERSECT of the two filtered projections, in ONE
      // pass: Catalyst plans Intersect as a left-semi join whose two
      // children each re-run the lineitem⋈orders join (2 joins + 2
      // extra exchanges). Joining once and flag-aggregating per
      // partkey computes the identical distinct-partkey set — the
      // status filter is pushed to the orders scan, the join runs
      // once, and one keyed agg replaces the semi-join.
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderkey"), col("o_orderstatus"))
      li.select(col("l_orderkey"), col("l_partkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_partkey"))
        .agg(max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("__f"),
          max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("__o"))
        .filter(col("__f") === 1 && col("__o") === 1)
        .select(col("l_partkey"))
    }),

    // U4: set difference as validation (integrated - known must be empty,
    // interpro/mysql/databases.py:299-312).
    "setop_except" -> ((s, d) =>
      Tables.lineitem(s, d).select("l_partkey")
        .except(Tables.part(s, d).filter(col("p_size") < 10).select("p_partkey"))),

    // F1: string split/parse (fragment strings "s-e-S,s-e-N",
    // interpro/oracle/matches.py:33-53).
    "fn_split_parse" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        element_at(split(col("p_name"), " "), 1).as("adjective"),
        element_at(split(col("p_name"), " "), 2).as("noun"),
        size(split(col("p_name"), " ")).as("n_tokens"))),

    // F2: regex extract/replace ([PMID:123]→[cite:PUB],
    // interpro/oracle/entries.py:695-715).
    "fn_regex" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cnum"),
        regexp_replace(col("c_name"), "Customer#", "C-").as("tag"))),

    // F4: concat (IDA '-'.join, interpro/xrefs/domorgs.py:53-60).
    "fn_concat" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("tag"))),

    // F5: hash-of-sorted-concat = the IDA fingerprint
    // (sha1('-'.join(domains)), interpro/xrefs/domorgs.py:61; md5 prefix
    // partitioning, interpro/oracle/lookup.py:194).
    "fn_hash" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(concat_ws("-",
          transform(sort_array(collect_list(col("l_partkey"))),
            x => x.cast("string"))).as("ida"))
        .select(col("l_orderkey"), col("ida"),
          md5(col("ida")).as("ida_md5"),
          substring(md5(col("ida")), 1, 3).as("md5_prefix"))),

    // F6: date formatting (TO_CHAR(ts,'YYYY-MM-DD'),
    // interpro/oracle/proteins.py:18).
    "fn_datefmt" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n"))),

    // F7: math (log2/ratios, interpro/oracle/hmms.py:37,383-417).
    "fn_math" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        round(log2(col("o_totalprice")), 6).as("lg2"),
        round(sqrt(col("o_totalprice")), 6).as("sqrtp"),
        floor(col("o_totalprice") / 100).as("bucket"))),

    // F7b: bit arithmetic — mask/shift scalars + the bit_and/or/xor
    // aggregate family (flag-set folding, the reference ORs match
    // status bitmasks across fragments).
    "fn_bitops" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("rf"),
          col("l_orderkey").bitwiseAND(1023).as("m"))
        .groupBy(col("rf"))
        .agg(bit_and(col("m")).as("band"),
          bit_or(col("m")).as("bor"),
          bit_xor(col("m")).as("bxor"),
          sum(shiftleft(col("m"), 2) - shiftright(col("m"), 1)).as("shifted"))),

    // F8: array expansion for positional coverage
    // (coverage |= set(range(start,end)), interpro/oracle/matches.py:186-191).
    "fn_array" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          explode(sequence(col("l_linenumber"),
            col("l_linenumber") + floor(col("l_quantity") / 5).cast("int"))).as("pos"))
        .groupBy("l_orderkey")
        .agg(countDistinct(col("pos")).as("coverage"))),

    // F3: case / trim / pad (LOWER(DBSHORT), TRIM(NAME), LPAD CRC64,
    // interpro/oracle/entries.py:65-68,307-313).
    "fn_case_trim" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("padded"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"))),

    // F12: ordered sequence rebuild (residue one-letter concat into a
    // chain sequence, interpro7dw/pdbe.py:449-484).
    "fn_seq_rebuild" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("l_linenumber"), col("l_returnflag")))),
          r => r("l_returnflag"))).as("chain"))),

    // U2/U3: array-level set algebra (coverage |= set(...), residue
    // intersection, interpro/oracle/matches.py:186-201).
    "fn_array_setops" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), slice(toks, 1, 4).as("a"), slice(toks, -4, 4).as("b"))
        .select(col("doc_id"),
          concat_ws(",", array_sort(array_distinct(array_union(col("a"), col("b")))))
            .as("u"),
          concat_ws(",", array_sort(array_distinct(array_intersect(col("a"), col("b")))))
            .as("i"),
          concat_ws(",", array_sort(array_distinct(array_except(col("a"), col("b")))))
            .as("x"))
    }),

    // F9: map construction + merge + lookup (nested dict build
    // map[db][acc], interpro/xrefs/taxa.py:55-73): MapType built from
    // collected entries, probed with try_element_at.
    "fn_map" -> ((s, d) => {
      val inner = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      inner.groupBy(col("c_nationkey"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("c_mktsegment"), col("n")))))
          .as("m"))
        .select(col("c_nationkey"),
          size(col("m")).as("n_keys"),
          try_element_at(col("m"), lit("BUILDING")).as("building_n"),
          try_element_at(col("m"), lit("MACHINERY")).as("machinery_n"))
    }),

    // F10: JSON extraction (json.loads of clan alignments,
    // interpro/oracle/clans.py:56-74).
    "fn_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k")))
  )

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
         FROM lineitem WHERE l_quantity > 25""",
    "filter_in" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
         FROM orders
         WHERE o_orderstatus IN ('F','O') AND o_orderpriority <> '1-URGENT'""",
    "filter_regex" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE regexp_matches(p_name, '^(small|large) .*(bolt|widget)$')""",
    "project_derived" ->
      """SELECT o_orderkey,
                o_orderstatus = 'F' AS is_final,
                CASE WHEN o_totalprice > 1500 THEN 'big' ELSE 'small' END AS size_class,
                'O-' || CAST(o_orderkey AS VARCHAR) AS acc
         FROM orders""",
    "distinct_rows" ->
      "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem",
    "sort_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey""",
    "setop_union" ->
      """SELECT 'C' || CAST(c_custkey AS VARCHAR) AS node_id,
                CAST(c_nationkey AS INT) AS nationkey FROM customer
         UNION ALL
         SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node_id,
                CAST(s_nationkey AS INT) AS nationkey FROM supplier""",
    "setop_intersect" ->
      """SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'O'""",
    "setop_except" ->
      """SELECT l_partkey FROM lineitem
         EXCEPT
         SELECT p_partkey FROM part WHERE p_size < 10""",
    "fn_split_parse" ->
      """SELECT p_partkey,
                split_part(p_name, ' ', 1) AS adjective,
                split_part(p_name, ' ', 2) AS noun,
                len(string_split(p_name, ' ')) AS n_tokens
         FROM part""",
    "fn_regex" ->
      """SELECT c_custkey,
                regexp_extract(c_name, '([0-9]+)$', 1) AS cnum,
                regexp_replace(c_name, 'Customer#', 'C-') AS tag
         FROM customer""",
    "fn_concat" ->
      """SELECT c_custkey, concat_ws('|', c_name, c_mktsegment) AS tag
         FROM customer""",
    "fn_hash" ->
      """WITH ida AS (
           SELECT l_orderkey,
                  string_agg(CAST(l_partkey AS VARCHAR), '-' ORDER BY l_partkey) AS ida
           FROM lineitem GROUP BY l_orderkey)
         SELECT l_orderkey, ida, md5(ida) AS ida_md5,
                substr(md5(ida), 1, 3) AS md5_prefix
         FROM ida""",
    "fn_datefmt" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n
         FROM orders GROUP BY 1""",
    "fn_math" ->
      """SELECT o_orderkey,
                round(log2(o_totalprice), 6) AS lg2,
                round(sqrt(o_totalprice), 6) AS sqrtp,
                CAST(floor(o_totalprice / 100) AS BIGINT) AS bucket
         FROM orders""",
    "fn_bitops" ->
      """SELECT l_returnflag AS rf,
                bit_and(l_orderkey & 1023) AS band,
                bit_or(l_orderkey & 1023) AS bor,
                bit_xor(l_orderkey & 1023) AS bxor,
                CAST(SUM(((l_orderkey & 1023) << 2) - ((l_orderkey & 1023) >> 1))
                     AS BIGINT) AS shifted
         FROM lineitem GROUP BY 1""",
    "fn_array" ->
      """SELECT l_orderkey, COUNT(DISTINCT pos) AS coverage
         FROM (SELECT l_orderkey,
                      unnest(generate_series(l_linenumber,
                        l_linenumber + CAST(floor(l_quantity / 5) AS INT))) AS pos
               FROM lineitem)
         GROUP BY l_orderkey""",
    "fn_case_trim" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
                lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded,
                trim('  ' || p_name || '  ') AS trimmed
         FROM part""",
    "fn_seq_rebuild" ->
      """SELECT l_orderkey,
                string_agg(l_returnflag, '' ORDER BY l_linenumber, l_returnflag)
                  AS chain
         FROM lineitem GROUP BY l_orderkey""",
    "fn_array_setops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
              ab AS (SELECT doc_id, tk[1:4] AS a, tk[-4:] AS b FROM t)
         SELECT doc_id,
                COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))), ','),
                         '') AS u,
                COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(a, x -> list_contains(b, x)))), ','), '') AS i,
                COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS x
         FROM ab""",
    "fn_map" ->
      """SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_keys,
                MAX(CASE WHEN c_mktsegment = 'BUILDING' THEN n END) AS building_n,
                MAX(CASE WHEN c_mktsegment = 'MACHINERY' THEN n END) AS machinery_n
         FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
               FROM customer GROUP BY 1, 2)
         GROUP BY c_nationkey""",
    "fn_json" ->
      """SELECT event_type, COUNT(*) AS n,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
                MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type"""
  )
}
