package graft.harness

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three remaining per-protein match-export surfaces of
  * interpro/oracle/matches.py: residue-site annotations
  * (matches.py:396-476), isoform/VARSPLIC match export
  * (matches.py:585-641) and TOAD fragment-group merge
  * (matches.py:692-746).
  *
  * All three are the same macro-shape — a big fact keyed by protein,
  * grouped and re-nested with an ORDER-sensitive inner sort — which the
  * reference streams through one ordered Oracle cursor per export. Here
  * each is one keyed aggregation: the per-protein cursor break becomes
  * groupBy(protein, ...), the in-loop dict nesting becomes
  * sort_array(collect_list(struct(...))) + transform, and the dimension
  * dictionaries the reference loads up front become broadcast-sized
  * derived columns. Partial aggregation combines map-side, so at 100 TB
  * each export is one shuffle of pre-combined (protein, signature)
  * groups — no ordered full-table cursor anywhere.
  */
object MatchExportQueries {
  type Q = (SparkSession, String) => DataFrame

  private val dbShorts: Column = array(
    lit("cdd"), lit("pfam"), lit("profile"), lit("smart"),
    lit("prosite"), lit("panther"), lit("sfld"))
  private val resLetters: Column = array(
    lit("H"), lit("C"), lit("D"), lit("E"),
    lit("K"), lit("R"), lit("S"), lit("T"))

  val queries: Map[String, Q] = Map(
    // export_residues (matches.py:396-476): SITE_MATCH rows nested per
    // protein -> signature -> description -> locations, with rows whose
    // description is NULL dropped ("No point in showing residue
    // annotations without a description", matches.py:440-441), the
    // signature name nullable (signatures.get, matches.py:453), the
    // dbcode resolved through the CV_DATABASE dictionary, and each
    // description's locations sorted by (start, end)
    // (_sort_residues, matches.py:470-476). One row per
    // (protein, signature, description); the deeper nesting into one
    // doc per protein is the agg_nested_map shape.
    "residues_sites" -> ((s, d) => {
      val sm = Tables.lineitem(s, d).select(
        concat(lit("P"), col("l_orderkey").cast("string")).as("protein_acc"),
        (col("l_partkey") % 500).as("sigkey"),
        (col("l_partkey") % 7).as("dbcode"),
        when(col("l_linenumber") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("site "), (col("l_suppkey") % 9).cast("string")))
          .as("descr"),
        element_at(resLetters, (col("l_suppkey") % 8 + 1).cast("int"))
          .as("res"),
        (col("l_linenumber") * 10 + col("l_suppkey") % 10).as("pos_start"),
        (col("l_linenumber") * 10 + col("l_suppkey") % 10
          + col("l_quantity").cast("long") % 5).as("pos_end"))
      sm.filter(col("descr").isNotNull)
        .groupBy(col("protein_acc"), col("sigkey"), col("descr"))
        .agg(sort_array(collect_list(
          struct(col("pos_start"), col("pos_end"), col("res")))).as("locs"))
        .select(
          col("protein_acc"),
          concat(lit("SIG"), col("sigkey").cast("string")).as("sig_acc"),
          // METHOD.NAME is NULL for some signatures (matches.py:428-431)
          when(col("sigkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("nm"), col("sigkey").cast("string")))
            .as("sig_name"),
          element_at(dbShorts, (col("sigkey") % 7 + 1).cast("int"))
            .as("db_short"),
          col("descr"),
          concat_ws(";", transform(col("locs"), r => concat(
            r("res"), lit("@"), r("pos_start").cast("string"),
            lit("-"), r("pos_end").cast("string")))).as("locations"))
    }),

    // export_isoforms (matches.py:585-641): VARSPLIC_MASTER inner-joined
    // to UNIPARC.PROTEIN on CRC64 (variants without a UniParc sequence
    // vanish), sequence = COALESCE(SEQ_SHORT, SEQ_LONG)
    // (matches.py:611), matches keyed by the composite
    // PROTEIN-VARIANT accession with unknown variants dropped
    // (matches.py:628-632 `except KeyError: continue`), and isoforms
    // that drew no matches still emitted (matches.py:638-641). The
    // match-classification kernel the reference then applies is K1
    // (kernel_match_merge); this query is the assembly dataflow.
    "isoforms_matches" -> ((s, d) => {
      val master = Tables.orders(s, d).select(
        concat(lit("P"), col("o_orderkey").cast("string")).as("protein_acc"),
        concat(lit("P"), col("o_orderkey").cast("string"), lit("-"),
          (col("o_orderkey") % 3 + 1).cast("string")).as("variant_acc"),
        (col("o_orderkey") % 4000).as("crc64"),
        (col("o_orderkey") % 497 + 50).as("length"))
      val uniparc = Tables.part(s, d).select(
        col("p_partkey").as("crc64"),
        // SEQ_SHORT is NULL for long sequences -> SEQ_LONG fallback
        coalesce(
          when(col("p_partkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("s"), substring(col("p_name"), 1, 8))),
          concat(lit("L"), col("p_partkey").cast("string"))).as("sequence"))
      val matches = Tables.lineitem(s, d).select(
        concat(lit("P"), col("l_orderkey").cast("string"), lit("-"),
          (col("l_linenumber") % 3 + 1).cast("string")).as("variant_acc"),
        (col("l_partkey") % 500).as("sigkey"))
      val perVar = matches.groupBy(col("variant_acc"))
        .agg(count(lit(1)).as("n_matches"),
          countDistinct(col("sigkey")).as("n_signatures"))
      master.join(uniparc, Seq("crc64"))
        .join(perVar, Seq("variant_acc"), "left_outer")
        .select(col("variant_acc"), col("protein_acc"), col("crc64"),
          col("length"), substring(col("sequence"), 1, 12).as("seq_prefix"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("n_signatures"), lit(0L)).as("n_signatures"))
    }),

    // export_features (matches.py:478-583): FEATURE_MATCH scanned with
    // the Pfam-N dbcode excluded at the cursor (WHERE DBCODE != 'd',
    // matches.py:492 — here a parquet-pushed filter), the feature
    // dimension resolving db name + evidence (with the Pfam-N
    // "Maskformer" override, matches.py:529-531), NULL seq features
    // defaulting to "Consensus Disorder Prediction" for MobiDB-lite
    // only (matches.py:567-569), per-feature locations sorted by
    // (start, end) and the protein's features ranked by their leftmost
    // location (matches.py:575-583; the reference's tie order is dict
    // insertion, made deterministic here with (db, acc) tiebreakers).
    "features_matches" -> ((s, d) => {
      val dbcodes = array(lit("m"), lit("f"), lit("p"), lit("s"), lit("d"))
      val dbnames = array(lit("mobidblt"), lit("funfam"), lit("phobius"),
        lit("signalp"), lit("pfam-n"))
      val evid = array(lit("PREDICTION"), lit("HMM"), lit("PREDICTION"),
        lit("PREDICTION"), lit("UNKNOWN"))
      // WHERE DBCODE != 'd' (matches.py:492) — an int predicate on the
      // scan column the db index derives from, so it pushes to parquet
      val fm = Tables.lineitem(s, d)
        .filter(col("l_partkey") % 5 =!= 4)
        .select(
          concat(lit("P"), col("l_orderkey").cast("string")).as("protein_acc"),
          (col("l_partkey") % 5).as("dbidx"),
          (col("l_partkey") % 400).as("fkey"),
          (col("l_linenumber") * 3 % 500).as("pos_from"),
          (col("l_linenumber") * 3 % 500 + col("l_quantity").cast("long") % 30)
            .as("pos_to"),
          when(col("l_suppkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("sf"), (col("l_suppkey") % 5).cast("string")))
            .as("seq_feature"))
      val merged = fm
        .groupBy(col("protein_acc"), col("dbidx"), col("fkey"))
        .agg(sort_array(collect_list(struct(
          col("pos_from"), col("pos_to"),
          // the MobiDB-lite default fires at append time
          // (matches.py:567-569): null stays null for other dbs
          when(col("seq_feature").isNull && col("dbidx") === 0,
            lit("Consensus Disorder Prediction"))
            .otherwise(col("seq_feature")).as("feat")))).as("locs"))
      val dbname = element_at(dbnames, (col("dbidx") + 1).cast("int"))
      merged.select(
        col("protein_acc"),
        element_at(dbcodes, (col("dbidx") + 1).cast("int")).as("dbcode"),
        concat(lit("FT"), col("fkey").cast("string")).as("feature_acc"),
        concat(lit("fn"), col("fkey").cast("string")).as("name"),
        when(col("fkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("feature "), col("fkey").cast("string")))
          .as("descr"),
        dbname.as("db_name"),
        // the Pfam-N -> Maskformer dim override (matches.py:529-531);
        // structurally dead downstream of the dbcode filter, exactly as
        // in the reference where 'd' matches never reach the merge
        when(lower(dbname) === "pfam-n", lit("Maskformer"))
          .otherwise(element_at(evid, (col("dbidx") + 1).cast("int")))
          .as("evidence"),
        concat_ws(";", transform(col("locs"), l => concat(
          l("pos_from").cast("string"), lit("-"),
          l("pos_to").cast("string"), lit(":"),
          coalesce(l("feat"), lit(""))))).as("locations"),
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("protein_acc"))
            .orderBy(col("locs")(0)("pos_from"), col("locs")(0)("pos_to"),
              col("dbidx"), col("fkey"))).as("feature_rank"))
    }),

    // _merge_toad_matches (matches.py:692-746): TOAD match rows grouped
    // into locations by (signature, GROUP_ID); a single-fragment
    // location is CONTINUOUS, a multi-fragment location labels its
    // position-sorted fragments C_TERMINAL_DISC / NC_TERMINAL_DISC /
    // N_TERMINAL_DISC (first / middle / last, matches.py:715-723 — the
    // reference reuses DC_STATUSES["C"/"NC"/"N"] in that order). The
    // group's score rides the group key (one model score per predicted
    // group). One row per (protein, signature, group).
    "toad_matches" -> ((s, d) => {
      val tm = Tables.lineitem(s, d).select(
        concat(lit("P"), col("l_orderkey").cast("string")).as("protein_acc"),
        concat(lit("SIG"), (col("l_partkey") % 300).cast("string"))
          .as("sig_acc"),
        (col("l_suppkey") % 4).as("group_id"),
        // score is a function of the group key, as in TOAD_MATCH where
        // every fragment row of a predicted group carries its score
        (round((col("l_orderkey") % 89) + (col("l_suppkey") % 4) * 0.1, 1))
          .as("score"),
        (col("l_linenumber") * 7 % 400).as("pos_from"),
        (col("l_linenumber") * 7 % 400 + 10
          + col("l_quantity").cast("long") % 20).as("pos_to"))
      tm.groupBy(col("protein_acc"), col("sig_acc"), col("group_id"))
        .agg(max(col("score")).as("score"),
          sort_array(collect_list(struct(col("pos_from"), col("pos_to"))))
            .as("frags"))
        .select(col("protein_acc"), col("sig_acc"), col("group_id"),
          col("score"),
          concat_ws(";", transform(col("frags"), (f, i) => concat(
            f("pos_from").cast("string"), lit("-"),
            f("pos_to").cast("string"), lit(":"),
            when(size(col("frags")) === 1, lit("CONTINUOUS"))
              .when(i === 0, lit("C_TERMINAL_DISC"))
              .when(i === size(col("frags")) - 1, lit("N_TERMINAL_DISC"))
              .otherwise(lit("NC_TERMINAL_DISC"))))).as("fragments"))
    })
  )

  val oracle: Map[String, String] = Map(
    "residues_sites" ->
      """WITH sm AS (
           SELECT 'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc,
                  l_partkey % 500 AS sigkey,
                  CASE WHEN l_linenumber % 5 = 0 THEN NULL
                       ELSE 'site ' || CAST(l_suppkey % 9 AS VARCHAR)
                  END AS descr,
                  ['H','C','D','E','K','R','S','T']
                    [CAST(l_suppkey % 8 + 1 AS INT)] AS res,
                  l_linenumber * 10 + l_suppkey % 10 AS pos_start,
                  l_linenumber * 10 + l_suppkey % 10
                    + CAST(l_quantity AS BIGINT) % 5 AS pos_end
           FROM lineitem)
         SELECT protein_acc,
                'SIG' || CAST(sigkey AS VARCHAR) AS sig_acc,
                CASE WHEN sigkey % 3 = 0 THEN NULL
                     ELSE 'nm' || CAST(sigkey AS VARCHAR) END AS sig_name,
                ['cdd','pfam','profile','smart','prosite','panther','sfld']
                  [CAST(sigkey % 7 + 1 AS INT)] AS db_short,
                descr,
                string_agg(res || '@' || CAST(pos_start AS VARCHAR) || '-' ||
                           CAST(pos_end AS VARCHAR), ';'
                           ORDER BY pos_start, pos_end, res) AS locations
         FROM sm
         WHERE descr IS NOT NULL
         GROUP BY protein_acc, sigkey, descr""",
    "isoforms_matches" ->
      """WITH master AS (
           SELECT 'P' || CAST(o_orderkey AS VARCHAR) AS protein_acc,
                  'P' || CAST(o_orderkey AS VARCHAR) || '-' ||
                    CAST(o_orderkey % 3 + 1 AS VARCHAR) AS variant_acc,
                  o_orderkey % 4000 AS crc64,
                  o_orderkey % 497 + 50 AS length
           FROM orders),
         uniparc AS (
           SELECT p_partkey AS crc64,
                  COALESCE(CASE WHEN p_partkey % 5 = 0 THEN NULL
                                ELSE 's' || substr(p_name, 1, 8) END,
                           'L' || CAST(p_partkey AS VARCHAR)) AS sequence
           FROM part),
         pervar AS (
           SELECT 'P' || CAST(l_orderkey AS VARCHAR) || '-' ||
                    CAST(l_linenumber % 3 + 1 AS VARCHAR) AS variant_acc,
                  COUNT(*) AS n_matches,
                  COUNT(DISTINCT l_partkey % 500) AS n_signatures
           FROM lineitem GROUP BY 1)
         SELECT m.variant_acc, m.protein_acc, m.crc64, m.length,
                substr(u.sequence, 1, 12) AS seq_prefix,
                COALESCE(v.n_matches, 0) AS n_matches,
                COALESCE(v.n_signatures, 0) AS n_signatures
         FROM master m
              JOIN uniparc u USING (crc64)
              LEFT JOIN pervar v USING (variant_acc)""",
    "features_matches" ->
      """WITH fm AS (
           SELECT 'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc,
                  l_partkey % 5 AS dbidx,
                  l_partkey % 400 AS fkey,
                  l_linenumber * 3 % 500 AS pos_from,
                  l_linenumber * 3 % 500
                    + CAST(l_quantity AS BIGINT) % 30 AS pos_to,
                  CASE WHEN l_suppkey % 3 = 0 THEN NULL
                       ELSE 'sf' || CAST(l_suppkey % 5 AS VARCHAR)
                  END AS seq_feature
           FROM lineitem
           WHERE l_partkey % 5 <> 4),
         wf AS (
           SELECT protein_acc, dbidx, fkey, pos_from, pos_to,
                  CASE WHEN seq_feature IS NULL AND dbidx = 0
                       THEN 'Consensus Disorder Prediction'
                       ELSE seq_feature END AS feat
           FROM fm),
         grp AS (
           SELECT protein_acc, dbidx, fkey,
                  string_agg(CAST(pos_from AS VARCHAR) || '-' ||
                             CAST(pos_to AS VARCHAR) || ':' ||
                             COALESCE(feat, ''), ';'
                             ORDER BY pos_from, pos_to,
                                      feat ASC NULLS FIRST) AS locations,
                  MIN(pos_from * 1024 + pos_to) AS mk
           FROM wf
           GROUP BY protein_acc, dbidx, fkey)
         SELECT protein_acc,
                ['m','f','p','s','d'][CAST(dbidx + 1 AS INT)] AS dbcode,
                'FT' || CAST(fkey AS VARCHAR) AS feature_acc,
                'fn' || CAST(fkey AS VARCHAR) AS name,
                CASE WHEN fkey % 7 = 0 THEN NULL
                     ELSE 'feature ' || CAST(fkey AS VARCHAR)
                END AS descr,
                ['mobidblt','funfam','phobius','signalp','pfam-n']
                  [CAST(dbidx + 1 AS INT)] AS db_name,
                CASE WHEN ['mobidblt','funfam','phobius','signalp','pfam-n']
                            [CAST(dbidx + 1 AS INT)] = 'pfam-n'
                     THEN 'Maskformer'
                     ELSE ['PREDICTION','HMM','PREDICTION','PREDICTION',
                           'UNKNOWN'][CAST(dbidx + 1 AS INT)]
                END AS evidence,
                locations,
                ROW_NUMBER() OVER (PARTITION BY protein_acc
                                   ORDER BY mk // 1024, mk % 1024,
                                            dbidx, fkey) AS feature_rank
         FROM grp""",
    "toad_matches" ->
      """WITH tm AS (
           SELECT 'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc,
                  'SIG' || CAST(l_partkey % 300 AS VARCHAR) AS sig_acc,
                  l_suppkey % 4 AS group_id,
                  CAST(round((l_orderkey % 89) + (l_suppkey % 4) * 0.1, 1)
                       AS DOUBLE) AS score,
                  l_linenumber * 7 % 400 AS pos_from,
                  l_linenumber * 7 % 400 + 10
                    + CAST(l_quantity AS BIGINT) % 20 AS pos_to
           FROM lineitem),
         pos AS (
           SELECT protein_acc, sig_acc, group_id, score, pos_from, pos_to,
                  ROW_NUMBER() OVER w AS i,
                  COUNT(*) OVER (PARTITION BY protein_acc, sig_acc, group_id)
                    AS n
           FROM tm
           WINDOW w AS (PARTITION BY protein_acc, sig_acc, group_id
                        ORDER BY pos_from, pos_to)),
         lab AS (
           SELECT protein_acc, sig_acc, group_id, score, pos_from, pos_to, i,
                  CASE WHEN n = 1 THEN 'CONTINUOUS'
                       WHEN i = 1 THEN 'C_TERMINAL_DISC'
                       WHEN i = n THEN 'N_TERMINAL_DISC'
                       ELSE 'NC_TERMINAL_DISC' END AS st
           FROM pos)
         SELECT protein_acc, sig_acc, group_id, MAX(score) AS score,
                string_agg(CAST(pos_from AS VARCHAR) || '-' ||
                           CAST(pos_to AS VARCHAR) || ':' || st, ';'
                           ORDER BY i) AS fragments
         FROM lab
         GROUP BY protein_acc, sig_acc, group_id"""
  )
}
