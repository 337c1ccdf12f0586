package graft.harness

import graft.Tables
import graft.ops.Loops.LoopOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GO-annotation flat-file exports (reference uniprot/goa.py:60-215),
  * the cross-release sequence-coverage diff that completes the
  * release-notes assembly (interpro/mysql/databases.py:262-330), and
  * the full per-entry interpro.xml document composition
  * (interpro/ftp/xmlfiles.py:77-455).
  *
  * Every GOA file is the same dataflow: a dimension-side dictionary
  * (entry -> GO terms, family/node -> GO terms) joined onto a fact
  * fanout, rendered as TSV lines by GoaExportSpec through
  * Sinks.writeTsvGz — the reference's driver-side nested loops
  * (goa.py:148-160) become keyed joins whose fanout happens in
  * executors.
  */
object GoaQueries {
  type Q = (SparkSession, String) => DataFrame

  /** entry -> GO dictionary (goa.py:152-156 reads entry.go_terms of
    * InterPro-db entries only; the db filter is the "qualifier"
    * gate). partkey%4==0 plays database=='interpro'.
    */
  private def goMap(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_partkey") % 4 === 0)
      .select(
        concat(lit("IPR"), (col("p_partkey") % 300).cast("string"))
          .as("entry_acc"),
        concat(lit("GO:"), lpad((col("p_partkey") % 40).cast("string"), 7, "0"))
          .as("go_id"))
      .distinct()

  val queries: Map[String, Q] = Map(
    // interpro2go2uniprot (goa.py:148-160): for each InterPro entry,
    // each of its GO terms crossed with each protein in the entry's
    // xrefs — a dictionary broadcast onto the protein fanout.
    "goa_ipr2go2uni" -> ((s, d) => {
      val prot = Tables.lineitem(s, d).filter(col("l_partkey") % 4 === 0)
        .select(
          concat(lit("IPR"), (col("l_partkey") % 300).cast("string"))
            .as("entry_acc"),
          concat(lit("P"), col("l_orderkey").cast("string"))
            .as("protein_acc"))
        .distinct()
      prot.join(broadcast(goMap(s, d)), "entry_acc")
        .select(col("entry_acc"), col("go_id"), col("protein_acc"))
    }),

    // pdb2interpro2go (goa.py:97-145): PDB chain -> taxon (chains
    // with no taxon mapping are skipped, goa.py:125-127), chain
    // matches filtered to InterPro entries, GO fanout, and the
    // chain's UniProt proteins with an EMPTY-string fallback when the
    // chain maps to none (goa.py:128-130 `proteins = ... or [""]`).
    "goa_pdb2ipr2go" -> ((s, d) => {
      val chains = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 2 === 0 && col("s_nationkey") % 7 =!= 0)
        .select(col("s_suppkey"),
          concat(lit("PDB"), col("s_suppkey").cast("string")).as("pdb_id"),
          element_at(array(lit("A"), lit("B"), lit("C")),
            (col("s_suppkey") % 3 + 1).cast("int")).as("chain"),
          concat(lit("N"), col("s_nationkey").cast("string")).as("taxon_id"))
      val cmatch = Tables.lineitem(s, d).filter(col("l_partkey") % 4 === 0)
        .select(col("l_suppkey").as("s_suppkey"),
          concat(lit("IPR"), (col("l_partkey") % 300).cast("string"))
            .as("entry_acc"))
        .distinct()
      // every third chain has no UniProt mapping — the goa.py:128-130
      // [""] fallback must fire structurally at every scale factor
      val protmap = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 10 === 1 && col("l_suppkey") % 3 =!= 0)
        .select(col("l_suppkey").as("s_suppkey"),
          concat(lit("P"), col("l_orderkey").cast("string"))
            .as("protein_acc"))
        .distinct()
      chains.join(cmatch, Seq("s_suppkey"))
        .join(broadcast(goMap(s, d)), Seq("entry_acc"))
        .join(protmap, Seq("s_suppkey"), "left_outer")
        .select(col("pdb_id"), col("chain"), col("taxon_id"),
          col("entry_acc"), col("go_id"),
          coalesce(col("protein_acc"), lit("")).as("protein_acc"))
    }),

    // treegrafter/panther2go (goa.py:163-215): the PANTHER
    // family/ancestral-node -> (tree node, GO terms) dictionary joined
    // onto matches that carry a FEATURE (ancestral node) — matches
    // whose (family, node) is absent from the dictionary are dropped
    // (goa.py:203-206), and the family's InterPro integration renders
    // '-' when absent (goa.py:208). The reference reads `MATCH
    // PARTITION (MATCH_DBCODE_V)` (goa.py:192-196) — a partition-
    // pruned scan; on the flat test layout the same predicate is a
    // parquet-pushed filter (asserted in GoaExportSpec).
    "goa_pthr2go" -> ((s, d) => {
      val famgo = Tables.part(s, d)
        .select(
          concat(lit("PTHR"), (col("p_partkey") % 200).cast("string"))
            .as("family_acc"),
          concat(lit("AN"), (col("p_partkey") % 13).cast("string"))
            .as("an_id"),
          concat(lit("PTN"),
            ((col("p_partkey") % 200) * 13 + col("p_partkey") % 13)
              .cast("string")).as("ptn_id"),
          when((col("p_partkey") % 200) % 3 === 0,
            concat(lit("IPR"), (col("p_partkey") % 200).cast("string")))
            .otherwise(lit("-")).as("interpro_acc"),
          concat(lit("GO:"), lpad((col("p_partkey") % 40).cast("string"), 7, "0"))
            .as("go_id"))
        .distinct()
      val m = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_linenumber") % 13 =!= 0)
        .select(
          concat(lit("P"), col("l_orderkey").cast("string")).as("protein_acc"),
          concat(lit("PTHR"), (col("l_partkey") % 200).cast("string"))
            .as("family_acc"),
          concat(lit("AN"), (col("l_linenumber") % 13).cast("string"))
            .as("an_id"))
      m.join(broadcast(famgo), Seq("family_acc", "an_id"))
        .select(col("family_acc"), col("ptn_id"), col("interpro_acc"),
          col("go_id"), col("protein_acc"))
    }),

    // Cross-release sequence-database coverage diff
    // (mysql/databases.py:262-330): current vs previous snapshot per
    // sequence database with the UniProt row summing Swiss-Prot +
    // TrEMBL (databases.py:313-317 "Sums Swiss-Prot and TrEMBL
    // counts") — a rollup over the reviewed flag, counting total /
    // hit / integrated in both snapshots plus the signed delta line
    // the release notes print.
    "relnotes_coverage_diff" -> ((s, d) => {
      val base = Tables.orders(s, d).select(
        (col("o_orderstatus") === "F").as("reviewed"),
        (col("o_orderdate") < lit("1997-06-01")).as("is_prev"),
        (col("o_custkey") % 3 =!= 0).as("hit"),
        (col("o_custkey") % 7 === 0).as("integ"))
      base.rollup(col("reviewed"))
        .agg(
          count(lit(1)).as("cur_count"),
          count(when(col("hit"), 1)).as("cur_hit"),
          count(when(col("integ"), 1)).as("cur_integrated"),
          count(when(col("is_prev"), 1)).as("prev_count"),
          count(when(col("is_prev") && col("hit"), 1)).as("prev_hit"),
          count(when(col("is_prev") && col("integ"), 1))
            .as("prev_integrated"))
        .select(
          when(col("reviewed").isNull, "UniProtKB")
            .when(col("reviewed"), "UniProtKB/Swiss-Prot")
            .otherwise("UniProtKB/TrEMBL").as("seqdb"),
          col("cur_count"), col("cur_hit"), col("cur_integrated"),
          col("prev_count"), col("prev_hit"), col("prev_integrated"),
          concat(
            lpad(when(col("reviewed").isNull, "UniProtKB")
              .when(col("reviewed"), "UniProtKB/Swiss-Prot")
              .otherwise("UniProtKB/TrEMBL"), 21, " "),
            lpad(col("cur_count").cast("string"), 12, " "),
            lpad(col("prev_count").cast("string"), 12, " "),
            lpad(concat(
              when(col("cur_count") >= col("prev_count"), "+").otherwise(""),
              (col("cur_count") - col("prev_count")).cast("string")), 9, " "),
            lit(" ("),
            (round(col("cur_hit") * lit(1000.0) / col("cur_count")) / 10.0)
              .cast("string"),
            lit("% hit)")).as("line"))
    }),

    // Full interpro.xml entry-document composition
    // (ftp/xmlfiles.py:77-455): one <interpro> document per entry with
    // name, abstract, GO class_list, pub_list, external_doc_list,
    // member_list (per-signature protein counts, xmlfiles.py:387-396),
    // parent/child lists (xmlfiles.py:366-385), structure_db_links
    // (xmlfiles.py:411-418), the taxonomy_distribution of per-domain
    // lowest-common-ancestors (xmlfiles.py:198-240,420-428: one
    // taxon_data per represented region — the nation itself when the
    // region's proteins sit in a single nation, else their LCA the
    // region) and key_species (xmlfiles.py:430-438). Envelope +
    // DTD validation in InterproXmlSpec through Sinks.writeXml.
    "interpro_xml" -> ((s, d) => {
      val ek = col("p_partkey") % 97
      val types = array(lit("Family"), lit("Domain"), lit("Repeat"),
        lit("Site"), lit("Homologous_superfamily"))
      val dbs = array(lit("CDD"), lit("PFAM"), lit("PANTHER"),
        lit("PROFILE"), lit("SMART"))
      // per-signature protein counts for member_list
      val sigNp = Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_orderkey")).as("np"))
      val mem = Tables.part(s, d)
        .join(sigNp, col("p_partkey") === col("l_partkey"), "left_outer")
        .select(ek.as("ek"), col("p_partkey"),
          concat(lit("<db_xref protein_count=\""),
            coalesce(col("np"), lit(0L)).cast("string"),
            lit("\" db=\""),
            element_at(dbs, (col("p_partkey") % 5 + 1).cast("int")),
            lit("\" dbkey=\"SIG"), col("p_partkey").cast("string"),
            lit("\" name=\"sn"), col("p_partkey").cast("string"),
            lit("\"/>")).as("x"))
        .groupBy(col("ek"))
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("p_partkey"), col("x")))),
          r => r("x"))).as("members"))
      // entry header attrs: name from the min part name in the group
      val ent = Tables.part(s, d)
        .groupBy(ek.as("ek"))
        .agg(min(col("p_name")).as("name"))
        .select(col("ek"), col("name"),
          concat(lit("IPR"), lpad(col("ek").cast("string"), 6, "0"))
            .as("entry_acc"),
          element_at(types, (col("ek") % 5 + 1).cast("int")).as("etype"))
      // entry-level protein counts + structure links from the fact
      val li = Tables.lineitem(s, d).select(
        (col("l_partkey") % 97).as("ek"), col("l_orderkey"),
        concat(lit("PDB"), (col("l_suppkey") % 100).cast("string")).as("pdb"))
      val pc = li.groupBy(col("ek"))
        .agg(countDistinct(col("l_orderkey")).as("np"),
          concat_ws("", transform(sort_array(collect_set(col("pdb"))),
            p => concat(lit("<db_xref db=\"PDB\" dbkey=\""), p,
              lit("\"/>")))).as("structs"))
      // taxonomy distribution: per (entry, region) LCA + key species
      val base = Tables.lineitem(s, d)
        .select((col("l_partkey") % 97).as("ek"), col("l_orderkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("ek"), col("l_orderkey").as("protein"),
          col("c_nationkey"), col("n_regionkey"))
        // both the taxonomy-distribution and key-species branches
        // aggregate this fact-sized join cascade — materialize it once
        // (§2.4; blocks reclaimed by Bench's ephemeral sweep) instead
        // of running the 3-join chain twice
        .loopCheckpoint()
      val taxd = base.groupBy(col("ek"), col("n_regionkey"))
        .agg(countDistinct(col("c_nationkey")).as("nn"),
          min(col("c_nationkey")).as("n1"),
          countDistinct(col("protein")).as("np"))
        .select(col("ek"),
          concat(lit("<taxon_data name=\""),
            when(col("nn") === 1, concat(lit("N"), col("n1").cast("string")))
              .otherwise(concat(lit("R"), col("n_regionkey").cast("string"))),
            lit("\" proteins_count=\""), col("np").cast("string"),
            lit("\"/>")).as("x"))
        .groupBy(col("ek"))
        .agg(concat_ws("", sort_array(collect_list(col("x")))).as("taxdist"))
      val keysp = base.filter(col("c_nationkey").isin(1, 7, 12))
        .groupBy(col("ek"), col("c_nationkey"))
        .agg(countDistinct(col("protein")).as("np"))
        .select(col("ek"),
          concat(lit("<taxon_data name=\"N"), col("c_nationkey").cast("string"),
            lit("\" proteins_count=\""), col("np").cast("string"),
            lit("\"/>")).as("x"))
        .groupBy(col("ek"))
        .agg(concat_ws("", sort_array(collect_list(col("x")))).as("keysp"))
      // parent/child relations among entries (xmlfiles.py:95-103):
      // every fifth entry is a child of its predecessor
      val kids = ent.filter(col("ek") % 5 === 0 && col("ek") > 0)
        .select((col("ek") - 1).as("ek"), col("entry_acc").as("child_acc"))
        .groupBy(col("ek"))
        .agg(concat_ws("", transform(sort_array(collect_list(col("child_acc"))),
          c => concat(lit("<rel_ref ipr_ref=\""), c, lit("\"/>"))))
          .as("childs"))
      ent.join(mem, Seq("ek"))
        .join(pc, Seq("ek"))
        .join(taxd, Seq("ek"))
        .join(keysp, Seq("ek"), "left_outer")
        .join(kids, Seq("ek"), "left_outer")
        .select(col("entry_acc"), concat(
          lit("<interpro id=\""), col("entry_acc"),
          lit("\" protein_count=\""), col("np").cast("string"),
          lit("\" short_name=\"sn_"), col("ek").cast("string"),
          lit("\" type=\""), col("etype"),
          lit("\" is-llm=\""),
          when(col("ek") % 7 === 0, "true").otherwise("false"),
          lit("\" is-llm-reviewed=\"false\">"),
          lit("<name>"), col("name"), lit("</name>"),
          lit("<abstract is-llm=\"false\" is-llm-reviewed=\"false\">"),
          lit("Proteins of entry "), col("entry_acc"),
          lit(" <cite idref=\"PUB"), col("ek").cast("string"),
          lit("\"/>.</abstract>"),
          lit("<class_list><classification id=\"GO:"),
          lpad((col("ek") % 40).cast("string"), 7, "0"),
          lit("\" class_type=\"GO\"><category>"),
          element_at(array(lit("Molecular Function"),
            lit("Biological Process"), lit("Cellular Component")),
            (col("ek") % 3 + 1).cast("int")),
          lit("</category><description>term "), col("ek").cast("string"),
          lit("</description></classification></class_list>"),
          lit("<pub_list><publication id=\"PUB"), col("ek").cast("string"),
          lit("\"><author_list>Unknown</author_list><title>title "),
          col("ek").cast("string"),
          lit("</title><journal>J Mol Biol</journal><year>"),
          (col("ek") % 26 + 2000).cast("string"),
          lit("</year></publication></pub_list>"),
          when(col("ek") % 2 === 0, concat(
            lit("<external_doc_list><db_xref db=\"EC\" dbkey=\""),
            (col("ek") % 50).cast("string"), lit(".-.-\"/>"),
            when(col("ek") % 3 === 0, concat(
              lit("<db_xref db=\"REACTOME\" dbkey=\"R-HSA-"),
              col("ek").cast("string"), lit("\"/>"))).otherwise(lit("")),
            lit("</external_doc_list>"))).otherwise(lit("")),
          lit("<member_list>"), col("members"), lit("</member_list>"),
          when(col("ek") % 5 === 0 && col("ek") > 0, concat(
            lit("<parent_list><rel_ref ipr_ref=\"IPR"),
            lpad((col("ek") - 1).cast("string"), 6, "0"),
            lit("\"/></parent_list>"))).otherwise(lit("")),
          when(col("childs").isNotNull, concat(
            lit("<child_list>"), col("childs"), lit("</child_list>")))
            .otherwise(lit("")),
          lit("<structure_db_links>"), col("structs"),
          lit("</structure_db_links>"),
          lit("<taxonomy_distribution>"), col("taxdist"),
          lit("</taxonomy_distribution>"),
          when(col("keysp").isNotNull, concat(
            lit("<key_species>"), col("keysp"), lit("</key_species>")))
            .otherwise(lit("")),
          lit("</interpro>")).as("xml"))
    })
  )

  val oracle: Map[String, String] = Map(
    "goa_ipr2go2uni" ->
      """WITH gomap AS (
           SELECT DISTINCT 'IPR' || CAST(p_partkey % 300 AS VARCHAR) AS entry_acc,
                  'GO:' || lpad(CAST(p_partkey % 40 AS VARCHAR), 7, '0') AS go_id
           FROM part WHERE p_partkey % 4 = 0),
         prot AS (
           SELECT DISTINCT 'IPR' || CAST(l_partkey % 300 AS VARCHAR) AS entry_acc,
                  'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc
           FROM lineitem WHERE l_partkey % 4 = 0)
         SELECT entry_acc, go_id, protein_acc
         FROM prot JOIN gomap USING (entry_acc)""",
    "goa_pdb2ipr2go" ->
      """WITH gomap AS (
           SELECT DISTINCT 'IPR' || CAST(p_partkey % 300 AS VARCHAR) AS entry_acc,
                  'GO:' || lpad(CAST(p_partkey % 40 AS VARCHAR), 7, '0') AS go_id
           FROM part WHERE p_partkey % 4 = 0),
         chains AS (
           SELECT s_suppkey, 'PDB' || CAST(s_suppkey AS VARCHAR) AS pdb_id,
                  ['A','B','C'][CAST(s_suppkey % 3 + 1 AS INT)] AS chain,
                  'N' || CAST(s_nationkey AS VARCHAR) AS taxon_id
           FROM supplier WHERE s_suppkey % 2 = 0 AND s_nationkey % 7 <> 0),
         cmatch AS (
           SELECT DISTINCT l_suppkey AS s_suppkey,
                  'IPR' || CAST(l_partkey % 300 AS VARCHAR) AS entry_acc
           FROM lineitem WHERE l_partkey % 4 = 0),
         protmap AS (
           SELECT DISTINCT l_suppkey AS s_suppkey,
                  'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc
           FROM lineitem WHERE l_orderkey % 10 = 1 AND l_suppkey % 3 <> 0)
         SELECT c.pdb_id, c.chain, c.taxon_id, m.entry_acc, g.go_id,
                COALESCE(p.protein_acc, '') AS protein_acc
         FROM chains c
              JOIN cmatch m USING (s_suppkey)
              JOIN gomap g USING (entry_acc)
              LEFT JOIN protmap p USING (s_suppkey)""",
    "goa_pthr2go" ->
      """WITH famgo AS (
           SELECT DISTINCT
                  'PTHR' || CAST(p_partkey % 200 AS VARCHAR) AS family_acc,
                  'AN' || CAST(p_partkey % 13 AS VARCHAR) AS an_id,
                  'PTN' || CAST((p_partkey % 200) * 13 + p_partkey % 13
                                AS VARCHAR) AS ptn_id,
                  CASE WHEN (p_partkey % 200) % 3 = 0
                       THEN 'IPR' || CAST(p_partkey % 200 AS VARCHAR)
                       ELSE '-' END AS interpro_acc,
                  'GO:' || lpad(CAST(p_partkey % 40 AS VARCHAR), 7, '0') AS go_id
           FROM part),
         m AS (
           SELECT 'P' || CAST(l_orderkey AS VARCHAR) AS protein_acc,
                  'PTHR' || CAST(l_partkey % 200 AS VARCHAR) AS family_acc,
                  'AN' || CAST(l_linenumber % 13 AS VARCHAR) AS an_id
           FROM lineitem
           WHERE l_returnflag = 'R' AND l_linenumber % 13 <> 0)
         SELECT f.family_acc, f.ptn_id, f.interpro_acc, f.go_id, m.protein_acc
         FROM m JOIN famgo f USING (family_acc, an_id)""",
    "relnotes_coverage_diff" ->
      """WITH base AS (
           SELECT (o_orderstatus = 'F') AS reviewed,
                  (o_orderdate < DATE '1997-06-01') AS is_prev,
                  (o_custkey % 3 <> 0) AS hit,
                  (o_custkey % 7 = 0) AS integ
           FROM orders),
         g AS (
           SELECT reviewed,
                  COUNT(*) AS cur_count,
                  COUNT(CASE WHEN hit THEN 1 END) AS cur_hit,
                  COUNT(CASE WHEN integ THEN 1 END) AS cur_integrated,
                  COUNT(CASE WHEN is_prev THEN 1 END) AS prev_count,
                  COUNT(CASE WHEN is_prev AND hit THEN 1 END) AS prev_hit,
                  COUNT(CASE WHEN is_prev AND integ THEN 1 END)
                    AS prev_integrated
           FROM base GROUP BY ROLLUP (reviewed))
         SELECT CASE WHEN reviewed IS NULL THEN 'UniProtKB'
                     WHEN reviewed THEN 'UniProtKB/Swiss-Prot'
                     ELSE 'UniProtKB/TrEMBL' END AS seqdb,
                cur_count, cur_hit, cur_integrated,
                prev_count, prev_hit, prev_integrated,
                lpad(CASE WHEN reviewed IS NULL THEN 'UniProtKB'
                          WHEN reviewed THEN 'UniProtKB/Swiss-Prot'
                          ELSE 'UniProtKB/TrEMBL' END, 21, ' ') ||
                lpad(CAST(cur_count AS VARCHAR), 12, ' ') ||
                lpad(CAST(prev_count AS VARCHAR), 12, ' ') ||
                lpad(CASE WHEN cur_count >= prev_count THEN '+' ELSE '' END ||
                     CAST(cur_count - prev_count AS VARCHAR), 9, ' ') ||
                ' (' ||
                CAST(round(cur_hit * 1000.0 / cur_count) / 10.0 AS VARCHAR) ||
                '% hit)' AS line
         FROM g""",
    "interpro_xml" ->
      """WITH signp AS (
           SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS np
           FROM lineitem GROUP BY l_partkey),
         mem AS (
           SELECT p_partkey % 97 AS ek,
                  string_agg('<db_xref protein_count="' ||
                             CAST(COALESCE(np, 0) AS VARCHAR) ||
                             '" db="' ||
                             ['CDD','PFAM','PANTHER','PROFILE','SMART']
                               [CAST(p_partkey % 5 + 1 AS INT)] ||
                             '" dbkey="SIG' || CAST(p_partkey AS VARCHAR) ||
                             '" name="sn' || CAST(p_partkey AS VARCHAR) ||
                             '"/>', '' ORDER BY p_partkey) AS members
           FROM part LEFT JOIN signp ON p_partkey = l_partkey
           GROUP BY 1),
         ent AS (
           SELECT p_partkey % 97 AS ek, MIN(p_name) AS name,
                  'IPR' || lpad(CAST(p_partkey % 97 AS VARCHAR), 6, '0')
                    AS entry_acc,
                  ['Family','Domain','Repeat','Site',
                   'Homologous_superfamily']
                    [CAST((p_partkey % 97) % 5 + 1 AS INT)] AS etype
           FROM part GROUP BY 1, 3, 4),
         pc AS (
           SELECT l_partkey % 97 AS ek,
                  COUNT(DISTINCT l_orderkey) AS np,
                  string_agg(DISTINCT '<db_xref db="PDB" dbkey="PDB' ||
                             CAST(l_suppkey % 100 AS VARCHAR) || '"/>', ''
                             ORDER BY '<db_xref db="PDB" dbkey="PDB' ||
                             CAST(l_suppkey % 100 AS VARCHAR) || '"/>')
                    AS structs
           FROM lineitem GROUP BY 1),
         base AS (
           SELECT l_partkey % 97 AS ek, l_orderkey AS protein,
                  c_nationkey, n_regionkey
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey),
         txr AS (
           SELECT ek, n_regionkey, COUNT(DISTINCT c_nationkey) AS nn,
                  MIN(c_nationkey) AS n1, COUNT(DISTINCT protein) AS np
           FROM base GROUP BY 1, 2),
         taxd AS (
           SELECT ek, string_agg(x, '' ORDER BY x) AS taxdist
           FROM (SELECT ek,
                        '<taxon_data name="' ||
                        CASE WHEN nn = 1 THEN 'N' || CAST(n1 AS VARCHAR)
                             ELSE 'R' || CAST(n_regionkey AS VARCHAR) END ||
                        '" proteins_count="' || CAST(np AS VARCHAR) ||
                        '"/>' AS x
                 FROM txr)
           GROUP BY ek),
         keysp AS (
           SELECT ek, string_agg(x, '' ORDER BY x) AS keysp
           FROM (SELECT ek,
                        '<taxon_data name="N' || CAST(c_nationkey AS VARCHAR) ||
                        '" proteins_count="' ||
                        CAST(COUNT(DISTINCT protein) AS VARCHAR) || '"/>' AS x
                 FROM base WHERE c_nationkey IN (1, 7, 12)
                 GROUP BY ek, c_nationkey)
           GROUP BY ek),
         kids AS (
           SELECT ek - 1 AS ek,
                  string_agg('<rel_ref ipr_ref="' || entry_acc || '"/>', ''
                             ORDER BY entry_acc) AS childs
           FROM ent WHERE ek % 5 = 0 AND ek > 0
           GROUP BY ek - 1)
         SELECT e.entry_acc,
                '<interpro id="' || e.entry_acc ||
                '" protein_count="' || CAST(pc.np AS VARCHAR) ||
                '" short_name="sn_' || CAST(e.ek AS VARCHAR) ||
                '" type="' || e.etype ||
                '" is-llm="' ||
                CASE WHEN e.ek % 7 = 0 THEN 'true' ELSE 'false' END ||
                '" is-llm-reviewed="false">' ||
                '<name>' || e.name || '</name>' ||
                '<abstract is-llm="false" is-llm-reviewed="false">' ||
                'Proteins of entry ' || e.entry_acc ||
                ' <cite idref="PUB' || CAST(e.ek AS VARCHAR) || '"/>.' ||
                '</abstract>' ||
                '<class_list><classification id="GO:' ||
                lpad(CAST(e.ek % 40 AS VARCHAR), 7, '0') ||
                '" class_type="GO"><category>' ||
                ['Molecular Function','Biological Process',
                 'Cellular Component'][CAST(e.ek % 3 + 1 AS INT)] ||
                '</category><description>term ' || CAST(e.ek AS VARCHAR) ||
                '</description></classification></class_list>' ||
                '<pub_list><publication id="PUB' || CAST(e.ek AS VARCHAR) ||
                '"><author_list>Unknown</author_list><title>title ' ||
                CAST(e.ek AS VARCHAR) ||
                '</title><journal>J Mol Biol</journal><year>' ||
                CAST(e.ek % 26 + 2000 AS VARCHAR) ||
                '</year></publication></pub_list>' ||
                CASE WHEN e.ek % 2 = 0 THEN
                  '<external_doc_list><db_xref db="EC" dbkey="' ||
                  CAST(e.ek % 50 AS VARCHAR) || '.-.-"/>' ||
                  CASE WHEN e.ek % 3 = 0 THEN
                    '<db_xref db="REACTOME" dbkey="R-HSA-' ||
                    CAST(e.ek AS VARCHAR) || '"/>'
                  ELSE '' END ||
                  '</external_doc_list>'
                ELSE '' END ||
                '<member_list>' || m.members || '</member_list>' ||
                CASE WHEN e.ek % 5 = 0 AND e.ek > 0 THEN
                  '<parent_list><rel_ref ipr_ref="IPR' ||
                  lpad(CAST(e.ek - 1 AS VARCHAR), 6, '0') ||
                  '"/></parent_list>'
                ELSE '' END ||
                COALESCE('<child_list>' || k.childs || '</child_list>', '') ||
                '<structure_db_links>' || pc.structs ||
                '</structure_db_links>' ||
                '<taxonomy_distribution>' || t.taxdist ||
                '</taxonomy_distribution>' ||
                COALESCE('<key_species>' || ks.keysp || '</key_species>', '')
                  || '</interpro>' AS xml
         FROM ent e
              JOIN mem m USING (ek)
              JOIN pc USING (ek)
              JOIN taxd t USING (ek)
              LEFT JOIN keysp ks USING (ek)
              LEFT JOIN kids k USING (ek)"""
  )
}
