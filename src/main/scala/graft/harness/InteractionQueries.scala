package graft.harness

import graft.Tables
import graft.ops.Mitab
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last three reference modules without named end-to-end analogues:
  * IntAct PSI-MI TAB interaction import (interpro7dw/intact.py:24-133),
  * MetaCyc pathway cross-references (interpro7dw/metacyc.py:12-161),
  * and the clan mart's per-clan counts JSON
  * (interpro/mysql/clans.py:44-83).
  *
  * Both flat-file imports derive their input text deterministically
  * from the driver tables (the reference reads external downloads the
  * zero-egress sandbox can't fetch) so the parse semantics — regex
  * precedence, strict column counts, stanza accumulation, HTML cleanup
  * — are what the oracle checks; the real-file round-trips (42-column
  * MITAB TSV, `//`-terminated .dat stanzas via FileSources.readStanzas)
  * are pinned by IntactMetacycSpec golden fixtures.
  */
object InteractionQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---- intact: synthetic MITAB fields ------------------------------

  /** One MITAB line per order, exercising every branch of the
    * reference's extraction: case-insensitive prefixes, display_long
    * preference over the UniProtKB alias, the single-value type gate,
    * missing pubmed/intact ids, and feature columns with 0-2 InterPro
    * accessions.
    */
  private def mitabLine(ok: Column): Column = {
    val ipr1 = lpad((ok % 300).cast("string"), 6, "0")
    val ipr2 = lpad(((ok * 3) % 300).cast("string"), 6, "0")
    val idsA = when(ok % 5 === 0,
        concat(lit("chebi:\"CHEBI:"), ok.cast("string"), lit("\"")))
      .when(ok % 10 === 1,
        concat(lit("UniProtKB:P"), lpad((ok % 50000).cast("string"), 5, "0")))
      .otherwise(concat(lit("uniprotkb:P"),
        lpad((ok % 50000).cast("string"), 5, "0"),
        lit("|intact:EBI-"), (ok * 3).cast("string")))
    val idsB = when(ok % 13 === 2,
        concat(lit("intact:EBI-"), (ok * 7).cast("string")))
      .otherwise(concat(lit("uniprotkb:Q"),
        lpad(((ok * 7) % 50000).cast("string"), 5, "0")))
    val aliasA = when(ok % 3 === 0,
        concat(lit("uniprotkb:gna"), (ok % 997).cast("string"),
          lit("(gene name)|psi-mi:nma"), (ok % 997).cast("string"),
          lit("(display_long)")))
      .otherwise(concat(lit("uniprotkb:gna"), (ok % 997).cast("string"),
        lit("(gene name)")))
    val aliasB = when(ok % 9 === 5, lit("-"))
      .when(ok % 4 === 1,
        concat(lit("psi-mi:nmb"), (ok % 991).cast("string"),
          lit("(display_long)")))
      .otherwise(concat(lit("uniprotkb:gnb"), (ok % 991).cast("string"),
        lit("(gene name)")))
    val typesA = when(ok % 7 === 0,
        lit("psi-mi:\"MI:0326\"(protein)|psi-mi:\"MI:0328\"(small molecule)"))
      .otherwise(lit("psi-mi:\"MI:0326\"(protein)"))
    val typesB = when(ok % 11 === 3, lit("MI:0328(small molecule)"))
      .otherwise(lit("psi-mi:\"MI:0326\"(protein)"))
    val pubs = when(ok % 11 === 0,
        concat(lit("doi:10.1000/x"), ok.cast("string")))
      .otherwise(concat(lit("pubmed:"), (lit(10000) + ok % 89999).cast("string"),
        lit("|mint:MINT-"), ok.cast("string")))
    val inter = when(ok % 17 === 5, concat(lit("imex:IM-"), ok.cast("string")))
      .otherwise(concat(lit("intact:EBI-"), ok.cast("string"),
        lit("|imex:IM-"), (ok % 1000).cast("string")))
    val f36 = when(ok % 2 === 0,
        concat(lit("binding-associated region:IPR"), ipr1, lit("(positions)")))
      .otherwise(lit("mutation decreasing interaction:-"))
    val f37 = when(ok % 6 === 1,
        concat(lit("sufficient binding region:IPR"), ipr2,
          lit("|binding-associated region:IPR"), ipr1))
      .otherwise(lit("-"))
    val dash = lit("-")
    // 42 tab-separated fields; only the ten the reference reads carry
    // values (0,1,4,5,8,13,20,21,36,37) — the rest are '-'.
    val fields: Seq[Column] = Seq(
      idsA, idsB, dash, dash, aliasA, aliasB, dash, dash, pubs, dash, // 0-9
      dash, dash, dash, inter, dash, dash, dash, dash, dash, dash,   // 10-19
      typesA, typesB, dash, dash, dash, dash, dash, dash, dash, dash, // 20-29
      dash, dash, dash, dash, dash, dash, f36, f37, dash, dash,      // 30-39
      dash, dash)                                                    // 40-41
    concat_ws("\t", fields: _*)
  }

  // ---- metacyc: stanza text + pathway dimension --------------------

  /** One reaction stanza per part row (metacyc.py reactions.dat:
    * comment line, UNIQUE-ID, optional EC-NUMBER, 1-2 IN-PATHWAY
    * lines, `//` handled by the record split).
    */
  private def reactionStanza(pk: Column): Column = {
    val ec = concat((pk % 9 + 1).cast("string"), lit("."),
      (pk % 4 + 1).cast("string"), lit("."),
      (pk % 19 + 1).cast("string"),
      when(pk % 3 === 0, lit("")) // 3-component EC -> normalized with ".-"
        .otherwise(concat(lit("."), (pk % 61 + 1).cast("string"))))
    concat(
      lit("# MetaCyc reaction\n"),
      lit("UNIQUE-ID - RXN-"), pk.cast("string"), lit("\n"),
      when(pk % 13 === 0, lit("")) // no EC -> record skipped
        .otherwise(concat(lit("EC-NUMBER - EC-"), ec, lit("\n"))),
      lit("IN-PATHWAY - PWY-"), (pk % 40).cast("string"), lit("\n"),
      when(pk % 2 === 0,
        concat(lit("IN-PATHWAY - PWYG-"), (pk % 23).cast("string"), lit("\n")))
        .otherwise(lit("")))
  }

  /** pathways.dat dimension: PWY-0..39 always present, PWYG-g only for
    * g<12 (missing pathway ids are dropped, metacyc.py:148-152). Names
    * carry the HTML the reference cleans: entities unescaped keeping
    * the entity text (&alpha; -> alpha, case-insensitively) and tags
    * stripped (metacyc.py:67-72).
    */
  private def pathwayDim(s: SparkSession, d: String): DataFrame = {
    val pwy = Tables.part(s, d)
      .select((col("p_partkey") % 40).as("k")).distinct()
      .select(concat(lit("PWY-"), col("k").cast("string")).as("pathway_id"),
        concat(lit("pathway "),
          when(col("k") % 5 === 0, lit("&Delta;")).otherwise(lit("&alpha;")),
          col("k").cast("string"), lit(" biosynthesis <em>"),
          col("k").cast("string"), lit("</em>")).as("raw_name"))
    val pwyg = Tables.part(s, d)
      .select((col("p_partkey") % 23).as("g")).distinct()
      .filter(col("g") < 12)
      .select(concat(lit("PWYG-"), col("g").cast("string")).as("pathway_id"),
        concat(lit("super-pathway <i>"), col("g").cast("string"),
          lit("</i> &beta;"), col("g").cast("string")).as("raw_name"))
    pwy.union(pwyg).select(col("pathway_id"),
      regexp_replace(
        regexp_replace(col("raw_name"), "(?i)&([a-z]+);", "$1"),
        "</?.+?>", "").as("pathway_name"))
  }

  val queries: Map[String, Q] = Map(
    // IntAct import end-to-end (intact.py:24-92): MITAB lines ->
    // 42-column split (strict count) -> regex extraction with the
    // reference's precedence rules -> required-field gate -> one row
    // per (entry, interaction), deduped on the interaction id.
    "intact_interactions" -> ((s, d) => {
      // widen between the line build and the parse kernel: the
      // exchange spreads the single-split orders scan across cores
      // before the per-line regex work (a one-row-group parquet file
      // otherwise serializes the whole parse onto one task)
      val lines = Tables.widened(Tables.orders(s, d)
        .select(mitabLine(col("o_orderkey")).as("value")))
      Mitab.interproInteractions(lines)
    }),

    // MetaCyc ec2pathways (metacyc.py:127-161): reaction stanzas parsed
    // with multiline regexes (EC normalization: 3-part -> '.-' suffix,
    // metacyc.py:23-29), pathway-id fanout, inner join onto the
    // cleaned pathway-name dimension (missing ids dropped).
    "metacyc_ec2pathways" -> ((s, d) => {
      val rawEc = nullif(regexp_extract(col("stanza"),
        """(?m)^EC-NUMBER - EC-(\d+\.\d+\.\d+(\.\d+)?)$""", 1), lit(""))
      val parsed = Tables.part(s, d)
        .select(reactionStanza(col("p_partkey")).as("stanza"))
        .select(rawEc.as("raw_ec"),
          regexp_extract_all(col("stanza"),
            lit("(?m)^IN-PATHWAY - (PWYG?-\\d+)$"), lit(1)).as("pathways"))
        .filter(col("raw_ec").isNotNull)
        .select(
          when(col("raw_ec").rlike("""^\d+\.\d+\.\d+$"""),
            concat(col("raw_ec"), lit(".-"))).otherwise(col("raw_ec"))
            .as("ec"),
          explode(col("pathways")).as("pathway_id"))
        .distinct()
      parsed.join(broadcast(pathwayDim(s, d)), "pathway_id")
        .select(col("ec"), col("pathway_id"), col("pathway_name"))
        .distinct()
    }),

    // Clan mart counts JSON (mysql/clans.py:44-67 + the xref counts
    // it serializes): per clan — distinct domain architectures,
    // per-member-db entry counts with the "all"->"total" rename
    // (clans.py:46-47), proteins, proteomes (null proteome skipped),
    // structures, taxa. Members come from the dimension, fact counts
    // from one keyed join chain; JSON key order is fixed so both
    // engines render identical text.
    "mart_clan_counts" -> ((s, d) => {
      val dbs = array(lit("cdd"), lit("panther"), lit("pfam"),
        lit("profile"), lit("smart"))
      val members = Tables.supplier(s, d).select(
        col("s_nationkey").as("clan"), col("s_suppkey").as("acc"),
        element_at(dbs, (col("s_suppkey") % 5 + 1).cast("int")).as("db"))
      val perDb = members.groupBy(col("clan"), col("db"))
        .agg(countDistinct(col("acc")).as("n"))
      val entries = perDb.groupBy(col("clan"))
        .agg(
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("db"), col("n")))),
            r => concat(lit("\""), r("db"), lit("\":"),
              r("n").cast("string")))).as("dbjson"),
          sum(col("n")).as("total"))
      val facts = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("clan"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("clan"))
        .agg(
          countDistinct(col("l_partkey") % 13).as("da"),
          countDistinct(col("l_orderkey")).as("proteins"),
          countDistinct(when(col("o_custkey") % 4 =!= 0,
            col("o_custkey") % 50)).as("proteomes"),
          countDistinct(col("l_suppkey") % 100).as("structures"),
          countDistinct(col("c_nationkey")).as("taxa"))
      entries.join(facts, Seq("clan"))
        .select(
          concat(lit("CL"), col("clan").cast("string")).as("accession"),
          element_at(array(lit("pfam"), lit("cdd"), lit("panther")),
            (col("clan") % 3 + 1).cast("int")).as("source_database"),
          concat(lit("{\"domain_architectures\":"), col("da").cast("string"),
            lit(",\"entries\":{"), col("dbjson"),
            lit(",\"total\":"), col("total").cast("string"),
            lit("},\"proteins\":"), col("proteins").cast("string"),
            lit(",\"proteomes\":"), col("proteomes").cast("string"),
            lit(",\"structures\":"), col("structures").cast("string"),
            lit(",\"taxa\":"), col("taxa").cast("string"),
            lit("}")).as("counts"))
    })
  )

  val oracle: Map[String, String] = Map(
    "intact_interactions" ->
      """WITH fields AS (
           SELECT o_orderkey AS ok,
                  CASE WHEN o_orderkey % 5 = 0
                         THEN 'chebi:"CHEBI:' || CAST(o_orderkey AS VARCHAR) || '"'
                       WHEN o_orderkey % 10 = 1
                         THEN 'UniProtKB:P' ||
                              lpad(CAST(o_orderkey % 50000 AS VARCHAR), 5, '0')
                       ELSE 'uniprotkb:P' ||
                            lpad(CAST(o_orderkey % 50000 AS VARCHAR), 5, '0') ||
                            '|intact:EBI-' || CAST(o_orderkey * 3 AS VARCHAR)
                  END AS ids_a,
                  CASE WHEN o_orderkey % 13 = 2
                         THEN 'intact:EBI-' || CAST(o_orderkey * 7 AS VARCHAR)
                       ELSE 'uniprotkb:Q' ||
                            lpad(CAST((o_orderkey * 7) % 50000 AS VARCHAR), 5, '0')
                  END AS ids_b,
                  CASE WHEN o_orderkey % 3 = 0
                         THEN 'uniprotkb:gna' || CAST(o_orderkey % 997 AS VARCHAR) ||
                              '(gene name)|psi-mi:nma' ||
                              CAST(o_orderkey % 997 AS VARCHAR) || '(display_long)'
                       ELSE 'uniprotkb:gna' || CAST(o_orderkey % 997 AS VARCHAR) ||
                            '(gene name)'
                  END AS alias_a,
                  CASE WHEN o_orderkey % 9 = 5 THEN '-'
                       WHEN o_orderkey % 4 = 1
                         THEN 'psi-mi:nmb' || CAST(o_orderkey % 991 AS VARCHAR) ||
                              '(display_long)'
                       ELSE 'uniprotkb:gnb' || CAST(o_orderkey % 991 AS VARCHAR) ||
                            '(gene name)'
                  END AS alias_b,
                  CASE WHEN o_orderkey % 7 = 0
                         THEN 'psi-mi:"MI:0326"(protein)|psi-mi:"MI:0328"(small molecule)'
                       ELSE 'psi-mi:"MI:0326"(protein)'
                  END AS types_a,
                  CASE WHEN o_orderkey % 11 = 3 THEN 'MI:0328(small molecule)'
                       ELSE 'psi-mi:"MI:0326"(protein)'
                  END AS types_b,
                  CASE WHEN o_orderkey % 11 = 0
                         THEN 'doi:10.1000/x' || CAST(o_orderkey AS VARCHAR)
                       ELSE 'pubmed:' || CAST(10000 + o_orderkey % 89999 AS VARCHAR) ||
                            '|mint:MINT-' || CAST(o_orderkey AS VARCHAR)
                  END AS pubs,
                  CASE WHEN o_orderkey % 17 = 5
                         THEN 'imex:IM-' || CAST(o_orderkey AS VARCHAR)
                       ELSE 'intact:EBI-' || CAST(o_orderkey AS VARCHAR) ||
                            '|imex:IM-' || CAST(o_orderkey % 1000 AS VARCHAR)
                  END AS inter,
                  CASE WHEN o_orderkey % 2 = 0
                         THEN 'binding-associated region:IPR' ||
                              lpad(CAST(o_orderkey % 300 AS VARCHAR), 6, '0') ||
                              '(positions)'
                       ELSE 'mutation decreasing interaction:-'
                  END AS f36,
                  CASE WHEN o_orderkey % 6 = 1
                         THEN 'sufficient binding region:IPR' ||
                              lpad(CAST((o_orderkey * 3) % 300 AS VARCHAR), 6, '0') ||
                              '|binding-associated region:IPR' ||
                              lpad(CAST(o_orderkey % 300 AS VARCHAR), 6, '0')
                       ELSE '-'
                  END AS f37
           FROM orders),
         parsed AS (
           SELECT list_distinct(list_concat(
                    regexp_extract_all(f36, 'IPR\d{6}'),
                    regexp_extract_all(f37, 'IPR\d{6}'))) AS accessions,
                  nullif(regexp_extract(inter, '(?i)intact:(EBI-\d+)', 1), '')
                    AS intact_id,
                  CAST(nullif(regexp_extract(pubs, '(?i)pubmed:(\d+)', 1), '')
                       AS INT) AS pubmed_id,
                  nullif(regexp_extract(ids_a, '(?i)uniprotkb:([A-Z0-9]+)', 1), '')
                    AS acc_1,
                  coalesce(
                    upper(nullif(regexp_extract(alias_a,
                      '(?i)psi-mi:([^(]+)\(display_long\)', 1), '')),
                    nullif(regexp_extract(alias_a,
                      '(?i)uniprotkb:([^(|]+)', 1), '')) AS name_1,
                  CASE WHEN len(string_split(types_a, '|')) = 1
                       THEN nullif(regexp_extract(types_a,
                              '(?i)psi-mi:"MI:\d+"\(([^)]+)\)', 1), '')
                  END AS type_1,
                  nullif(regexp_extract(ids_b, '(?i)uniprotkb:([A-Z0-9]+)', 1), '')
                    AS acc_2,
                  coalesce(
                    upper(nullif(regexp_extract(alias_b,
                      '(?i)psi-mi:([^(]+)\(display_long\)', 1), '')),
                    nullif(regexp_extract(alias_b,
                      '(?i)uniprotkb:([^(|]+)', 1), '')) AS name_2,
                  CASE WHEN len(string_split(types_b, '|')) = 1
                       THEN nullif(regexp_extract(types_b,
                              '(?i)psi-mi:"MI:\d+"\(([^)]+)\)', 1), '')
                  END AS type_2
           FROM fields)
         SELECT DISTINCT unnest(accessions) AS entry_acc, intact_id,
                pubmed_id, acc_1, name_1, type_1, acc_2, name_2, type_2
         FROM parsed
         WHERE len(accessions) > 0 AND intact_id IS NOT NULL
           AND pubmed_id IS NOT NULL AND acc_1 IS NOT NULL
           AND name_1 IS NOT NULL AND type_1 IS NOT NULL
           AND acc_2 IS NOT NULL AND name_2 IS NOT NULL
           AND type_2 IS NOT NULL""",
    "metacyc_ec2pathways" ->
      """WITH stanzas AS (
           SELECT '# MetaCyc reaction' || chr(10) ||
                  'UNIQUE-ID - RXN-' || CAST(p_partkey AS VARCHAR) || chr(10) ||
                  CASE WHEN p_partkey % 13 = 0 THEN ''
                       ELSE 'EC-NUMBER - EC-' ||
                            CAST(p_partkey % 9 + 1 AS VARCHAR) || '.' ||
                            CAST(p_partkey % 4 + 1 AS VARCHAR) || '.' ||
                            CAST(p_partkey % 19 + 1 AS VARCHAR) ||
                            CASE WHEN p_partkey % 3 = 0 THEN ''
                                 ELSE '.' || CAST(p_partkey % 61 + 1 AS VARCHAR)
                            END || chr(10)
                  END ||
                  'IN-PATHWAY - PWY-' || CAST(p_partkey % 40 AS VARCHAR) ||
                  chr(10) ||
                  CASE WHEN p_partkey % 2 = 0
                       THEN 'IN-PATHWAY - PWYG-' ||
                            CAST(p_partkey % 23 AS VARCHAR) || chr(10)
                       ELSE ''
                  END AS stanza
           FROM part),
         parsed AS (
           SELECT DISTINCT
                  CASE WHEN regexp_matches(raw_ec, '^\d+\.\d+\.\d+$')
                       THEN raw_ec || '.-' ELSE raw_ec END AS ec,
                  unnest(regexp_extract_all(stanza,
                    '(?m)^IN-PATHWAY - (PWYG?-\d+)$', 1)) AS pathway_id
           FROM (SELECT stanza,
                        nullif(regexp_extract(stanza,
                          '(?m)^EC-NUMBER - EC-(\d+\.\d+\.\d+(\.\d+)?)$', 1), '')
                          AS raw_ec
                 FROM stanzas)
           WHERE raw_ec IS NOT NULL),
         dim AS (
           SELECT pathway_id,
                  regexp_replace(
                    regexp_replace(raw_name, '(?i)&([a-z]+);', '\1', 'g'),
                    '</?.+?>', '', 'g') AS pathway_name
           FROM (
             SELECT 'PWY-' || CAST(k AS VARCHAR) AS pathway_id,
                    'pathway ' ||
                    CASE WHEN k % 5 = 0 THEN '&Delta;' ELSE '&alpha;' END ||
                    CAST(k AS VARCHAR) || ' biosynthesis <em>' ||
                    CAST(k AS VARCHAR) || '</em>' AS raw_name
             FROM (SELECT DISTINCT p_partkey % 40 AS k FROM part)
             UNION ALL
             SELECT 'PWYG-' || CAST(g AS VARCHAR),
                    'super-pathway <i>' || CAST(g AS VARCHAR) || '</i> &beta;' ||
                    CAST(g AS VARCHAR)
             FROM (SELECT DISTINCT p_partkey % 23 AS g FROM part)
             WHERE g < 12))
         SELECT DISTINCT ec, pathway_id, pathway_name
         FROM parsed JOIN dim USING (pathway_id)""",
    "mart_clan_counts" ->
      """WITH members AS (
           SELECT s_nationkey AS clan, s_suppkey AS acc,
                  ['cdd','panther','pfam','profile','smart']
                    [CAST(s_suppkey % 5 + 1 AS INT)] AS db
           FROM supplier),
         perdb AS (
           SELECT clan, db, COUNT(DISTINCT acc) AS n
           FROM members GROUP BY 1, 2),
         entries AS (
           SELECT clan,
                  string_agg('"' || db || '":' || CAST(n AS VARCHAR), ','
                             ORDER BY db) AS dbjson,
                  SUM(n) AS total
           FROM perdb GROUP BY 1),
         facts AS (
           SELECT s_nationkey AS clan,
                  COUNT(DISTINCT l_partkey % 13) AS da,
                  COUNT(DISTINCT l_orderkey) AS proteins,
                  COUNT(DISTINCT CASE WHEN o_custkey % 4 <> 0
                                      THEN o_custkey % 50 END) AS proteomes,
                  COUNT(DISTINCT l_suppkey % 100) AS structures,
                  COUNT(DISTINCT c_nationkey) AS taxa
           FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
           GROUP BY 1)
         SELECT 'CL' || CAST(clan AS VARCHAR) AS accession,
                ['pfam','cdd','panther'][CAST(clan % 3 + 1 AS INT)]
                  AS source_database,
                '{"domain_architectures":' || CAST(da AS VARCHAR) ||
                ',"entries":{' || dbjson ||
                ',"total":' || CAST(total AS VARCHAR) ||
                '},"proteins":' || CAST(proteins AS VARCHAR) ||
                ',"proteomes":' || CAST(proteomes AS VARCHAR) ||
                ',"structures":' || CAST(structures AS VARCHAR) ||
                ',"taxa":' || CAST(taxa AS VARCHAR) || '}' AS counts
         FROM entries JOIN facts USING (clan)"""
  )
}
