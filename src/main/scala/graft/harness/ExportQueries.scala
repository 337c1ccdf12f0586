package graft.harness

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Downstream export shapes: the EBI-search JSON doc assembly
  * (reference ebisearch.py:15-170) and the InterProScan lookup dumps
  * (reference interpro/ftp/iprscan.py:97-239). Both are pure reshapes
  * over already-aggregated data, so each is one scan (+ one keyed agg
  * where the reference builds a cross-entry map) with every string
  * rendered in executors.
  */
object ExportQueries {
  type Q = (SparkSession, String) => DataFrame

  /** release_notes.txt assembly (ftp/relnotes.py:39-56,96-128): the
    * ordinal day suffix and the section stitching around the
    * distributed-rendered lines. Only the tiny envelope is
    * driver-side — every table line comes from the relnotes_* queries.
    */
  object Relnotes {
    def daySuffix(day: Int): String = day match {
      case 1 | 21 | 31 => "st"
      case 2 | 22      => "nd"
      case 3 | 23      => "rd"
      case _           => "th"
    }

    def assemble(s: SparkSession, sfDir: String, outFile: String,
                 version: String, day: Int, month: String,
                 year: Int): Unit = {
      def lines(q: String): Seq[String] =
        queries(q)(s, sfDir).select(col("line")).collect()
          .map(_.getString(0)).sorted.toSeq
      val sb = new StringBuilder
      sb ++= "Release Notes\n\n"
      sb ++= "======================================\n\n"
      sb ++= s"Release $version, $day${daySuffix(day)} $month $year\n\n"
      sb ++= s"Contents and coverage of InterPro $version\n"
      lines("relnotes_types").foreach(l => sb ++= l += '\n')
      sb ++= "\nMember database information\n"
      sb ++= f"${"Signature Database"}%18s${"Version"}%12s" +
        f"${"Signatures*"}%25s${"Integrated Signatures**"}%33s\n"
      lines("relnotes_members").foreach(l => sb ++= l += '\n')
      sb ++= "\n"
      lines("relnotes_coverage").foreach(l => sb ++= l += '\n')
      // cross-release coverage comparison (mysql/databases.py:262-330):
      // Swiss-Prot / TrEMBL / summed-UniProt counts vs the previous
      // release with the signed delta — the last relnotes section
      sb ++= "\nSequence database coverage vs previous release\n"
      sb ++= f"${"Database"}%21s${"Current"}%12s${"Previous"}%12s" +
        f"${"Change"}%9s\n"
      GoaQueries.queries("relnotes_coverage_diff")(s, sfDir)
        .select(col("line")).collect().map(_.getString(0)).sorted
        .foreach(l => sb ++= l += '\n')
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        sb.toString.getBytes("UTF-8"))
    }
  }

  /** JSON object for one EBI-search field. */
  private def field(name: String, value: Column): Column =
    concat(lit(s"""{"name":"$name","value":""""), value, lit("\"}"))

  /** JSON object for one EBI-search cross-reference. */
  private def xref(dbname: Column, dbkey: Column): Column =
    concat(lit("""{"dbname":""""), dbname, lit("""","dbkey":""""),
      dbkey, lit("\"}"))

  val queries: Map[String, Q] = Map(
    // ebisearch_docs (ebisearch.py:15-170 _init_fields + strip_tags):
    // entries = part; k%4==0 rows are InterPro entries, the rest member
    // signatures, half of which integrate into an InterPro entry. The
    // reshape exercises every _init_fields behavior: HTML-tag strip,
    // [cite:PUBx] -> [PMID:n] rewrite (or removal when the citation has
    // no PMID), the ordered fields list with conditional short_name /
    // set entries, and the contributing_database fields + signature
    // xrefs that the reference derives from the member->entry
    // `integrates` map (here one groupBy over the member branch,
    // broadcast back onto the InterPro branch).
    "ebisearch_docs" -> ((s, d) => {
      val base = Tables.part(s, d).select(
        col("p_partkey").as("k"), col("p_name"), col("p_type"),
        col("p_size"))
        .withColumn("is_ipr", col("k") % 4 === 0)
        .withColumn("acc",
          when(col("is_ipr"), concat(lit("IPR"), col("k").cast("string")))
            .otherwise(concat(lit("SIG"), col("k").cast("string"))))
        .withColumn("etype", lower(split(col("p_type"), " ").getItem(0)))
        .withColumn("db", when(col("is_ipr"), lit("interpro"))
          .otherwise(element_at(
            array(lit("pfam"), lit("panther"), lit("cdd"), lit("profiles"),
              lit("smart")), (col("k") % 5 + 1).cast("int"))))
        .withColumn("integrated",
          when(!col("is_ipr") && col("k") % 2 === 0,
            concat(lit("IPR"), (col("k") % 500 * 4).cast("string"))))
        .withColumn("pmid",
          when(col("k") % 3 =!= 0, col("k") * 7 + 11))
        // raw description carries HTML + a trailing citation marker
        .withColumn("stripped", regexp_replace(
          concat(lit("<p>"), col("p_type"), lit("</p> see [cite:PUB"),
            col("k").cast("string"), lit("]")),
          "<[^>]*>", ""))
        .withColumn("cite",
          concat(lit("[cite:PUB"), col("k").cast("string"), lit("]")))
        .withColumn("description",
          when(col("pmid").isNotNull, expr(
            "replace(stripped, cite, concat('[PMID:', cast(pmid as string), ']'))"))
            .otherwise(expr("replace(stripped, cite, '')")))

      // integrates: member-db -> entry map, inverted to per-entry
      // contributing fields + signature xrefs (ebisearch.py:87-101)
      val integ = base.filter(col("integrated").isNotNull)
        .groupBy(col("integrated").as("iacc"))
        .agg(
          concat_ws(",", sort_array(collect_set(
            field("contributing_database", col("db"))))).as("contribf"),
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("db"), col("acc"),
              xref(upper(col("db")), col("acc")).as("xj")))),
            t => t("xj"))).as("contribx"))

      base.join(broadcast(integ), col("acc") === col("iacc"), "left")
        .select(col("acc"),
          concat(lit("["), concat_ws(",",
            field("id", col("acc")),
            field("type", col("etype")),
            field("creation_date", concat(lit("20"),
              lpad((col("k") % 25).cast("string"), 2, "0"), lit("-"),
              lpad((col("k") % 12 + 1).cast("string"), 2, "0"), lit("-"),
              lpad((col("k") % 28 + 1).cast("string"), 2, "0"))),
            field("description", col("description")),
            field("source_database", col("db")),
            field("name", col("p_name")),
            when(col("p_size") % 5 =!= 0,
              field("short_name",
                concat(lit("sn_"), col("k").cast("string")))),
            when(col("k") % 6 === 0,
              field("set",
                concat(lit("CL"), (col("k") % 100).cast("string")))),
            col("contribf")), lit("]")).as("fields"),
          concat(lit("["), concat_ws(",",
            col("contribx"),
            when(col("integrated").isNotNull,
              xref(lit("INTERPRO"), col("integrated"))),
            when(col("pmid").isNotNull,
              xref(lit("PUBMED"), col("pmid").cast("string")))),
            lit("]")).as("cross_references"))
    }),

    // iprscan_entries (iprscan.py:167-239 _export_entries): UNION ALL
    // of checked InterPro entries, member signatures with left-outer
    // integration, and feature methods — then the representative
    // {type,index} ranking against REPR_DOM/FAM_DATABASES
    // (oracle/entries.py:15-19).
    "iprscan_entries" -> ((s, d) => {
      val typeOf = (code: Column) => element_at(
        array(lit("Family"), lit("Domain"), lit("Repeat"),
          lit("Conserved_site"), lit("Homologous_superfamily")),
        (code % 5 + 1).cast("int"))

      val checked = Tables.part(s, d).filter(col("p_size") % 2 === 0)
      val entries = checked.select(
        concat(lit("IPR"), col("p_partkey").cast("string")).as("acc"),
        col("p_brand").as("name"), col("p_name").as("description"),
        typeOf(col("p_partkey")).as("etype"),
        lit("interpro").as("dbshort"), lit("InterPro").as("database"),
        lit(null).cast("string").as("integrated"))

      val methods = Tables.supplier(s, d)
        .join(broadcast(checked.select(col("p_partkey"))),
          col("p_partkey") === col("s_suppkey"), "left")
        .select(
          concat(lit("MTH"), col("s_suppkey").cast("string")).as("acc"),
          col("s_name").as("name"),
          concat(lit("supplier "), col("s_suppkey").cast("string"))
            .as("description"),
          typeOf(col("s_suppkey")).as("etype"),
          element_at(array(lit("pfam"), lit("cdd"), lit("profile"),
            lit("smart"), lit("cathgene3d"), lit("panther"), lit("ssf")),
            (col("s_nationkey") % 7 + 1).cast("int")).as("dbshort"),
          element_at(array(lit("Pfam"), lit("CDD"), lit("PROSITE profiles"),
            lit("SMART"), lit("CATH-Gene3D"), lit("PANTHER"),
            lit("SUPERFAMILY")),
            (col("s_nationkey") % 7 + 1).cast("int")).as("database"),
          when(col("p_partkey").isNotNull,
            concat(lit("IPR"), col("s_suppkey").cast("string")))
            .as("integrated"))

      val features = Tables.customer(s, d).filter(col("c_custkey") % 10 < 2)
        .select(
          concat(lit("FM"), col("c_custkey").cast("string")).as("acc"),
          col("c_name").as("name"), col("c_mktsegment").as("description"),
          lit("Unknown").as("etype"),
          element_at(array(lit("coils"), lit("mobidblt"), lit("phobius"),
            lit("signalp"), lit("tmhmm")),
            (col("c_nationkey") % 5 + 1).cast("int")).as("dbshort"),
          element_at(array(lit("Coils"), lit("MobiDB Lite"), lit("Phobius"),
            lit("SignalP"), lit("TMHMM")),
            (col("c_nationkey") % 5 + 1).cast("int")).as("database"),
          lit(null).cast("string").as("integrated"))

      val domDbs = Seq("pfam", "cdd", "profile", "smart", "ncbifam",
        "cathgene3d", "ssf")
      val famDbs = Seq("pfam", "panther", "pirsf", "hamap", "ncbifam", "sfld")
      val domIdx = array_position(
        array(domDbs.map(lit): _*), col("dbshort"))
      val famIdx = array_position(
        array(famDbs.map(lit): _*), col("dbshort"))

      entries.unionByName(methods).unionByName(features)
        .withColumn("repr_type",
          when(lower(col("etype")).isin("domain", "repeat", "conserved_site",
            "homologous_superfamily") && domIdx > 0, "domain")
            .when(lower(col("etype")) === "family" && famIdx > 0, "family"))
        .withColumn("repr_index",
          when(col("repr_type") === "domain", domIdx - 1)
            .when(col("repr_type") === "family", famIdx - 1)
            .otherwise(lit(0L)))
        .select(col("acc"), col("name"), col("description"),
          col("etype"), col("database"), col("integrated"),
          col("repr_type"), col("repr_index"))
    }),

    // iprscan_pathways (iprscan.py:97-125 _export_pathways): the
    // ENTRY2PATHWAY rows inverted to the per-entry pathway-id list the
    // lookup dump ships; pathway ids are namespaced per source DB.
    "iprscan_pathways" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        concat(lit("IPR"), (col("l_partkey") % 1000).cast("string"))
          .as("entry_acc"),
        concat(
          element_at(array(lit("MC"), lit("R-HSA-"), lit("map")),
            (col("l_suppkey") % 3 + 1).cast("int")),
          (col("l_orderkey") % 300).cast("string")).as("pathway_id"))
        .groupBy(col("entry_acc"))
        .agg(countDistinct(col("pathway_id")).as("n_pathways"),
          concat_ws(",", sort_array(collect_set(col("pathway_id"))))
            .as("pathways"))),

    // iprscan_manifest (iprscan.py:241-380 iter_antifam/iter_cath/
    // iter_cdd/.../iter_smart): the per-member-database file
    // inventories that complete the InterProScan FTP lookup package —
    // each member DB contributes a static list of distribution files,
    // parameterized by its release version, with src paths under the
    // data root and dst paths under the package layout (some renamed
    // or re-rooted, e.g. CATH's gene3d/ subtree). The per-DB templates
    // are a literal dim frame broadcast onto the per-DB version census
    // (same version derivation as relnotes_members), so the manifest
    // fan-out costs one tiny join regardless of data scale.
    "iprscan_manifest" -> ((s, d) => {
      val dbs = Tables.supplier(s, d)
        .select(element_at(array(lit("Pfam"), lit("CDD"),
          lit("PROSITE profiles"), lit("SMART"), lit("CATH-Gene3D"),
          lit("PANTHER"), lit("SUPERFAMILY")),
          (col("s_nationkey") % 7 + 1).cast("int")).as("db"),
          col("s_suppkey"))
        .groupBy(col("db"))
        .agg(concat((min(col("s_suppkey")) % 90).cast("string"), lit(".0"))
          .as("version"))
      import s.implicits._
      val template = Seq(
        ("Pfam", "pfam", "pfam_a.dat", "pfam_a.dat"),
        ("Pfam", "pfam", "pfam_a.hmm", "pfam_a.hmm"),
        ("CDD", "cdd", "data", "data"),
        ("CDD", "cdd", "db", "db"),
        ("PROSITE profiles", "prosite", "evaluator.dat", "evaluator.dat"),
        ("PROSITE profiles", "prosite", "prosite_patterns.dat", "prosite_patterns.dat"),
        ("PROSITE profiles", "prosite", "prosite_profiles", "prosite_profiles"),
        ("PROSITE profiles", "prosite", "skip_flagged_profiles.txt", "skip_flagged_profiles.txt"),
        ("SMART", "smart", "smart-hmmer3/smart.HMMs", "hmmer3/smart.HMMs"),
        ("CATH-Gene3D", "cath-gene3d", "gene3d_main.hmm", "gene3d/gene3d_main.hmm"),
        ("CATH-Gene3D", "cath-gene3d", "discontinuous/discontinuous_regs.pkl.py3", "gene3d/discontinuous_regs.pkl.py3"),
        ("CATH-Gene3D", "cath-gene3d", "model_to_family_map.tsv", "gene3d/model_to_family_map.tsv"),
        ("PANTHER", "panther", "famhmm", "famhmm"),
        ("PANTHER", "panther", "Tree_MSF", "Tree_MSF"),
        ("SUPERFAMILY", "superfamily", "hmmlib_1.75", "hmmlib_1.75"),
        ("SUPERFAMILY", "superfamily", "self_hits.tab", "self_hits.tab")
      ).toDF("db", "dir", "src_member", "dst_member")
      dbs.join(broadcast(template), Seq("db"))
        .select(col("db"), col("version"),
          concat(col("dir"), lit("/"), col("version"), lit("/"),
            col("src_member")).as("src_path"),
          concat(col("dir"), lit("/"), col("version"), lit("/"),
            col("dst_member")).as("dst_path"))
    }),

    // relnotes_types (ftp/relnotes.py:100-105): the per-entry-type
    // count block of release_notes.txt — `{type:>22} {count:>6}` with
    // underscores spaced and Python-capitalize() casing.
    "relnotes_types" -> ((s, d) =>
      Tables.part(s, d).select(
        element_at(array(lit("family"), lit("domain"), lit("repeat"),
          lit("conserved_site"), lit("homologous_superfamily")),
          (col("p_partkey") % 5 + 1).cast("int")).as("etype"))
        .groupBy(col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(col("etype"),
          concat(
            lpad(concat(upper(substring(replace(col("etype"), lit("_"),
              lit(" ")), 1, 1)),
              substring(replace(col("etype"), lit("_"), lit(" ")), 2, 100)),
              22, " "),
            lit(" "), lpad(col("n").cast("string"), 6, " ")).as("line"))),

    // relnotes_members (ftp/relnotes.py:117-128): the member-database
    // table — `{name:>18}{version:>12}{signatures:>25}{integrated:>33}`
    // — aggregated per database over the signature store.
    "relnotes_members" -> ((s, d) => {
      val checked = Tables.part(s, d).filter(col("p_size") % 2 === 0)
        .select(col("p_partkey"))
      Tables.supplier(s, d)
        .join(broadcast(checked), col("p_partkey") === col("s_suppkey"), "left")
        .select(
          element_at(array(lit("Pfam"), lit("CDD"), lit("PROSITE profiles"),
            lit("SMART"), lit("CATH-Gene3D"), lit("PANTHER"),
            lit("SUPERFAMILY")),
            (col("s_nationkey") % 7 + 1).cast("int")).as("db"),
          col("s_suppkey"), col("p_partkey"))
        .groupBy(col("db"))
        .agg(count(lit(1)).as("sigs"),
          count(col("p_partkey")).as("integrated"),
          concat((min(col("s_suppkey")) % 90).cast("string"), lit(".0"))
            .as("version"))
        .select(col("db"),
          concat(lpad(col("db"), 18, " "), lpad(col("version"), 12, " "),
            lpad(col("sigs").cast("string"), 25, " "),
            lpad(col("integrated").cast("string"), 33, " ")).as("line"))
    }),

    // relnotes_coverage (ftp/relnotes.py:142-163): the sequence-
    // database coverage table with `{n:>9} ({pct:.1f}%)` columns; the
    // percentage rounds to one decimal BEFORE rendering so both
    // engines print identical strings.
    "relnotes_coverage" -> ((s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_p"),
          count(when(col("o_custkey") % 3 =!= 0, 1)).as("n_s"),
          count(when(col("o_custkey") % 7 === 0, 1)).as("n_is"))
        .select(
          element_at(array(lit("UniProtKB/TrEMBL"), lit("UniProtKB"),
            lit("UniProtKB/Swiss-Prot")),
            when(col("o_orderstatus") === "F", 1)
              .when(col("o_orderstatus") === "O", 2).otherwise(3))
            .as("seqdb"),
          concat(
            lpad(col("n_p").cast("string"), 21, " "), lit("    "),
            lpad(col("n_s").cast("string"), 9, " "), lit(" ("),
            (round(col("n_s") * lit(1000.0) / col("n_p")) / 10.0)
              .cast("string"),
            lit("%)    "),
            lpad(col("n_is").cast("string"), 9, " "), lit(" ("),
            (round(col("n_is") * lit(1000.0) / col("n_p")) / 10.0)
              .cast("string"),
            lit("%)")).as("line"))),

    // uniparc_xml (ftp/uniparc.py:60-124 write_xml): per-UniParc
    // protein match XML with the two per-library behaviors the
    // reference hand-codes — PIRSR matches are excluded entirely, and
    // the location sequence-feature renders as `alignment` for
    // HAMAP/PROSITE libraries but `sequence-feature` elsewhere; the
    // optional ipr child carries parent_id only when the entry has a
    // parent.
    "uniparc_xml" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(col("l_partkey") % 6 =!= 0) // PIRSR excluded
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          graft.ops.TextOps.xmlEscape(col("p_name")).as("nm"),
          col("l_suppkey"),
          col("l_quantity").cast("int").as("score"),
          (col("l_linenumber") + floor(col("l_quantity") / 10).cast("int"))
            .as("lend"),
          element_at(array(lit("PIRSR"), lit("HAMAP"),
            lit("PROSITE patterns"), lit("PROSITE profiles"), lit("PFAM"),
            lit("CDD")), (col("l_partkey") % 6 + 1).cast("int")).as("lib"))
        .withColumn("m", concat(
          lit("<match id=\"SIG"), col("l_partkey").cast("string"),
          lit("\" name=\""), col("nm"), lit("\" dbname=\""), col("lib"),
          lit("\" status=\"T\" evd=\"HMM\" model=\"SIG"),
          col("l_partkey").cast("string"), lit("\">"),
          when(col("l_partkey") % 3 === 0, concat(
            lit("<ipr id=\"IPR"), (col("l_partkey") % 500).cast("string"),
            lit("\" name=\""), col("nm"), lit("\" type=\"Family\""),
            when(col("l_partkey") % 9 === 0, concat(
              lit(" parent_id=\"IPR"), (col("l_partkey") % 100).cast("string"),
              lit("\""))).otherwise(lit("")),
            lit("/>"))).otherwise(lit("")),
          lit("<lcn start=\""), col("l_linenumber").cast("string"),
          lit("\" end=\""), col("lend").cast("string"),
          lit("\" score=\""), col("score").cast("string"), lit("\""),
          when(col("l_suppkey") % 4 =!= 0, concat(
            lit(" fragments=\""), col("l_linenumber").cast("string"),
            lit("-"), col("lend").cast("string"), lit("-S\"")))
            .otherwise(lit("")),
          when(col("l_suppkey") % 2 === 0, concat(
            when(col("lib").isin("HAMAP", "PROSITE patterns",
              "PROSITE profiles"), lit(" alignment=\""))
              .otherwise(lit(" sequence-feature=\"")),
            lit("ft"), (col("l_suppkey") % 50).cast("string"), lit("\"")))
            .otherwise(lit("")),
          lit("/></match>")))
        .groupBy(col("l_orderkey"))
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("l_linenumber"),
            col("l_partkey"), col("m")))),
          r => r("m"))).as("inner"),
          max(col("lend")).as("maxend"))
        .select(concat(
          lit("<protein id=\"UPI"),
          lpad(col("l_orderkey").cast("string"), 10, "0"),
          lit("\" length=\""), (col("maxend") + 50).cast("string"),
          lit("\" crc64=\""), hex(col("l_orderkey") % 100000 * 977),
          lit("\">"), col("inner"), lit("</protein>")).as("xml"))
    }),

    // iprscan_go (iprscan.py:127-165 _export_go_terms): entry->GO pairs
    // restricted to checked entries, inner-joined against the GO term
    // dictionary — a pair whose term is missing from the dictionary is
    // dropped (the reference logs and skips it).
    "iprscan_go" -> ((s, d) => {
      val terms = Tables.nation(s, d).select(
        concat(lit("GO:"), lpad(col("n_nationkey").cast("string"), 7, "0"))
          .as("go_id"),
        col("n_name").as("go_name"),
        element_at(array(lit("P"), lit("F"), lit("C")),
          (col("n_nationkey") % 3 + 1).cast("int")).as("aspect"))
      // o_orderkey%40 yields term ids 25..39 with no dictionary row:
      // the inner join drops those pairs
      Tables.orders(s, d).filter(col("o_custkey") % 2 === 0)
        .select(
          concat(lit("IPR"), (col("o_custkey") % 800).cast("string"))
            .as("entry_acc"),
          concat(lit("GO:"),
            lpad((col("o_orderkey") % 40).cast("string"), 7, "0"))
            .as("go_id"))
        .join(broadcast(terms), "go_id")
        .groupBy(col("entry_acc"))
        .agg(countDistinct(col("go_id")).as("n_terms"),
          concat_ws(",", sort_array(collect_set(
            concat(col("go_id"), lit("|"), col("go_name"), lit("|"),
              col("aspect"))))).as("gos"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ebisearch_docs" ->
      """WITH base AS (
           SELECT p_partkey AS k, p_name, p_size,
                  p_partkey % 4 = 0 AS is_ipr,
                  CASE WHEN p_partkey % 4 = 0
                       THEN 'IPR' || CAST(p_partkey AS VARCHAR)
                       ELSE 'SIG' || CAST(p_partkey AS VARCHAR) END AS acc,
                  lower(split_part(p_type, ' ', 1)) AS etype,
                  CASE WHEN p_partkey % 4 = 0 THEN 'interpro'
                       ELSE ['pfam','panther','cdd','profiles','smart']
                            [p_partkey % 5 + 1] END AS db,
                  CASE WHEN p_partkey % 4 <> 0 AND p_partkey % 2 = 0
                       THEN 'IPR' || CAST(p_partkey % 500 * 4 AS VARCHAR)
                  END AS integrated,
                  CASE WHEN p_partkey % 3 <> 0 THEN p_partkey * 7 + 11
                  END AS pmid,
                  regexp_replace('<p>' || p_type || '</p> see [cite:PUB'
                    || CAST(p_partkey AS VARCHAR) || ']', '<[^>]*>', '', 'g')
                    AS stripped,
                  '[cite:PUB' || CAST(p_partkey AS VARCHAR) || ']' AS cite
           FROM part),
         desc_ AS (
           SELECT *,
                  CASE WHEN pmid IS NOT NULL
                       THEN replace(stripped, cite,
                              '[PMID:' || CAST(pmid AS VARCHAR) || ']')
                       ELSE replace(stripped, cite, '') END AS description
           FROM base),
         integ AS (
           SELECT integrated AS iacc,
                  string_agg(DISTINCT '{"name":"contributing_database","value":"'
                    || db || '"}', ','
                    ORDER BY '{"name":"contributing_database","value":"'
                    || db || '"}') AS contribf,
                  string_agg('{"dbname":"' || upper(db) || '","dbkey":"'
                    || acc || '"}', ',' ORDER BY db, acc) AS contribx
           FROM desc_ WHERE integrated IS NOT NULL GROUP BY 1)
         SELECT d.acc,
                '[' || concat_ws(',',
                  '{"name":"id","value":"' || d.acc || '"}',
                  '{"name":"type","value":"' || d.etype || '"}',
                  '{"name":"creation_date","value":"20'
                    || lpad(CAST(d.k % 25 AS VARCHAR), 2, '0') || '-'
                    || lpad(CAST(d.k % 12 + 1 AS VARCHAR), 2, '0') || '-'
                    || lpad(CAST(d.k % 28 + 1 AS VARCHAR), 2, '0') || '"}',
                  '{"name":"description","value":"' || d.description || '"}',
                  '{"name":"source_database","value":"' || d.db || '"}',
                  '{"name":"name","value":"' || d.p_name || '"}',
                  CASE WHEN d.p_size % 5 <> 0
                       THEN '{"name":"short_name","value":"sn_'
                         || CAST(d.k AS VARCHAR) || '"}' END,
                  CASE WHEN d.k % 6 = 0
                       THEN '{"name":"set","value":"CL'
                         || CAST(d.k % 100 AS VARCHAR) || '"}' END,
                  i.contribf) || ']' AS fields,
                '[' || concat_ws(',',
                  i.contribx,
                  CASE WHEN d.integrated IS NOT NULL
                       THEN '{"dbname":"INTERPRO","dbkey":"'
                         || d.integrated || '"}' END,
                  CASE WHEN d.pmid IS NOT NULL
                       THEN '{"dbname":"PUBMED","dbkey":"'
                         || CAST(d.pmid AS VARCHAR) || '"}' END)
                  || ']' AS cross_references
         FROM desc_ d LEFT JOIN integ i ON d.acc = i.iacc""",
    "iprscan_entries" ->
      """WITH checked AS (SELECT * FROM part WHERE p_size % 2 = 0),
         u AS (
           SELECT 'IPR' || CAST(p_partkey AS VARCHAR) AS acc,
                  p_brand AS name, p_name AS description,
                  ['Family','Domain','Repeat','Conserved_site',
                   'Homologous_superfamily'][p_partkey % 5 + 1] AS etype,
                  'interpro' AS dbshort, 'InterPro' AS database,
                  CAST(NULL AS VARCHAR) AS integrated
           FROM checked
           UNION ALL
           SELECT 'MTH' || CAST(s_suppkey AS VARCHAR),
                  s_name, 'supplier ' || CAST(s_suppkey AS VARCHAR),
                  ['Family','Domain','Repeat','Conserved_site',
                   'Homologous_superfamily'][s_suppkey % 5 + 1],
                  ['pfam','cdd','profile','smart','cathgene3d','panther',
                   'ssf'][s_nationkey % 7 + 1],
                  ['Pfam','CDD','PROSITE profiles','SMART','CATH-Gene3D',
                   'PANTHER','SUPERFAMILY'][s_nationkey % 7 + 1],
                  CASE WHEN e.p_partkey IS NOT NULL
                       THEN 'IPR' || CAST(s_suppkey AS VARCHAR) END
           FROM supplier
           LEFT JOIN (SELECT p_partkey FROM checked) e
             ON e.p_partkey = s_suppkey
           UNION ALL
           SELECT 'FM' || CAST(c_custkey AS VARCHAR),
                  c_name, c_mktsegment, 'Unknown',
                  ['coils','mobidblt','phobius','signalp','tmhmm']
                    [c_nationkey % 5 + 1],
                  ['Coils','MobiDB Lite','Phobius','SignalP','TMHMM']
                    [c_nationkey % 5 + 1],
                  NULL
           FROM customer WHERE c_custkey % 10 < 2),
         r AS (
           SELECT *,
                  list_position(['pfam','cdd','profile','smart','ncbifam',
                    'cathgene3d','ssf'], dbshort) AS domidx,
                  list_position(['pfam','panther','pirsf','hamap','ncbifam',
                    'sfld'], dbshort) AS famidx
           FROM u)
         SELECT acc, name, description, etype, database, integrated,
                CASE WHEN lower(etype) IN ('domain','repeat','conserved_site',
                       'homologous_superfamily')
                      AND coalesce(domidx, 0) > 0 THEN 'domain'
                     WHEN lower(etype) = 'family'
                      AND coalesce(famidx, 0) > 0 THEN 'family'
                END AS repr_type,
                CAST(CASE WHEN lower(etype) IN ('domain','repeat',
                       'conserved_site','homologous_superfamily')
                      AND coalesce(domidx, 0) > 0 THEN domidx - 1
                     WHEN lower(etype) = 'family'
                      AND coalesce(famidx, 0) > 0 THEN famidx - 1
                     ELSE 0 END AS BIGINT) AS repr_index
         FROM r""",
    "iprscan_pathways" ->
      """SELECT 'IPR' || CAST(l_partkey % 1000 AS VARCHAR) AS entry_acc,
                CAST(COUNT(DISTINCT pathway_id) AS BIGINT) AS n_pathways,
                string_agg(DISTINCT pathway_id, ',' ORDER BY pathway_id)
                  AS pathways
         FROM (SELECT l_partkey,
                      ['MC','R-HSA-','map'][l_suppkey % 3 + 1]
                        || CAST(l_orderkey % 300 AS VARCHAR) AS pathway_id
               FROM lineitem)
         GROUP BY 1""",
    "iprscan_manifest" ->
      """WITH dbs AS (
           SELECT ['Pfam','CDD','PROSITE profiles','SMART','CATH-Gene3D',
                   'PANTHER','SUPERFAMILY']
                    [CAST(s_nationkey % 7 + 1 AS INT)] AS db,
                  CAST(MIN(s_suppkey) % 90 AS VARCHAR) || '.0' AS version
           FROM supplier GROUP BY 1),
         tpl(db, dir, src_member, dst_member) AS (VALUES
           ('Pfam','pfam','pfam_a.dat','pfam_a.dat'),
           ('Pfam','pfam','pfam_a.hmm','pfam_a.hmm'),
           ('CDD','cdd','data','data'),
           ('CDD','cdd','db','db'),
           ('PROSITE profiles','prosite','evaluator.dat','evaluator.dat'),
           ('PROSITE profiles','prosite','prosite_patterns.dat','prosite_patterns.dat'),
           ('PROSITE profiles','prosite','prosite_profiles','prosite_profiles'),
           ('PROSITE profiles','prosite','skip_flagged_profiles.txt','skip_flagged_profiles.txt'),
           ('SMART','smart','smart-hmmer3/smart.HMMs','hmmer3/smart.HMMs'),
           ('CATH-Gene3D','cath-gene3d','gene3d_main.hmm','gene3d/gene3d_main.hmm'),
           ('CATH-Gene3D','cath-gene3d','discontinuous/discontinuous_regs.pkl.py3','gene3d/discontinuous_regs.pkl.py3'),
           ('CATH-Gene3D','cath-gene3d','model_to_family_map.tsv','gene3d/model_to_family_map.tsv'),
           ('PANTHER','panther','famhmm','famhmm'),
           ('PANTHER','panther','Tree_MSF','Tree_MSF'),
           ('SUPERFAMILY','superfamily','hmmlib_1.75','hmmlib_1.75'),
           ('SUPERFAMILY','superfamily','self_hits.tab','self_hits.tab'))
         SELECT d.db, d.version,
                dir || '/' || version || '/' || src_member AS src_path,
                dir || '/' || version || '/' || dst_member AS dst_path
         FROM dbs d JOIN tpl USING (db)""",
    "relnotes_types" ->
      """SELECT etype,
                lpad(upper(substring(replace(etype, '_', ' '), 1, 1))
                  || substring(replace(etype, '_', ' '), 2), 22, ' ')
                || ' ' || lpad(CAST(n AS VARCHAR), 6, ' ') AS line
         FROM (SELECT ['family','domain','repeat','conserved_site',
                       'homologous_superfamily'][p_partkey % 5 + 1] AS etype,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM part GROUP BY 1)""",
    "relnotes_members" ->
      """WITH checked AS (SELECT p_partkey FROM part WHERE p_size % 2 = 0),
         g AS (
           SELECT ['Pfam','CDD','PROSITE profiles','SMART','CATH-Gene3D',
                   'PANTHER','SUPERFAMILY'][s_nationkey % 7 + 1] AS db,
                  s_suppkey, e.p_partkey AS pk
           FROM supplier LEFT JOIN checked e ON e.p_partkey = s_suppkey),
         a AS (SELECT db, CAST(COUNT(*) AS BIGINT) AS sigs,
                      CAST(COUNT(pk) AS BIGINT) AS integrated,
                      CAST(MIN(s_suppkey) % 90 AS VARCHAR) || '.0' AS version
               FROM g GROUP BY 1)
         SELECT db,
                lpad(db, 18, ' ') || lpad(version, 12, ' ')
                || lpad(CAST(sigs AS VARCHAR), 25, ' ')
                || lpad(CAST(integrated AS VARCHAR), 33, ' ') AS line
         FROM a""",
    "relnotes_coverage" ->
      """SELECT CASE o_orderstatus
                  WHEN 'F' THEN 'UniProtKB/TrEMBL'
                  WHEN 'O' THEN 'UniProtKB'
                  ELSE 'UniProtKB/Swiss-Prot' END AS seqdb,
                lpad(CAST(n_p AS VARCHAR), 21, ' ') || '    '
                || lpad(CAST(n_s AS VARCHAR), 9, ' ') || ' ('
                || CAST(round(n_s * 1000.0 / n_p) / 10.0 AS VARCHAR)
                || '%)    '
                || lpad(CAST(n_is AS VARCHAR), 9, ' ') || ' ('
                || CAST(round(n_is * 1000.0 / n_p) / 10.0 AS VARCHAR)
                || '%)' AS line
         FROM (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_p,
                      CAST(COUNT(CASE WHEN o_custkey % 3 <> 0 THEN 1 END)
                           AS BIGINT) AS n_s,
                      CAST(COUNT(CASE WHEN o_custkey % 7 = 0 THEN 1 END)
                           AS BIGINT) AS n_is
               FROM orders GROUP BY 1)""",
    "uniparc_xml" ->
      """WITH b AS (
           SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                  replace(replace(replace(p_name, '&', '&amp;'),
                          '<', '&lt;'), '>', '&gt;') AS nm,
                  CAST(l_quantity AS INT) AS score,
                  l_linenumber + CAST(floor(l_quantity / 10) AS INT) AS lend,
                  ['PIRSR','HAMAP','PROSITE patterns','PROSITE profiles',
                   'PFAM','CDD'][l_partkey % 6 + 1] AS lib
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_partkey % 6 <> 0),
         m AS (
           SELECT *,
                  '<match id="SIG' || CAST(l_partkey AS VARCHAR)
                  || '" name="' || nm || '" dbname="' || lib
                  || '" status="T" evd="HMM" model="SIG'
                  || CAST(l_partkey AS VARCHAR) || '">'
                  || CASE WHEN l_partkey % 3 = 0
                       THEN '<ipr id="IPR' || CAST(l_partkey % 500 AS VARCHAR)
                         || '" name="' || nm || '" type="Family"'
                         || CASE WHEN l_partkey % 9 = 0
                              THEN ' parent_id="IPR'
                                || CAST(l_partkey % 100 AS VARCHAR) || '"'
                              ELSE '' END
                         || '/>'
                       ELSE '' END
                  || '<lcn start="' || CAST(l_linenumber AS VARCHAR)
                  || '" end="' || CAST(lend AS VARCHAR)
                  || '" score="' || CAST(score AS VARCHAR) || '"'
                  || CASE WHEN l_suppkey % 4 <> 0
                       THEN ' fragments="' || CAST(l_linenumber AS VARCHAR)
                         || '-' || CAST(lend AS VARCHAR) || '-S"'
                       ELSE '' END
                  || CASE WHEN l_suppkey % 2 = 0
                       THEN (CASE WHEN lib IN ('HAMAP','PROSITE patterns',
                                    'PROSITE profiles')
                               THEN ' alignment="'
                               ELSE ' sequence-feature="' END)
                         || 'ft' || CAST(l_suppkey % 50 AS VARCHAR) || '"'
                       ELSE '' END
                  || '/></match>' AS mx
           FROM b)
         SELECT '<protein id="UPI'
                || lpad(CAST(l_orderkey AS VARCHAR), 10, '0')
                || '" length="' || CAST(MAX(lend) + 50 AS VARCHAR)
                || '" crc64="' || hex(l_orderkey % 100000 * 977) || '">'
                || string_agg(mx, '' ORDER BY l_linenumber, l_partkey, mx)
                || '</protein>' AS xml
         FROM m GROUP BY l_orderkey""",
    "iprscan_go" ->
      """WITH terms AS (
           SELECT 'GO:' || lpad(CAST(n_nationkey AS VARCHAR), 7, '0')
                    AS go_id,
                  n_name AS go_name,
                  ['P','F','C'][n_nationkey % 3 + 1] AS aspect
           FROM nation),
         pairs AS (
           SELECT 'IPR' || CAST(o_custkey % 800 AS VARCHAR) AS entry_acc,
                  'GO:' || lpad(CAST(o_orderkey % 40 AS VARCHAR), 7, '0')
                    AS go_id
           FROM orders WHERE o_custkey % 2 = 0)
         SELECT entry_acc,
                CAST(COUNT(DISTINCT p.go_id) AS BIGINT) AS n_terms,
                string_agg(DISTINCT p.go_id || '|' || t.go_name || '|'
                  || t.aspect, ','
                  ORDER BY p.go_id || '|' || t.go_name || '|' || t.aspect)
                  AS gos
         FROM pairs p JOIN terms t ON p.go_id = t.go_id
         GROUP BY 1"""
  )
}
