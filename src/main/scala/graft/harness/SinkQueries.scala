package graft.harness

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-surface operators (SURVEY.md §2.1 S15/S16, §2.10 K7/K8):
  * the flat-file and XML sinks and the Elasticsearch document
  * denormalizer, expressed as oracle-checkable content queries — the
  * actual file writes (`.write.text` with gzip codec, partitioned
  * fragment concat) are exercised in SinksSpec; content generation is
  * the distributed part that matters at scale.
  */
object SinkQueries {
  type Q = (SparkSession, String) => DataFrame

  /** XML-escape the three structural characters (reference escapes via
    * DOM; we emit fragments directly, interpro/ftp/xmlfiles.py:457-553).
    */
  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"),
      "<", "&lt;"), ">", "&gt;")

  val queries: Map[String, Q] = Map(
    // S15: protein2ipr.dat-shaped gzip TSV lines
    // (interpro/ftp/flatfiles.py:88-122): one tab-joined line per
    // (protein, entry, signature, location), globally line-formatted
    // in executors; the sink is then a plain `.write.text`.
    "sink_flatfile_tsv" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(col("l_partkey") % 3 === 0)
        .select(concat_ws("\t",
          col("l_orderkey").cast("string"),
          concat(lit("IPR"), (col("l_partkey") % 7).cast("string")),
          col("p_name"),
          concat(lit("SIG"), (col("l_partkey") % 20).cast("string")),
          col("l_linenumber").cast("string"),
          (col("l_linenumber") + floor(col("l_quantity") / 10).cast("int"))
            .cast("string")).as("line"))
    }),

    // S16/K7: per-protein XML fragment emit (match_complete.xml shape,
    // interpro/ftp/xmlfiles.py:556-656): nested <match> elements
    // sorted within each <protein>, escaped, built entirely inside the
    // group aggregation — the driver only concatenates fragments.
    "sink_xml_fragments" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          xmlEscape(col("p_name")).as("nm"))
        .groupBy(col("l_orderkey"))
        .agg(concat_ws("", transform(
          sort_array(collect_list(struct(col("l_linenumber"), col("l_partkey"), col("nm")))),
          r => concat(lit("<match id=\"P"), r("l_partkey").cast("string"),
            lit("\" name=\""), r("nm"),
            lit("\" pos=\""), r("l_linenumber").cast("string"),
            lit("\"/>")))).as("inner"),
          count(lit(1)).as("n"))
        .select(concat(lit("<protein id=\""), col("l_orderkey").cast("string"),
          lit("\" count=\""), col("n").cast("string"), lit("\">"),
          col("inner"), lit("</protein>")).as("xml"))
    }),

    // K9: per-database match formatter dispatch (InterProScan lookup
    // reshapes each library's matches differently — format_cdd /
    // format_panther / ..., interpro/lookup.py:136-420): a when()
    // dispatch emitting a per-db JSON document shape, string-built so
    // both engines render identically.
    "fmt_dispatch" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_returnflag").as("db"), col("l_quantity"))
      li.select(col("l_orderkey"), col("l_linenumber"), col("db"),
        when(col("db") === "A",
          concat(lit("{\"lib\":\"cdd\",\"acc\":\"P"), col("l_partkey").cast("string"),
            lit("\",\"sites\":"), col("l_quantity").cast("int").cast("string"),
            lit("}")))
        .when(col("db") === "N",
          concat(lit("{\"lib\":\"panther\",\"acc\":\"P"), col("l_partkey").cast("string"),
            lit("\",\"subfam\":\"SF"), (col("l_partkey") % 10).cast("string"),
            lit("\"}")))
        .otherwise(
          concat(lit("{\"lib\":\"pfam\",\"acc\":\"P"), col("l_partkey").cast("string"),
            lit("\",\"clan\":\"CL"), (col("l_partkey") % 5).cast("string"),
            lit("\"}"))).as("doc"))
    }),

    // K8: relationship-document denormalizer with fallback docs
    // (interpro/elastic/export.py:478-701): one doc per
    // (order × lineitem), plus a fallback doc for orders with no
    // lines — the left-join + conditional emit shape.
    "fanout_docs" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_outer")
        .select(
          concat(col("o_orderkey").cast("string"), lit("-"),
            coalesce(col("l_linenumber").cast("string"), lit("none"))).as("doc_id"),
          col("o_orderkey"),
          when(col("l_linenumber").isNotNull, "rel").otherwise("fallback")
            .as("doc_type"),
          coalesce(col("l_partkey"), lit(-1)).as("rel_part"),
          col("o_orderstatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sink_flatfile_tsv" ->
      """SELECT concat_ws(chr(9),
                CAST(l_orderkey AS VARCHAR),
                'IPR' || CAST(l_partkey % 7 AS VARCHAR),
                p_name,
                'SIG' || CAST(l_partkey % 20 AS VARCHAR),
                CAST(l_linenumber AS VARCHAR),
                CAST(l_linenumber + CAST(floor(l_quantity / 10) AS INT) AS VARCHAR)) AS line
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_partkey % 3 = 0""",
    "sink_xml_fragments" ->
      """SELECT '<protein id="' || CAST(l_orderkey AS VARCHAR) ||
                '" count="' || CAST(COUNT(*) AS VARCHAR) || '">' ||
                string_agg('<match id="P' || CAST(l_partkey AS VARCHAR) ||
                           '" name="' ||
                           replace(replace(replace(p_name, '&', '&amp;'),
                                   '<', '&lt;'), '>', '&gt;') ||
                           '" pos="' || CAST(l_linenumber AS VARCHAR) || '"/>',
                           '' ORDER BY l_linenumber, l_partkey,
                           replace(replace(replace(p_name, '&', '&amp;'),
                                   '<', '&lt;'), '>', '&gt;')) ||
                '</protein>' AS xml
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY l_orderkey""",
    "fmt_dispatch" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag AS db,
                CASE WHEN l_returnflag = 'A' THEN
                       '{"lib":"cdd","acc":"P' || CAST(l_partkey AS VARCHAR) ||
                       '","sites":' || CAST(CAST(l_quantity AS INT) AS VARCHAR) || '}'
                     WHEN l_returnflag = 'N' THEN
                       '{"lib":"panther","acc":"P' || CAST(l_partkey AS VARCHAR) ||
                       '","subfam":"SF' || CAST(l_partkey % 10 AS VARCHAR) || '"}'
                     ELSE
                       '{"lib":"pfam","acc":"P' || CAST(l_partkey AS VARCHAR) ||
                       '","clan":"CL' || CAST(l_partkey % 5 AS VARCHAR) || '"}'
                END AS doc
         FROM lineitem""",
    "fanout_docs" ->
      """SELECT CAST(o_orderkey AS VARCHAR) || '-' ||
                COALESCE(CAST(l_linenumber AS VARCHAR), 'none') AS doc_id,
                o_orderkey,
                CASE WHEN l_linenumber IS NOT NULL THEN 'rel'
                     ELSE 'fallback' END AS doc_type,
                COALESCE(l_partkey, -1) AS rel_part,
                o_orderstatus
         FROM orders o LEFT JOIN
              (SELECT * FROM lineitem WHERE l_quantity > 45) l
              ON o.o_orderkey = l.l_orderkey"""
  )
}
