package graft.harness

import graft.Tables
import graft.intervals.Intervals.Fragment
import graft.kernels.{MatchMerge, MatchPipeline}
import graft.ops.Graphs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kernel + graph operators exercised through the driver harness:
  * K1-K3 match merging (typed mapGroups island) and the iterative
  * lineage closure (SURVEY.md §2.10, §4.3).
  */
object KernelQueries {
  type Q = (SparkSession, String) => DataFrame

  /** K1/K2/K3 merged matches over synthetic matches derived from
    * lineitem: protein=order, signature=part%20, entry=part%7 for 1/3
    * of rows, kind/rank from (linenumber, suppkey), fragments from
    * (linenumber, quantity). Full rich shape (locations with
    * representative flags + condensed entry rows) — consumed by
    * ReleasePipeline; the condense sweep and repr subset search are
    * gated by MatchMergeSpec + the 80-case reference differential.
    */
  def mergedMatches(s: SparkSession, d: String): DataFrame =
    mergedRaw(s, d)
      .select(col("proteinAcc").as("protein_acc"), col("acc"),
        col("isEntry").as("is_entry"),
        size(col("locations")).cast("long").as("n_locs"),
        size(filter(col("locations"), l => l("subfamily").isNotNull))
          .cast("long").as("n_subfam"),
        concat_ws(";", transform(col("locations"),
          l => concat_ws("-", l("start").cast("string"), l("end").cast("string"),
            l("representative").cast("string")))).as("locs"))

  private def mergedRaw(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = Tables.lineitem(s, d).select(
      col("l_orderkey").cast("string").as("proteinAcc"),
      concat(lit("SIG"), (col("l_partkey") % 20).cast("string")).as("signatureAcc"),
      when(col("l_partkey") % 3 === 0,
        concat(lit("IPR"), (col("l_partkey") % 7).cast("string"))).as("entryAcc"),
      when(col("l_linenumber") % 3 === 0, "domain")
        .when(col("l_linenumber") % 3 === 1, "family")
        .otherwise("region").as("kind"),
      (col("l_suppkey") % 3).cast("int").as("rank"),
      col("l_extendedprice").as("score"),
      array(struct(
        col("l_linenumber").as("start"),
        (col("l_linenumber") + floor(col("l_quantity") / 10).cast("int")).as("end"),
        lit("CONTINUOUS").as("status"))).as("fragments"),
      // a slice of hits carries a PANTHER subfamily model so the
      // per-location subfamily annotation is exercised end to end
      when(col("l_partkey") % 4 === 0,
        concat(lit("PTHR"), (col("l_partkey") % 20).cast("string"),
          lit(":SF"), (col("l_partkey") % 5).cast("string"))).as("model"))
      .as[MatchMerge.RawMatch]
    MatchPipeline.mergeMatches(raw).toDF()
  }

  val queries: Map[String, Q] = Map(
    // K1 driver gate: the SQL-expressible projection of the merge
    // kernel's signature-level rows (reference semantics
    // interpro/oracle/matches.py:287-350): per (protein, signature)
    // one location per hit, so the oracle can recount locations and
    // recompute the leftmost start / rightmost end / subfamily count
    // straight from lineitem. The non-SQL parts (10% condense sweep
    // on entry rows, representative subset search) stay covered by
    // MatchMergeSpec + the 80-case reference differential; the
    // numbers checked HERE are computed from the kernel's actual
    // output, so a merge regression that drops/duplicates a location
    // or misattaches a subfamily breaks the hash.
    "kernel_match_merge" -> ((s, d) =>
      mergedRaw(s, d)
        .filter(!col("isEntry"))
        .select(col("proteinAcc").as("protein_acc"), col("acc"),
          size(col("locations")).cast("long").as("n_locs"),
          size(filter(col("locations"), l => l("subfamily").isNotNull))
            .cast("long").as("n_subfam"),
          array_min(transform(col("locations"), l => l("start")))
            .cast("long").as("min_start"),
          array_max(transform(col("locations"), l => l("end")))
            .cast("long").as("max_end"))),

    // PANTHER-subfamily / CATH-FunFam hierarchy rewrite + validation
    // (reference entries.py:785-813) over signatures synthesized from
    // part: PTHR families, PTHR:SF subfamilies, G3DSA superfamilies,
    // G3DSA:FF FunFams, and plain accessions with pass-through
    // integration. Container accessions exist by construction.
    "sig_hierarchy" -> ((s, d) => {
      val k = col("p_partkey")
      // family/superfamily digits come from k DIV 4 / k DIV 8 so they
      // are independent of the branch selector's residue (k%4 fixes
      // k's parity, which would otherwise make container digits and
      // member digits disjoint sets)
      val d10 = (expr("p_partkey DIV 4") % 10).cast("string")
      val d5 = (expr("p_partkey DIV 8") % 5).cast("string")
      val acc = when(k % 4 === 1, concat(lit("PTHR"), d10))
        .when(k % 4 === 2,
          concat(lit("PTHR"), d10, lit(":SF"), (k % 7).cast("string")))
        .when(k % 8 === 3, concat(lit("G3DSA:1.10."), d5, lit(".10")))
        .when(k % 8 === 7,
          concat(lit("G3DSA:1.10."), d5,
            lit(".10:FF:"), (k % 6).cast("string")))
        .otherwise(concat(lit("PF"), (k % 100).cast("string")))
      val sigs = Tables.part(s, d).select(
        acc.as("acc"),
        lit(null).cast("string").as("parent"),
        when(k % 4 === 0, concat(lit("IPR"), (k % 5).cast("string")))
          .as("integrated_in"),
        lit(true).as("public")
      ).distinct()
      graft.ops.SignatureHierarchy.validate(sigs)
    }),

    // Iterative lineage closure over region->nation->customer parent
    // edges, then stringified root->self paths (oracle = static joins;
    // the Spark side genuinely iterates, depth-agnostic).
    "lineage_closure" -> ((s, d) =>
      // the closure itself comes from the session-shared cache —
      // agg_tree_ranks walks the same taxonomy, and the iterative
      // loop is the whole cost of both queries
      SharedFrames.taxaLineage(s, d)
        .select(col("id"), concat_ws(">", col("lineage")).as("path")))
  )

  val oracle: Map[String, String] = Map(
    // Recomputes the signature-level projection straight from
    // lineitem: every hit is one location (single CONTINUOUS
    // fragment), so n_locs is a row count, min/max bounds come from
    // (l_linenumber, l_linenumber + floor(qty/10)), and the PANTHER
    // subfamily annotation fires exactly on partkey%4=0 hits.
    "kernel_match_merge" ->
      """WITH raw AS (
           SELECT CAST(l_orderkey AS VARCHAR) AS protein_acc,
                  'SIG' || CAST(l_partkey % 20 AS VARCHAR) AS acc,
                  CAST(l_linenumber AS BIGINT) AS s,
                  CAST(l_linenumber + CAST(FLOOR(l_quantity / 10) AS INTEGER)
                       AS BIGINT) AS e,
                  (l_partkey % 4 = 0) AS subfam
           FROM lineitem)
         SELECT protein_acc, acc, COUNT(*) AS n_locs,
                CAST(SUM(CASE WHEN subfam THEN 1 ELSE 0 END) AS BIGINT) AS n_subfam,
                MIN(s) AS min_start, MAX(e) AS max_end
         FROM raw GROUP BY 1, 2""",
    "sig_hierarchy" ->
      """WITH sigs AS (
           SELECT DISTINCT
             CASE WHEN p_partkey%4=1 THEN 'PTHR' || CAST((p_partkey//4)%10 AS VARCHAR)
                  WHEN p_partkey%4=2 THEN 'PTHR' || CAST((p_partkey//4)%10 AS VARCHAR)
                                          || ':SF' || CAST(p_partkey%7 AS VARCHAR)
                  WHEN p_partkey%8=3 THEN 'G3DSA:1.10.' || CAST((p_partkey//8)%5 AS VARCHAR) || '.10'
                  WHEN p_partkey%8=7 THEN 'G3DSA:1.10.' || CAST((p_partkey//8)%5 AS VARCHAR)
                                          || '.10:FF:' || CAST(p_partkey%6 AS VARCHAR)
                  ELSE 'PF' || CAST(p_partkey%100 AS VARCHAR) END AS acc,
             CASE WHEN p_partkey%4=0 THEN 'IPR' || CAST(p_partkey%5 AS VARCHAR) END AS integrated_in
           FROM part),
         t AS (
           SELECT acc, integrated_in,
             CASE WHEN regexp_full_match(acc, 'PTHR\d+:SF\d+')
                    THEN regexp_extract(acc, '(PTHR\d+):SF\d+', 1)
                  WHEN regexp_full_match(acc, 'G3DSA:\d+\.\d+\.\d+\.\d+:FF:\d+')
                    THEN regexp_extract(acc, '(G3DSA:\d+\.\d+\.\d+\.\d+):FF:\d+', 1)
             END AS target
           FROM sigs)
         SELECT acc, target AS parent,
                COALESCE(target, integrated_in) AS integrated_in,
                target IS NULL AS public
         FROM t""",
    "lineage_closure" ->
      """SELECT 'R' || CAST(r_regionkey AS VARCHAR) AS id,
                'R' || CAST(r_regionkey AS VARCHAR) AS path FROM region
         UNION ALL
         SELECT 'N' || CAST(n_nationkey AS VARCHAR),
                'R' || CAST(n_regionkey AS VARCHAR) || '>' ||
                'N' || CAST(n_nationkey AS VARCHAR) FROM nation
         UNION ALL
         SELECT 'C' || CAST(c_custkey AS VARCHAR),
                'R' || CAST(n_regionkey AS VARCHAR) || '>' ||
                'N' || CAST(c_nationkey AS VARCHAR) || '>' ||
                'C' || CAST(c_custkey AS VARCHAR)
         FROM customer JOIN nation ON c_nationkey = n_nationkey"""
  )
}
