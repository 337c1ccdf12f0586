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

  val queries: Map[String, Q] = Map(
    // K1/K2/K3 over synthetic matches derived from lineitem:
    // protein=order, signature=part%20, entry=part%7 for 1/3 of rows,
    // kind/rank from (linenumber, suppkey), fragments from
    // (linenumber, quantity). Rows-only check (the 10% condense sweep
    // and subset search are not SQL-expressible).
    "kernel_match_merge" -> ((s, d) => {
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
          lit("CONTINUOUS").as("status"))).as("fragments"))
        .as[MatchMerge.RawMatch]
      MatchPipeline.mergeMatches(raw).toDF()
        .select(col("proteinAcc").as("protein_acc"), col("acc"),
          col("isEntry").as("is_entry"),
          size(col("locations")).cast("long").as("n_locs"),
          concat_ws(";", transform(col("locations"),
            l => concat_ws("-", l("start").cast("string"), l("end").cast("string"),
              l("representative").cast("string")))).as("locs"))
    }),

    // Iterative lineage closure over region->nation->customer parent
    // edges, then stringified root->self paths (oracle = static joins;
    // the Spark side genuinely iterates, depth-agnostic).
    "lineage_closure" -> ((s, d) => {
      val r = Tables.region(s, d).select(
        concat(lit("R"), col("r_regionkey").cast("string")).as("id"),
        lit(null).cast("string").as("parent"))
      val n = Tables.nation(s, d).select(
        concat(lit("N"), col("n_nationkey").cast("string")).as("id"),
        concat(lit("R"), col("n_regionkey").cast("string")).as("parent"))
      val c = Tables.customer(s, d).select(
        concat(lit("C"), col("c_custkey").cast("string")).as("id"),
        concat(lit("N"), col("c_nationkey").cast("string")).as("parent"))
      Graphs.lineageClosure(r.unionByName(n).unionByName(c), "id", "parent")
        .select(col("id"), concat_ws(">", col("lineage")).as("path"))
    })
  )

  val oracle: Map[String, String] = Map(
    // kernel_match_merge: intentionally no oracle (non-SQL kernel).
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
