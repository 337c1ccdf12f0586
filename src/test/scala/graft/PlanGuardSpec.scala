package graft

/** Plan-regression guard: every registered query's physical plan is
  * checked for the shapes that kill a 100 TB run. A query that ships
  * with an accidental cartesian product or an un-allowlisted
  * broadcast nested-loop join fails here at test time instead of
  * melting a cluster later.
  *
  * Streaming queries are excluded: invoking their harness lambda
  * EXECUTES the drain (start + awaitTermination), and their stateful
  * micro-batch plans are pinned by their own suites
  * (NearDedupReplaySpec, the stream oracle rows in CORRECTNESS).
  */
class PlanGuardSpec extends SparkSpec {

  /** BroadcastNestedLoopJoin is acceptable ONLY where the build side is
    * deliberately tiny or single-row:
    *  - ann_cosine_topk: the explicit brute-force recall baseline
    *    (documented as the reference point the bucketed paths beat)
    *  - ann_ivf_* / ann_lsh variants: IVF/kmeans centroid assignment —
    *    the probe side crosses a <=64-row centroid table
    *  - agg_having_regroup / sample_temperature / join_asof: a
    *    single-row (or dimension-sized) census/threshold broadcast
    *    crossed onto the scan; the build side cannot grow with data
    *  - text_langid_ngram / _sampled: the learned trigram profile
    *    (langs x 20 rows, collapsed to ONE row) broadcast onto the
    *    scoring scan — profile size is fixed by construction
    */
  private val bnljAllowed = Set(
    "ann_cosine_topk", "ann_ivf_topk", "ann_ivf_kmeans_topk",
    "ann_ivf_recall", "ann_ivf_nprobe_recall", "ann_lsh_topk",
    "ann_pq_recall", // exact-L2 ground truth: 50-query broadcast cross
    "ann_int8_topk", // quantized brute force: 50-query broadcast cross
    "dedup_semantic", // kmeans cell assignment: <=8-row centroid cross

    "agg_having_regroup", "sample_temperature", "sample_mixture",
    "join_asof",
    "text_langid_ngram", "text_langid_sampled",
    "text_collocations", // single-row (NT, NB) census broadcast
    "sample_dsir", // single-row (tot_s, tot_t, V) census broadcast
    "text_perplexity", // single-row vocabulary-size census broadcast
    "text_tfidf") // single-row corpus-count census broadcast

  test("no registered query plans a CartesianProduct or un-allowlisted BroadcastNestedLoopJoin") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .foreach { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
          failures += s"$name: BroadcastNestedLoopJoin outside the allowlist"
      }
    assert(failures.isEmpty,
      s"scale-killer plan shapes:\n${failures.mkString("\n")}")
  }

  test("scans prune columns: the projection query reads only referenced columns") {
    // representative pushdown check — scan_project selects 2 of
    // lineitem's 16 columns; the parquet ReadSchema must shrink to
    // exactly those (column pruning reaching the scan is what every
    // other query relies on too)
    val plan = SparkEntry.queries("scan_project")(spark, sf)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val cols = readSchema.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(cols.subsetOf(Set("l_orderkey", "l_partkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_returnflag")),
      s"scan_project reads more than its referenced columns: $readSchema\n$plan")
  }

  test("filters push down to the parquet scan") {
    val plan = SparkEntry.queries("filter_in")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert("PushedFilters: \\[[^\\]]*In\\(".r.findFirstIn(plan).isDefined ||
      "PushedFilters: \\[[^\\]]*EqualTo\\(".r.findFirstIn(plan).isDefined,
      s"filter_in's IN predicate did not reach the scan:\n$plan")
  }
}
