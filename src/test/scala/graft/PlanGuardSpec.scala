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

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
  import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

  /** BroadcastNestedLoopJoin is acceptable ONLY where the build side
    * is deliberately tiny or single-row, and each allowlist entry
    * DECLARES its build-side row bound, which the test enforces from
    * the executed plan's broadcast metrics — a build side that grows
    * with the data fails here instead of melting a cluster:
    *  - ann_* search/recall queries: either a <=64-row centroid
    *    assignment cross or the fixed 50-query brute-force ground
    *    truth broadcast — bound 64;
    *  - dedup_semantic: the <=8-row kmeans cell assignment — 64;
    *  - join_asof / sample_mixture: a dimension-sized (<=25 nations /
    *    source-weight rows) threshold broadcast — 32;
    *  - the census singles (agg_having_regroup, sample_temperature,
    *    sample_dsir, text_collocations, text_perplexity, text_tfidf,
    *    text_langid_*): a one-row (or one-per-lang profile collapsed
    *    to one row) aggregate broadcast onto the scan — bound 4.
    */
  private val bnljAllowed: Map[String, Long] = Map(
    "ann_cosine_topk" -> 64L, "ann_ivf_topk" -> 64L,
    "ann_ivf_kmeans_topk" -> 64L, "ann_ivf_recall" -> 64L,
    "ann_ivf_nprobe_recall" -> 64L, "ann_lsh_topk" -> 64L,
    "ann_pq_recall" -> 64L,
    "ann_mrr" -> 64L, // the fixed 50-query brute-force broadcast
    "ann_int8_topk" -> 64L,
    "ann_int8_ivf_topk" -> 64L, // centroid assignment cross only
    "ann_int8_ivf_recall" -> 64L, // + the 50-query exhaustive half
    "dedup_semantic" -> 64L,
    "ann_hybrid_rrf" -> 64L, // 1-row census + 5-query brute-force cross
    "embed_outliers" -> 64L, // <=8-row centroid assignment cross
    "ann_hard_negatives" -> 64L, // <=8-row centroid assignment cross
    "sample_diverse" -> 64L, // <=8-row centroid assignment cross
    "embed_kmeans" -> 64L, // <=8-row centroid assignment cross per round
    "agg_countmin_est" -> 4L, // one-row CMS broadcast onto 20 probes
    "agg_bloom_filter" -> 4L, // one-row bloom broadcast onto 60 probes
    "dedup_decontaminate_bloom" -> 4L, // one-row bloom onto the train scan
    "agg_having_regroup" -> 4L, "sample_temperature" -> 4L,
    "agg_source_balance" -> 4L, // one-row totals onto the source census
    "sample_mixture" -> 32L, "join_asof" -> 32L,
    "text_langid_ngram" -> 4L, "text_langid_sampled" -> 4L,
    "text_collocations" -> 4L,
    "sample_dsir" -> 4L,
    "text_perplexity" -> 4L,
    "text_perplexity_kn" -> 4L, // one-row bigram-type census broadcast
    "text_tfidf" -> 4L,
    "text_bm25" -> 4L, // one-row census broadcast onto tf/idf frames
    "dedup_simhash_eval" -> 4L) // three 1-row gauge scalars crossed

  /** Collect BNLJ nodes, descending through the adaptive/stage leaf
    * wrappers `TreeNode.collect` cannot see past.
    */
  private def collectBnlj(p: SparkPlan): Seq[BroadcastNestedLoopJoinExec] =
    p match {
      case a: AdaptiveSparkPlanExec => collectBnlj(a.executedPlan)
      case s: QueryStageExec => collectBnlj(s.plan)
      case b: BroadcastNestedLoopJoinExec =>
        b +: b.children.flatMap(collectBnlj)
      case other => other.children.flatMap(collectBnlj)
    }

  /** The build side's materialized row count, read from the broadcast
    * exchange's post-execution metrics (following stage/reuse
    * wrappers to the owning exchange).
    */
  private def buildRows(b: BroadcastNestedLoopJoinExec): Long = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case s: QueryStageExec => unwrap(s.plan)
      case r: ReusedExchangeExec => unwrap(r.child)
      case other => other
    }
    val side = unwrap(b.buildSide match {
      case BuildLeft => b.left
      case BuildRight => b.right
    })
    side.metrics.get("numOutputRows").map(_.value).getOrElse(
      sys.error(s"no numOutputRows metric on build side ${side.nodeName}"))
  }

  test("no registered query plans a CartesianProduct or un-allowlisted BroadcastNestedLoopJoin; allowlisted build sides honor their declared row bound") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("stream_"))
      .foreach { case (name, fn) =>
        val df = fn(spark, sf)
        val plan = df.queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin")) {
          bnljAllowed.get(name) match {
            case None =>
              failures += s"$name: BroadcastNestedLoopJoin outside the allowlist"
            case Some(bound) =>
              // execute, then read what each BNLJ build side actually
              // materialized — the declared bound is enforced, not
              // trusted from the comment
              df.count()
              collectBnlj(df.queryExecution.executedPlan).foreach { b =>
                val rows = buildRows(b)
                if (rows > bound)
                  failures += s"$name: BNLJ build side materialized " +
                    s"$rows rows > declared bound $bound"
              }
          }
        }
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
