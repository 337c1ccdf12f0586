package graft

import graft.harness.WindowQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plan + equality pin for the rank-1 argmax lowering (r14 verdict
  * item 4): `window_rownum` must NOT plan a window or a sort — the
  * window form sorts each key's whole partition on one task (276k
  * rows for the sf1z hot customer, SCALE.md's named straggler) — and
  * must produce exactly the window form's rows (the ordering is total:
  * o_orderkey is unique, so rank-1 and argmax agree bit-for-bit).
  */
class WindowShapeSpec extends SparkSpec {

  test("window_rownum plans a partial-agg argmax: no Window, no global Sort, two-phase aggregate") {
    // physical-plan pins need AQE off — AdaptiveSparkPlanExec hides
    // child nodes from plan.collect until stages materialize
    val sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    val df = WindowQueries.queries("window_rownum")(sess, sf)
    val plan = df.queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"rank-1 must not plan a window:\n$plan")
    // struct-max buffers aren't hash-aggregable, so Spark plans a
    // SortAggregate whose sorts are PARTITION-LOCAL (global=false):
    // per-task O(n log n) over that task's slice, parallel across the
    // input — the skew killer is a GLOBAL sort (or the window's
    // one-task hot partition), which must not appear
    val globalSorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty,
      s"rank-1 must not globally sort:\n$plan")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggs.size >= 2,
      s"expected partial+final aggregate pair, got ${aggs.size}:\n$plan")
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial)),
      s"map-side partial aggregation missing — the hot key would " +
        s"reach the shuffle unfolded:\n$plan")
  }

  test("the argmax lowering equals the row_number window form row-for-row") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val ref = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_day"))
    val got = WindowQueries.queries("window_rownum")(spark, sf)
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
      "argmax lowering diverged from the window form")
    assert(got.count() === ref.count())
  }
}
