package graft

import graft.ops.RelOps
import org.apache.spark.sql.functions._

/** The custom LocalTopKPerGroup operator must plan through
  * TopKPerGroupExec with exactly one shuffle and agree row-for-row
  * with the window row_number formulation.
  */
class TopKPerGroupSpec extends SparkSpec {

  test("plans as two-stage TopKPerGroupExec around a single hash exchange") {
    val df = RelOps.topKPerGroupExact(Tables.lineitem(spark, sf),
      Seq(col("l_orderkey")),
      Seq(col("l_extendedprice").desc, col("l_linenumber")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("Window"), plan)
    // one final + one partial node, with the exchange BETWEEN them in
    // the tree rendering (final above the shuffle, partial map-side)
    val first = plan.indexOf("TopKPerGroup")
    val second = plan.indexOf("TopKPerGroup", first + 1)
    val ex = plan.indexOf("Exchange")
    assert(second >= 0, plan)
    assert(plan.indexOf("TopKPerGroup", second + 1) < 0, plan)
    assert(first < ex && ex < second, plan)
  }

  test("partial pass bounds map-side output and preserves results on a 3-value key") {
    // the agg_kmv_distinct shape: tiny group cardinality, large input
    val df = spark.range(0, 50000).select(
      (col("id") % 3).as("g"), pmod(hash(col("id")), lit(1000000)).as("h"))
    val viaCustom = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("h")), 16)
      .select("g", "h", "rk")
    val viaWindow = RelOps.topKPerGroup(df, Seq(col("g")), Seq(col("h")), 16)
      .select("g", "h", "rk")
    assert(viaCustom.count() === viaWindow.count())
    assert(viaWindow.exceptAll(viaCustom).count() === 0)
    assert(viaCustom.exceptAll(viaWindow).count() === 0)
  }

  test("matches the window row_number formulation exactly") {
    val part = Seq(col("l_orderkey"))
    val order = Seq(col("l_extendedprice").desc, col("l_linenumber"))
    val viaWindow = RelOps.topKPerGroup(Tables.lineitem(spark, sf), part, order, 3)
      .select("l_orderkey", "l_linenumber", "rk")
    val viaCustom = RelOps.topKPerGroupExact(Tables.lineitem(spark, sf), part, order, 3)
      .select("l_orderkey", "l_linenumber", "rk")
    assert(viaCustom.count() === viaWindow.count())
    assert(viaWindow.exceptAll(viaCustom).count() === 0)
    assert(viaCustom.exceptAll(viaWindow).count() === 0)
  }

  test("k=1 picks exactly the per-group argmin") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("v")), 1)
      .select("g", "v", "rk").as[(String, Int, Int)].collect().toSet
    assert(out === Set(("a", 1, 1), ("b", 9, 1)))
  }

  test("empty input emits nothing") {
    import spark.implicits._
    val df = Seq.empty[(String, Int)].toDF("g", "v")
    val out = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("v")), 3)
    assert(out.count() === 0)
  }

  test("k <= 0 is rejected at construction") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("v")), 0)
    }
  }

  test("spill path (tiny threshold, high-cardinality key) matches window formulation") {
    val part = Seq(col("l_orderkey"), col("l_linenumber")) // ~1 row/group
    val order = Seq(col("l_extendedprice").desc, col("l_suppkey"))
    spark.conf.set("spark.graft.topk.spillThreshold", "64")
    try {
      val viaCustom = RelOps.topKPerGroupExact(Tables.lineitem(spark, sf), part, order, 2)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "rk")
      val viaWindow = RelOps.topKPerGroup(Tables.lineitem(spark, sf), part, order, 2)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "rk")
      assert(viaCustom.count() === viaWindow.count())
      assert(viaWindow.exceptAll(viaCustom).count() === 0)
      assert(viaCustom.exceptAll(viaWindow).count() === 0)
    } finally spark.conf.unset("spark.graft.topk.spillThreshold")
  }

  test("adaptive partial abandons on a high-cardinality key and stays exact") {
    // ~1 row per group: the partial heap retains everything it sees,
    // so a tiny sample triggers abandonment on every partition — the
    // result must still match the window formulation row-for-row
    spark.conf.set("spark.graft.topk.partialSampleRows", "32")
    try {
      val df = spark.range(0, 20000).select(
        col("id").as("g"), pmod(hash(col("id")), lit(1000000)).as("h"))
      val viaCustom = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("h")), 3)
        .select("g", "h", "rk")
      val viaWindow = RelOps.topKPerGroup(df, Seq(col("g")), Seq(col("h")), 3)
        .select("g", "h", "rk")
      assert(viaCustom.count() === viaWindow.count())
      assert(viaWindow.exceptAll(viaCustom).count() === 0)
      assert(viaCustom.exceptAll(viaWindow).count() === 0)
    } finally spark.conf.unset("spark.graft.topk.partialSampleRows")
  }

  test("adaptive partial does NOT abandon on a low-cardinality key") {
    // 3 groups, k=16: by the 32-row sample the heaps hold <= 48 rows
    // and everything after is pruned map-side — the kmv shape keeps
    // its map-side bound even with the adaptive check active
    spark.conf.set("spark.graft.topk.partialSampleRows", "32")
    try {
      val df = spark.range(0, 50000).select(
        (col("id") % 3).as("g"), pmod(hash(col("id")), lit(1000000)).as("h"))
      val viaCustom = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("h")), 4)
        .select("g", "h", "rk")
      val viaWindow = RelOps.topKPerGroup(df, Seq(col("g")), Seq(col("h")), 4)
        .select("g", "h", "rk")
      assert(viaCustom.count() === viaWindow.count())
      assert(viaWindow.exceptAll(viaCustom).count() === 0)
    } finally spark.conf.unset("spark.graft.topk.partialSampleRows")
  }

  test("groups smaller than k emit all rows ranked") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val out = RelOps.topKPerGroupExact(df, Seq(col("g")), Seq(col("v")), 10)
      .select("g", "v", "rk").as[(String, Int, Int)].collect().toSet
    assert(out === Set(("a", 1, 1), ("a", 2, 2), ("b", 5, 1)))
  }
}
