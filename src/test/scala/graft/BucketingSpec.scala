package graft

import org.apache.spark.sql.functions._

/** S5 / co-located join proof (SURVEY.md §2.1, §4): writing both join
  * sides bucketed+sorted by the join key lets Spark plan a sort-merge
  * join with NO shuffle exchange on either side — the on-disk layout
  * the reference builds by hand with its sorted KVStores, and the 100
  * TB answer for repeated big-big joins on a stable key.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf, set in SparkSpec.session
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")

    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")

    // and it computes the right thing
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === expected)

    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
