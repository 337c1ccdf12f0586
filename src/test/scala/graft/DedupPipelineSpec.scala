package graft

import org.apache.spark.sql.functions._

/** End-of-pipeline dedup surfaces: the decontamination probe must ride
  * a broadcast (the eval side is the small side by design — at corpus
  * scale the train scan cannot afford a shuffle against it), and the
  * kept-representatives corpus must partition exactly against the
  * component labeling (representative = min-label node stays, every
  * other member drops).
  */
class DedupPipelineSpec extends SparkSpec {

  test("dedup_decontaminate probes the eval shingle set via broadcast") {
    val df = SparkEntry.queries("dedup_decontaminate")(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting it
    // string form: AQE hides stage internals behind QueryStageExec
    // nodes whose `children` is empty, so a tree walk undercounts
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the eval shingle set on a broadcast join, got:\n$plan")
  }

  test("dedup_keep_representatives partitions the corpus against the components") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    val kept = SparkEntry.queries("dedup_keep_representatives")(spark, sf)
      .select(col("doc_id"))
    val comps = SparkEntry.queries("dedup_components")(spark, sf)

    val dropped = comps.filter(col("component") =!= col("node"))
      .select(col("node").as("doc_id"))
    // kept ∪ dropped = corpus, kept ∩ dropped = ∅
    assert(kept.intersect(dropped).count() === 0)
    assert(kept.count() + dropped.count() === docs.count())
    // every component's representative (its min label = the component
    // id itself) survives in the kept corpus
    val reps = comps.select(col("component").as("doc_id")).distinct()
    assert(reps.join(kept, Seq("doc_id"), "left_anti").count() === 0)
  }
}
