package example

import graft.api.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The library's first BLACK-BOX consumer: everything here goes
  * through the published facade (`graft.api.Graft`) and the packaged
  * jar — no harness, no test scaffolding, no internal imports. Covers
  * the README quickstart end to end: a dedup endgame, bounded top-k,
  * an ANN search, and an iterative loop operator under RELIABLE
  * checkpointing. Exits non-zero on any mismatch; prints
  * CONSUMER-SMOKE OK on success (the script greps for it).
  */
object ConsumerSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-consumer-smoke")
      .config("spark.sql.shuffle.partitions", "8")
      // the one session requirement the scaladoc states: custom
      // functions + the top-k physical operator register via
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- 1. dedup endgame: fingerprint -> edges -> components ->
    //         kept corpus. 30 docs in 10 near-identical triples (same
    //         bag of words, shuffled/extra whitespace) + 20 uniques.
    val docs = spark.range(0, 50).select(col("id").as("doc_id"),
      when(col("id") < 30,
        concat(lit("alpha beta gamma delta "),
          (col("id") % 10).cast("string")))
        .otherwise(concat(lit("unique text body "), col("id").cast("string")))
        .as("text"))
    val fp = docs.select(col("doc_id"), Graft.fingerprint(col("text")).as("fp"))
    val edges = fp.as("a").join(fp.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    val comps = Graft.connectedComponents(edges, "src", "dst")
    val kept = Graft.keepRepresentatives(docs, "doc_id", comps)
    // 10 triples collapse to 1 representative each + 20 uniques = 30
    assert(kept.count() == 30L, s"kept ${kept.count()} docs, expected 30")
    assert(comps.select(countDistinct(col("component"))).head().getLong(0) == 10L)

    // ---- 2. bounded top-k per group (custom physical operator)
    val scored = spark.range(0, 1000).select(
      (col("id") % 7).as("grp"), col("id").as("item"),
      pmod(hash(col("id")), lit(1000)).as("score"))
    val top3 = Graft.topKPerGroup(scored, Seq(col("grp")),
      Seq(col("score").desc, col("item")), 3)
    assert(top3.count() == 21L, s"top-k returned ${top3.count()} rows")
    val worstBest = top3.groupBy(col("grp")).agg(max(col("rk")).as("m"))
      .agg(min(col("m"))).head().getInt(0)
    assert(worstBest == 3, "every group must fill k=3 ranks")

    // ---- 3. ANN search: brute-force cosine top-k over synthetic
    //         embeddings (the correctness baseline every ANN variant
    //         in the library is gauged against)
    val corpus = spark.range(0, 200).select(col("id").as("cid"),
      array((0 until 8).map(j =>
        pmod(hash(col("id"), lit(j)), lit(100)).cast("float") / 100f): _*)
        .as("vec"))
    val queries = corpus.filter(col("cid") % 50 === 0)
      .select(col("cid").as("qid"), col("vec").as("qvec"))
    val hits = Graft.cosineTopK(queries, corpus, "qid", "cid", "qvec", "vec", 5)
    assert(hits.count() == 20L, s"ann returned ${hits.count()} rows")
    // ranks are dense 1..5 per query and rank-1 carries the best sim
    assert(hits.select(col("qid"), col("rk")).distinct().count() == 20L)
    val badRank1 = hits.groupBy(col("qid"))
      .agg(max(col("sim")).as("best"),
        max(when(col("rk") === 1, col("sim"))).as("r1"))
      .filter(col("r1") < col("best"))
    assert(badRank1.count() == 0L, "rank 1 must hold the max similarity")

    // ---- 4. a loop operator under RELIABLE checkpointing: same
    //         components, but rounds write recoverable checkpoints
    //         (on this local master the library provisions a tmp dir;
    //         on a cluster it fails fast without a durable shared one)
    spark.conf.set("spark.graft.reliableLoops", "true")
    val compsReliable = Graft.connectedComponents(edges, "src", "dst")
    assert(compsReliable.exceptAll(comps).isEmpty &&
      comps.exceptAll(compsReliable).isEmpty,
      "reliable-mode components must be bit-identical")
    spark.conf.set("spark.graft.reliableLoops", "false")

    println("CONSUMER-SMOKE OK")
    spark.stop()
  }
}
