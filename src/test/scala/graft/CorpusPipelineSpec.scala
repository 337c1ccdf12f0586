package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end corpus curation build (the LLM-pipeline counterpart of
  * ReleasePipelineSpec): stage counts must shrink monotonically
  * through filter → dedup → decontaminate → sample, the kv handoff
  * must round-trip the final corpus exactly, and the dropped sets
  * must actually be disjoint from the survivors.
  */
class CorpusPipelineSpec extends SparkSpec {

  test("corpus pipeline runs end-to-end with consistent stages") {
    val out = Files.createTempDirectory("graft-corpus").toString
    val stages = CorpusPipeline.build(spark, sf, out).toMap

    assert(stages("corpus_raw") > 0)
    assert(stages("corpus_normalized") === stages("corpus_raw"),
      "normalization rewrites text, never drops rows")
    assert(stages("corpus_filtered") <= stages("corpus_raw"))
    assert(stages("corpus_deduped") <= stages("corpus_filtered"))
    assert(stages("corpus_clean") <= stages("corpus_deduped"))
    assert(stages("corpus_rewritten") <= stages("corpus_clean"))
    assert(stages("corpus_sampled") <= stages("corpus_rewritten"))
    assert(stages("corpus_sampled") > 0)
    // the kv log round-trips the final corpus row-for-row
    assert(stages("corpus_kv") === stages("corpus_sampled"))
    assert(stages("corpus_jsonl") === stages("corpus_sampled"),
      "gz-JSONL shard export must round-trip every final doc")

    val clean = spark.read.parquet(s"$out/corpus_clean")
    val contaminated = spark.read.parquet(s"$out/contaminated")
    assert(clean.join(contaminated, Seq("doc_id")).count() === 0,
      "contaminated docs must not survive into the clean corpus")

    // near-dup pairs: for every verified pair at most one side survives
    val pairs = spark.read.parquet(s"$out/neardup_pairs")
    val deduped = spark.read.parquet(s"$out/corpus_deduped")
      .select(col("doc_id"))
    val bothSurvive = pairs
      .join(deduped.withColumnRenamed("doc_id", "da"), Seq("da"))
      .join(deduped.withColumnRenamed("doc_id", "db"), Seq("db"))
    assert(bothSurvive.count() === 0,
      "a verified near-dup pair kept both members")

    // kv point lookup: one known surviving doc comes back intact
    val sampled = spark.read.parquet(s"$out/corpus_sampled")
    val one = sampled.select(col("doc_id")).orderBy(col("doc_id")).head.getLong(0)
    val key = f"$one%012d"
    val hit = spark.read.format("graftkv").load(s"$out/corpus_kv")
      .filter(col("k") === key)
    assert(hit.count() === 1)

    // shard assignment partitions the final corpus: every doc gets
    // exactly one (shard, pos) and pos is the dense 1..n_shard rank
    val shards = spark.read.parquet(s"$out/corpus_shards")
    assert(stages("corpus_shards") === stages("corpus_sampled"))
    val perShard = shards.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"),
        max(col("pos")).as("hi"), countDistinct(col("pos")).as("nd"))
      .collect()
    perShard.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === r.getLong(1) &&
        r.getLong(4) === r.getLong(1),
        s"shard ${r.getInt(0)}: pos is not a dense 1..n rank")
    }

    // per-language stats cover exactly the languages in the corpus
    val stats = spark.read.parquet(s"$out/corpus_stats")
    assert(stats.count() ===
      sampled.select(col("lang")).distinct().count())
  }
}
