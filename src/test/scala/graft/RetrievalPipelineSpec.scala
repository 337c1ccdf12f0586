package graft

/** End-to-end retrieval envelope (graft.RetrievalPipeline): build the
  * persisted index on the first half, append the second, serve, and
  * gauge recall — stage counts must be consistent and the appended
  * generation must be searchable.
  */
class RetrievalPipelineSpec extends SparkSpec {

  test("retrieval pipeline builds, appends, serves, and measures recall") {
    val out = java.nio.file.Files.createTempDirectory("graft-retrieval-")
      .toString
    val stages = RetrievalPipeline.build(spark, sf, out).toMap
    val n = stages("embeddings_raw")
    assert(n > 0)
    assert(stages("index_cells") === 8L)
    assert(stages("index_built") === n / 2,
      "first build must hold exactly the first generation")
    assert(stages("index_after_append") === n,
      "append must add the second generation without touching the first")
    assert(stages("search_results") === 50L * 5L)
    assert(stages("recall_expected") === 50L * 5L)
    assert(stages("recall_hits") <= stages("recall_expected"))
    // nprobe=2 of 8 cells against the exhaustive ranking over the
    // same codes: probe loss exists but most neighbors share cells
    assert(stages("recall_hits").toDouble / stages("recall_expected") > 0.3,
      s"implausibly low recall: ${stages("recall_hits")}/250")
  }
}
