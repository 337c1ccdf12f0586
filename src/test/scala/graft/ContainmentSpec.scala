package graft

import graft.ops.{CorpusOps, TextOps}
import org.apache.spark.sql.functions._

/** The containment measure's reason to exist: a short document fully
  * embedded in a much longer one is a near-dup (doc-in-doc reuse)
  * with containment ~1.0 but Jaccard ~|A|/|B| — below any sane
  * symmetric threshold. Verified over the same shingle frame both
  * verifiers consume.
  */
class ContainmentSpec extends SparkSpec {

  test("containment flags a doc-in-doc pair that Jaccard misses") {
    import spark.implicits._
    val short = (1 to 10).map(i => s"tok$i").mkString(" ")
    // long doc = the short doc verbatim + 10x unrelated tail
    val long = short + " " + (11 to 110).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "wholly unrelated text " +
      (200 to 240).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = CorpusOps.shingleFrame(
      docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks")),
      "doc_id", "toks", 5)
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("da", "db")

    val cont = CorpusOps.containmentVerify(sh, cand, "doc_id", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    // every shingle of doc 1 appears in doc 2 -> containment 1.0;
    // doc 3 shares nothing
    assert(cont.toSeq === Seq((1L, 2L, 1.0)))

    // the same pair scores |A|/|B| on Jaccard (6 of 106 shingles) —
    // invisible at the family's 0.5 threshold
    val jacc = CorpusOps.jaccardVerify(sh, cand, "doc_id", 0.5).count()
    assert(jacc === 0)
  }
}
