package graft

import graft.api.Graft
import org.apache.spark.sql.functions._

/** The facade must be usable as THE library entry point: a few
  * end-to-end calls through `graft.api.Graft` only.
  */
class GraftApiSpec extends SparkSpec {

  test("facade drives dedup endgame: fingerprint -> pairs -> components") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "e d c b a"),
      (4L, "totally different text here"), (5L, "a b c d e f")
    ).toDF("id", "text")
    val fp = docs.select(col("id"), Graft.fingerprint(col("text")).as("fp"))
    // docs 1,2,3 share the bag-of-words fingerprint
    val pairs = fp.select(col("id").as("a"), col("fp"))
      .join(fp.select(col("id").as("b"), col("fp")), Seq("fp"))
      .filter(col("a") < col("b"))
    val comps = Graft.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(!comps.contains(4L))
  }

  test("facade top-k + salted join compose") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      (col("id") % 10).as("g"), col("id").as("v"))
    val top = Graft.topKPerGroup(df, Seq(col("g")), Seq(col("v").desc), 3)
    assert(top.count() === 30)
    val dim = Seq((0L, "zero"), (1L, "one")).toDF("g", "label")
    val joined = Graft.saltedEquiJoin(df, dim, "g", salt = 4)
    assert(joined.count() === 200)
  }

  test("facade corpus curation: spans, repetition, decontaminate, temperature") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x1 x2 w1 w2 w3 w4 y1 y2", "en"),
      (2L, "z1 z2 w1 w2 w3 w4 z3 z4", "en"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8", "fr")
    ).toDF("id", "text", "lang")
      .withColumn("toks", split(col("text"), " "))
    // docs 1 and 2 share the 4-token run w1..w4 → one span each,
    // positions 3..6 (1-based), a single merged island of 1 seed at
    // w=4
    val spans = Graft.substringSpans(docs, "id", "toks", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((1L, 3L, 6L), (2L, 3L, 6L)))

    val rep = Graft.repetitionSignals(
      Seq((1L, Seq("a", "a", "a", "b"))).toDF("id", "toks"), "id", "toks")
      .head
    assert(rep.getLong(1) === 4L)               // n_tok
    assert(rep.getDouble(2) === 0.5)            // dup_tok_frac: 2 distinct / 4
    // 2-grams: (a a)x2, (a b) → top2 = 2/3
    assert(math.abs(rep.getDouble(3) - 2.0 / 3) < 1e-6)

    val sh = docs.select(col("id"), explode(Graft.shingles(col("toks"), 2)).as("s"))
    val decon = Graft.decontaminate(
      sh.filter(col("id") =!= 3L), sh.filter(col("id") === 2L).select("s"),
      "id", "s")
    // doc 1 shares exactly the 3 shingles inside w1..w4 with doc 2
    val d1 = decon.filter(col("id") === 1L).head
    assert(d1.getLong(1) === 3L && d1.getLong(2) === 7L)

    val kept = Graft.temperatureSample(docs, "lang",
      graft.ops.TextOps.hexByteValue(md5(concat(lit("t:"), col("id")))))
    // fr is the smallest stratum → thresh 256, always kept
    assert(kept.filter(col("lang") === "fr").count() === 1L)
  }

  test("facade taxonomy trees") {
    import spark.implicits._
    val taxa = Seq(("R1", null, "domain", "Root"), ("C1", "R1", "species", "Leaf"))
      .toDF("id", "parent", "rank", "name")
    val hits = Seq(("E1", "C1", 2L)).toDF("entry", "taxon_id", "n")
    val tree = Graft.taxonomyTrees(hits, taxa).head.getString(1)
    assert(tree.contains("\"proteins\":2") && tree.contains("\"name\":\"Root\""))
  }
}
