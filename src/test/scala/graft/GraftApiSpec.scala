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

  test("facade taxonomy trees") {
    import spark.implicits._
    val taxa = Seq(("R1", null, "domain", "Root"), ("C1", "R1", "species", "Leaf"))
      .toDF("id", "parent", "rank", "name")
    val hits = Seq(("E1", "C1", 2L)).toDF("entry", "taxon_id", "n")
    val tree = Graft.taxonomyTrees(hits, taxa).head.getString(1)
    assert(tree.contains("\"proteins\":2") && tree.contains("\"name\":\"Root\""))
  }
}
