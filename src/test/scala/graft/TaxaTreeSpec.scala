package graft

import graft.ops.TaxaTree
import org.apache.spark.sql.functions._

/** Structural invariants of the 8-rank distribution trees beyond the
  * oracle's string equality: every tree must PARSE as JSON (the
  * escaping path), every internal node's protein count must equal the
  * sum of its children when all slots below are filled, and names with
  * quotes/backslashes must survive the round-trip.
  */
class TaxaTreeSpec extends SparkSpec {

  private def parse(js: String) = {
    // javax.script JSON parsing without extra deps: use the strict
    // Jackson shipped with Spark
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readTree(js)
  }

  test("entry trees parse as JSON and root counts equal hit totals") {
    import spark.implicits._
    val taxa = Seq(
      ("R1", null, "domain", "Root land"),
      ("N1", "R1", "phylum", "Mid"),
      ("C1", "N1", "species", "Leafy"),
      ("C2", "N1", "genus", "Genus-only")
    ).toDF("id", "parent", "rank", "name")
    val hits = Seq(
      ("E1", "C1", 5L), ("E1", "C2", 2L), ("E2", "C1", 1L)
    ).toDF("entry", "taxon_id", "n")
    val out = TaxaTree.entryRankTrees(hits, taxa).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet === Set("E1", "E2"))
    val e1 = parse(out("E1"))
    assert(e1.get("id").asText === "1")
    assert(e1.get("proteins").asLong === 7L)
    // species counts ONE per species-bearing hit taxon, not per
    // protein (reference entries.py: `node["species"] += 1` per
    // (taxon, num_proteins) item) — only the C1 hit qualifies
    assert(e1.get("species").asLong === 1L)
    val e2 = parse(out("E2"))
    assert(e2.get("proteins").asLong === 1L)
    // one domain child carrying the full count
    assert(e1.get("children").size === 1)
    assert(e1.get("children").get(0).get("proteins").asLong === 7L)
  }

  test("names containing quotes and backslashes stay valid JSON") {
    import spark.implicits._
    val taxa = Seq(
      ("R1", null, "domain", """Strain "X\1" group"""),
      ("C1", "R1", "species", """back\slash "quoted"""")
    ).toDF("id", "parent", "rank", "name")
    val hits = Seq(("E1", "C1", 3L)).toDF("entry", "taxon_id", "n")
    val js = TaxaTree.entryRankTrees(hits, taxa).head.getString(1)
    val root = parse(js) // throws on broken escaping
    val domain = root.get("children").get(0)
    assert(domain.get("name").asText === """Strain "X\1" group""")
    // walk to the species leaf through the placeholder chain
    var node = domain
    while (node.get("children").size > 0) node = node.get("children").get(0)
    assert(node.get("name").asText === """back\slash "quoted"""")
    assert(node.get("proteins").asLong === 3L)
  }
}
