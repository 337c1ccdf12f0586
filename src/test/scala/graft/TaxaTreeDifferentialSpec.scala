package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.ops.TaxaTree
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Differential replay of the REFERENCE's taxonomy-tree construction
  * (interpro/xrefs/entries.py: main-rank projection + per-entry tree
  * build, executed by tools/gen_taxatree_fixture.py at generation
  * time): every fixture case's trees must match node for node. Trees
  * are compared CANONICALIZED — children sorted by id, keys
  * alphabetical — because the reference emits children in dict
  * insertion/popitem order, which is not data-determined.
  */
class TaxaTreeDifferentialSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Alphabetical-key, child-sorted JSON — the same normal form the
    * generator's `canon` + json.dumps(sort_keys=True) produces.
    */
  private def canon(n: JsonNode): String = {
    val children = n.get("children").elements().asScala.toSeq
      .map(c => (c.get("id").asText, canon(c))).sortBy(_._1).map(_._2)
    def str(field: String): String = {
      val v = n.get(field)
      if (v == null || v.isNull) "null" else mapper.writeValueAsString(v.asText)
    }
    s"""{"children":[${children.mkString(",")}],"id":${mapper.writeValueAsString(n.get("id").asText)},""" +
      s""""name":${str("name")},"proteins":${n.get("proteins").asLong},""" +
      s""""rank":${str("rank")},"species":${n.get("species").asLong}}"""
  }

  test("trees match the reference construction on all fixture cases") {
    import spark.implicits._
    val url = getClass.getResource("/taxatree_fixture.json")
    val fixture = mapper.readTree(new java.io.File(url.toURI))
    var checked = 0
    fixture.get("cases").elements().asScala.foreach { c =>
      val taxa = c.get("taxa").elements().asScala.toSeq.map { t =>
        (t.get("id").asText,
          Option(t.get("parent")).filterNot(_.isNull).map(_.asText).orNull,
          t.get("rank").asText, t.get("name").asText)
      }.toDF("id", "parent", "rank", "name")
      val hits = c.get("hits").elements().asScala.toSeq.map { h =>
        (h.get("entry").asText, h.get("taxon_id").asText, h.get("n").asLong)
      }.toDF("entry", "taxon_id", "n")
      val got = TaxaTree.entryRankTrees(hits, taxa).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val expected = c.get("expected")
      expected.fieldNames().asScala.foreach { entry =>
        assert(got.contains(entry), s"missing entry $entry")
        val gotCanon = canon(mapper.readTree(got(entry)))
        assert(gotCanon === expected.get(entry).asText, s"entry $entry")
        checked += 1
      }
    }
    assert(checked >= 24, s"only $checked trees checked")
  }
}
