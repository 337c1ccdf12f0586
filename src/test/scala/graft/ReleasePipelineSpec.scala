package graft

import java.nio.file.Files

/** End-to-end release build at sf0.001: every stage must produce
  * rows/bytes and the XML envelope must be well-formed.
  */
class ReleasePipelineSpec extends SparkSpec {

  test("release pipeline builds all stages") {
    val out = Files.createTempDirectory("graft-release").toString
    val stages = ReleasePipeline.build(spark, sf, out).toMap
    assert(stages("protein2matches") > 0)
    assert(stages("protein2matches_kv") === stages("protein2matches"))
    assert(stages("entry2xrefs") === 7)  // IPR0..IPR6
    assert(stages("domain_orgs") > 0)
    assert(stages("taxa_rollup") > 0)
    assert(stages("webfront_entry") === 7)
    assert(stages("release_stats") === 1)
    assert(stages("protein2ipr") > 0)
    assert(stages("match_complete.xml") === 1)
    assert(stages("es_docs") > 0)
    val xmlPath = java.nio.file.Paths.get(s"$out/match_complete.xml")
    val xml = new String(Files.readAllBytes(xmlPath), "UTF-8")
    assert(xml.startsWith("<?xml"))
    assert(xml.endsWith("</interpromatch>\n"))
    // startsWith/endsWith/contains would miss spliced binary (e.g.
    // Hadoop .crc siblings concatenated between parts) — require a
    // full XML parse of the stitched document
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().parse(xmlPath.toFile)
    assert(doc.getDocumentElement.getTagName === "interpromatch")
    assert(doc.getDocumentElement.getChildNodes.getLength > 0)
    assert(Files.exists(java.nio.file.Paths.get(s"$out/es_docs/_DONE")))
  }
}
