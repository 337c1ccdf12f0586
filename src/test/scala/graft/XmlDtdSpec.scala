package graft

import graft.harness.SinkQueries
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.xml.sax.SAXParseException
import org.xml.sax.helpers.DefaultHandler

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer

/** DTD-conformance goldens for the XML exports (reference ships
  * interpro.dtd / match_complete.dtd next to the XML and writes
  * `<!DOCTYPE ... SYSTEM ...>` headers, ftp/xmlfiles.py:17-22,212,626):
  * full documents are stitched from distributed fragments and parsed
  * with a VALIDATING parser against the checked-in DTDs.
  */
class XmlDtdSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  /** Parse with DTD validation on; returns every validity error. */
  private def validate(xml: Path): Seq[String] = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setValidating(true)
    val errs = ArrayBuffer.empty[String]
    factory.newSAXParser().parse(xml.toFile, new DefaultHandler {
      override def error(e: SAXParseException): Unit = errs += e.getMessage
      override def fatalError(e: SAXParseException): Unit = errs += e.getMessage
    })
    errs.toSeq
  }

  test("match_complete.xml validates against the checked-in DTD") {
    val dir = tmpDir("xmldtd")
    Sinks.stageDtd("match_complete.dtd", dir)
    Sinks.writeXml(
      SinkQueries.queries("sink_xml_fragments")(spark, sf),
      s"$dir/parts", s"$dir/match_complete.xml",
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<!DOCTYPE interpromatch SYSTEM \"match_complete.dtd\">\n" +
        "<interpromatch><release>" +
        "<dbinfo dbname=\"INTERPRO\" version=\"100.0\"/></release>\n",
      "</interpromatch>\n")
    val errs = validate(Paths.get(dir, "match_complete.xml"))
    assert(errs.isEmpty, s"DTD violations: ${errs.take(5)}")
  }

  test("interpro.xml entry document validates against the checked-in DTD") {
    val dir = tmpDir("iprdtd")
    Sinks.stageDtd("interpro.dtd", dir)

    // entry fragments: part = entries, nation joined modularly for the
    // taxonomy distribution; every element/attribute the interpro.dtd
    // subset requires, built distributed
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"),
        "<", "&lt;"), ">", "&gt;")
    val taxa = Tables.nation(spark, sf).select(
      col("n_nationkey").as("tk"), esc(col("n_name")).as("taxname"))
    val frags = Tables.part(spark, sf)
      .join(broadcast(taxa), col("p_partkey") % 25 === col("tk"))
      .select(concat(
        lit("<interpro id=\"IPR"), col("p_partkey").cast("string"),
        lit("\" type=\""), split(col("p_type"), " ").getItem(0),
        lit("\" short_name=\"sn_"), col("p_partkey").cast("string"),
        lit("\" protein_count=\""), col("p_size").cast("string"),
        lit("\"><name>"), esc(col("p_name")), lit("</name>"),
        lit("<abstract>Summary <cite idref=\"PUB"),
        col("p_partkey").cast("string"),
        lit("\"/> with <p>markup</p>.</abstract>"),
        lit("<pub_list><publication id=\"PUB"),
        col("p_partkey").cast("string"),
        lit("\"><author_list>Doe J</author_list><journal>J Mol Biol"),
        lit("</journal><year>2024</year></publication></pub_list>"),
        lit("<member_list><db_xref db=\""),
        element_at(array(lit("PFAM"), lit("CDD"), lit("SMART"),
          lit("PROFILE"), lit("SSF")), (col("p_partkey") % 5 + 1).cast("int")),
        lit("\" dbkey=\"SIG"), col("p_partkey").cast("string"),
        lit("\" protein_count=\""), col("p_size").cast("string"),
        lit("\"/></member_list>"),
        lit("<taxonomy_distribution><taxon_data name=\""), col("taxname"),
        lit("\" proteins_count=\""), (col("p_partkey") % 97).cast("string"),
        lit("\"/></taxonomy_distribution>"),
        lit("<key_species><taxon_data name=\""), col("taxname"),
        lit("\" proteins_count=\"1\"/></key_species>"),
        lit("</interpro>")).as("xml"))

    Sinks.writeXml(frags, s"$dir/parts", s"$dir/interpro.xml",
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<!DOCTYPE interprodb SYSTEM \"interpro.dtd\">\n" +
        "<interprodb><release>" +
        "<dbinfo dbname=\"INTERPRO\" version=\"100.0\"/></release>\n",
      "<deleted_entries><del_ref id=\"IPR999999\"/></deleted_entries>" +
        "</interprodb>\n")

    val errs = validate(Paths.get(dir, "interpro.xml"))
    assert(errs.isEmpty, s"DTD violations: ${errs.take(5)}")
  }

  test("full interpro.xml composition (interpro_xml query) is DTD-valid") {
    // the complete per-entry document (ftp/xmlfiles.py:77-455):
    // abstract + class_list + pub_list + external docs + members +
    // parent/child + structure links + taxonomy distribution + key
    // species, one fragment per entry, stitched under the release
    // envelope and validated against the checked-in grammar
    val dir = tmpDir("iprfull")
    Sinks.stageDtd("interpro.dtd", dir)
    val frags = graft.harness.GoaQueries.queries("interpro_xml")(spark, sf)
      .orderBy(col("entry_acc")).select(col("xml"))
    Sinks.writeXml(frags, s"$dir/parts", s"$dir/interpro.xml",
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<!DOCTYPE interprodb SYSTEM \"interpro.dtd\">\n" +
        "<interprodb><release>" +
        "<dbinfo dbname=\"INTERPRO\" version=\"100.0\" " +
        "entry_count=\"97\" file_date=\"13-AUG-26\"/>" +
        "<dbinfo dbname=\"SWISSPROT\" version=\"2026_03\"/></release>\n",
      "<deleted_entries><del_ref id=\"IPR999999\"/></deleted_entries>" +
        "</interprodb>\n")
    val errs = validate(Paths.get(dir, "interpro.xml"))
    assert(errs.isEmpty, s"DTD violations: ${errs.take(5)}")
    val doc = new String(Files.readAllBytes(Paths.get(dir, "interpro.xml")),
      "UTF-8")
    assert(doc.contains("<structure_db_links>") &&
      doc.contains("<taxonomy_distribution>") &&
      doc.contains("<child_list>") && doc.contains("<external_doc_list>"),
      "full composition must carry every optional section somewhere")
  }

  test("the validator rejects a document that breaks the grammar") {
    val dir = tmpDir("xmlneg")
    Sinks.stageDtd("match_complete.dtd", dir)
    // protein missing its required attributes, match missing lcn
    Files.write(Paths.get(dir, "bad.xml"),
      ("<?xml version=\"1.0\"?>\n" +
        "<!DOCTYPE interpromatch SYSTEM \"match_complete.dtd\">\n" +
        "<interpromatch><release><dbinfo dbname=\"X\"/></release>" +
        "<protein id=\"P1\"><match id=\"m\" name=\"n\" dbname=\"d\" " +
        "status=\"T\" evd=\"H\" model=\"m\" type=\"t\"/></protein>" +
        "</interpromatch>").getBytes("UTF-8"))
    val errs = validate(Paths.get(dir, "bad.xml"))
    assert(errs.nonEmpty, "invalid document must produce validity errors")
  }
}
