package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.Mitab

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential test: the typed MITAB parse kernel vs the reference's
  * get_interpro_interactions run as a generation-time oracle
  * (tools/gen_mitab_fixture.py; 424 synthetic lines covering every
  * extraction branch — case-variant prefixes, display_long
  * preference, the single-value type gate, lowercase accessions under
  * the case-insensitive charset, duplicate lines, multi-IPR fanout,
  * and all four required-field droppers). The fixture carries
  * (raw lines, expected flattened rows).
  */
class MitabDifferentialSpec extends SparkSpec {

  test("flatMap kernel matches the reference parser on all fixture lines") {
    val url = getClass.getResource("/mitab_fixture.json")
    assert(url != null, "fixture missing — run tools/gen_mitab_fixture.py")
    val root = new ObjectMapper().readTree(url)
    val lines = root.get("lines").elements().asScala.map(_.asText()).toSeq
    val expected = root.get("expected").elements().asScala.map { r =>
      (r.get(0).asText(), r.get(1).asText(), r.get(2).asInt(),
        r.get(3).asText(), r.get(4).asText(), r.get(5).asText(),
        r.get(6).asText(), r.get(7).asText(), r.get(8).asText())
    }.toSet
    assert(expected.size > 400, s"degenerate fixture: ${expected.size} rows")

    import spark.implicits._
    val got = Mitab.interproInteractions(lines.toDF("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getString(5),
        r.getString(6), r.getString(7), r.getString(8)))
      .toSet

    val missing = expected.diff(got)
    val extra = got.diff(expected)
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(3)} extra=${extra.take(3)} " +
        s"(|expected|=${expected.size}, |got|=${got.size})")
  }
}
