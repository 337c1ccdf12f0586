package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.intervals.Intervals.Fragment
import graft.kernels.MatchMerge
import graft.kernels.MatchMerge.RawMatch
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Differential test: the Scala K1-K3 kernel vs the reference's
  * merge_uniprot_matches run as a generation-time oracle
  * (tools/gen_matchmerge_fixture.py; 240 reference-replayed proteins, multi-
  * fragment matches, domain/family/region mix, shared entries).
  * The fixture carries (input rows, expected merged matches).
  */
class MatchMergeDifferentialSpec extends AnyFunSuite {

  private case class ExpLoc(fragments: Seq[(Int, Int)], representative: Boolean,
                            model: Option[String], score: Option[Double],
                            subfamily: Option[String])

  private def frags(node: JsonNode): Seq[(Int, Int)] =
    node.elements().asScala.map(f => (f.get(0).asInt(), f.get(1).asInt())).toSeq

  private def optText(node: JsonNode): Option[String] =
    Option(node).filterNot(_.isNull).map(_.asText())

  test("kernel matches the reference oracle on all fixture proteins") {
    val url = getClass.getResource("/matchmerge_fixture.json")
    assert(url != null, "fixture missing — run tools/gen_matchmerge_fixture.py")
    val root = new ObjectMapper().readTree(url)
    var checked = 0
    for (c <- root.get("cases").elements().asScala) {
      val proteinAcc = c.get("proteinAcc").asText()
      val raw = c.get("raw").elements().asScala.map { r =>
        RawMatch(
          proteinAcc,
          r.get("signatureAcc").asText(),
          Option(r.get("entryAcc")).filterNot(_.isNull).map(_.asText()),
          r.get("kind").asText(),
          r.get("rank").asInt(),
          r.get("score").asDouble(),
          frags(r.get("fragments")).map { case (s, e) => Fragment(s, e, "CONTINUOUS") },
          optText(r.get("model")))
      }.toSeq

      val got = MatchMerge.mergeProtein(proteinAcc, raw)
        .map(m => (m.acc, m.isEntry) ->
          m.locations.map(l => ExpLoc(
            l.fragments.map(f => (f.start, f.end)), l.representative,
            l.model, l.score, l.subfamily)))
        .toMap

      val expected = c.get("expected").elements().asScala.map { e =>
        (e.get("acc").asText(), e.get("isEntry").asBoolean()) ->
          e.get("locations").elements().asScala.map { l =>
            ExpLoc(frags(l.get("fragments")),
              l.get("representative").asBoolean(),
              optText(l.get("model")),
              Option(l.get("score")).filterNot(_.isNull).map(_.asDouble()),
              optText(l.get("subfamily")))
          }.toSeq
      }.toMap

      assert(got.keySet === expected.keySet, s"$proteinAcc: match-set differs")
      for ((k, expLocs) <- expected) {
        assert(got(k) === expLocs, s"$proteinAcc/$k: locations differ")
      }
      checked += 1
    }
    assert(checked === 240)
  }
}
