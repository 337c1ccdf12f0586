package graft

import graft.harness._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: module maps must not shadow each other
  * (Map ++ silently overrides duplicate keys), and every oracle must
  * point at a registered query.
  */
class HarnessContractSpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("core", CoreQueries.queries, CoreQueries.oracle),
    ("join", JoinQueries.queries, JoinQueries.oracle),
    ("agg", AggQueries.queries, AggQueries.oracle),
    ("window", WindowQueries.queries, WindowQueries.oracle),
    ("text", TextQueries.queries, TextQueries.oracle),
    ("dedup", DedupQueries.queries, DedupQueries.oracle),
    ("sample", SampleQueries.queries, SampleQueries.oracle),
    ("vector", VectorQueries.queries, VectorQueries.oracle),
    ("multimodal", MultimodalQueries.queries, MultimodalQueries.oracle),
    ("kernel", KernelQueries.queries, KernelQueries.oracle),
    ("sink", SinkQueries.queries, SinkQueries.oracle),
    ("stream", StreamQueries.queries, StreamQueries.oracle),
    ("xref", XrefQueries.queries, XrefQueries.oracle),
    ("export", ExportQueries.queries, ExportQueries.oracle),
    ("taxamart", TaxaMartQueries.queries, TaxaMartQueries.oracle),
    ("goa", GoaQueries.queries, GoaQueries.oracle),
    ("interaction", InteractionQueries.queries, InteractionQueries.oracle))

  test("no query name collides across modules") {
    val all = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"colliding query names: $dups")
    assert(SparkEntry.queries.size === all.size)
  }

  test("every oracle references a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (zero rows-only checks)") {
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty, s"unexpected rows-only queries: $unoracled")
  }
}
