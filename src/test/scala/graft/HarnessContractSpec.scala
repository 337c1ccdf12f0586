package graft

import graft.harness._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: module maps must not shadow each other
  * (Map ++ silently overrides duplicate keys), and every oracle must
  * point at a registered query.
  */
class HarnessContractSpec extends AnyFunSuite {

  // THE registry — owned by SparkEntry so this spec cannot drift from
  // the shipped query map (the r8 failure mode: a module registered in
  // SparkEntry but missing from a spec-local copy of this list)
  private val modules = SparkEntry.modules

  test("every *Queries object in graft.harness is registered in SparkEntry") {
    // classpath scan, not a hand-list: a new query module that compiles
    // but was never added to SparkEntry.modules must fail here loudly
    // (the r8 failure shipped exactly that drift)
    val url = getClass.getResource("/graft/harness")
    assert(url != null && url.getProtocol == "file",
      s"cannot scan graft.harness package dir: $url")
    val objectNames = new java.io.File(url.toURI).listFiles()
      .map(_.getName).filter(_.matches("[A-Za-z]+Queries\\$\\.class"))
      .map(_.stripSuffix("$.class")).toSet
    assert(objectNames.nonEmpty)
    val registered = SparkEntry.queries.keySet
    objectNames.foreach { n =>
      val cls = Class.forName(s"graft.harness.$n$$")
      val inst = cls.getField("MODULE$").get(null)
      val qs = cls.getMethod("queries").invoke(inst)
        .asInstanceOf[Map[String, _]].keySet
      val missing = qs.diff(registered)
      assert(missing.isEmpty,
        s"$n defines queries absent from SparkEntry.modules: $missing")
    }
  }

  test("every bench preamble names a registered module and no warm row shadows a query") {
    val moduleNames = modules.map(_._1).toSet
    val unknown = SparkEntry.preambles.keySet.diff(moduleNames)
    assert(unknown.isEmpty,
      s"preambles for unregistered modules (their warm rows would never run): $unknown")
    val warmNames = SparkEntry.preambles.keys.map(f => s"warm_${f}_frames").toSet
    val shadowed = warmNames.intersect(SparkEntry.queries.keySet)
    assert(shadowed.isEmpty,
      s"warm-row names collide with real queries: $shadowed")
  }

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
