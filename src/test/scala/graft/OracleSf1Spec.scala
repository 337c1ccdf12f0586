package graft

import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import scala.sys.process._

/** Opt-in 10x oracle gate: the full Verify -> DuckDB compare at sf1,
  * the beyond-calibration check the r7 round ran by hand. Promoted to
  * a suite so a scale regression can't slip silently between rounds.
  *
  * One-command run (documented in SCALE.md):
  *
  *   tools/run.sh graft.ScaleUp /root/testdata/sf0.1 target/sf1 10
  *   sbt -Dgraft.oracle.sf1=true "testOnly graft.OracleSf1Spec"
  *
  * Without the system property (or without target/sf1 on disk) the
  * test cancels — the default `sbt test` stays fast and offline.
  * The gate shells out to the same entry points the driver uses
  * (tools/run.sh graft.Verify + tools/check.py), so what it certifies
  * is exactly the driver's correctness contract, not a parallel
  * in-JVM approximation.
  */
class OracleSf1Spec extends AnyFunSuite {

  test("sf1 (10x) oracle gate: every query matches DuckDB rows+schema+hash") {
    assume(sys.props.get("graft.oracle.sf1").contains("true"),
      "opt-in: run with -Dgraft.oracle.sf1=true")
    val repo = new File("/root/repo")
    val sfDir = new File(repo, "target/sf1")
    assume(sfDir.isDirectory,
      "generate first: tools/run.sh graft.ScaleUp /root/testdata/sf0.1 target/sf1 10")
    val out = "/tmp/graft_oracle_sf1_gate"
    val verify = Process(
      Seq("tools/run.sh", "graft.Verify", sfDir.getAbsolutePath, out),
      repo, "SPARK_GRAFT_CPUS" -> "16").!
    assert(verify === 0, "graft.Verify exited nonzero")
    val report = Process(
      Seq("python3", "tools/check.py", sfDir.getAbsolutePath, out), repo).!!
    val fails = report.linesIterator.filter(_.startsWith("FAIL")).toSeq
    assert(fails.isEmpty && report.contains(" 0 fail"),
      s"sf1 oracle regressions:\n${fails.take(10).mkString("\n")}\n" +
        report.linesIterator.toSeq.takeRight(2).mkString("\n"))
  }
}
