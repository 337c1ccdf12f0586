package graft

import graft.harness.GoaQueries
import graft.sources.Sinks
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** GOA flat-file goldens (reference uniprot/goa.py:60-215): the TSV
  * shape through the S15 gzip sink, the header convention, the
  * empty-protein fallback, and the partition-pruned-scan analogue
  * (goa.py:192-196 reads `MATCH PARTITION (MATCH_DBCODE_V)`; here the
  * same db predicate must reach the parquet scan as a pushed filter).
  */
class GoaExportSpec extends SparkSpec {

  private def gunzipLines(dir: String): Seq[String] = {
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".gz"))
      .sortBy(_.getName)
    parts.toSeq.flatMap { p =>
      val in = new GZIPInputStream(new java.io.FileInputStream(p))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
  }

  test("interpro2go2uniprot TSV round-trips through the gzip sink") {
    val dir = Files.createTempDirectory("goa").toString
    val df = GoaQueries.queries("goa_ipr2go2uni")(spark, sf)
    val n = df.count()
    assert(n > 0)
    // the reference writes `f"{accession}\t{go_id}\t{uniprot_acc}"`
    // lines under a '#'-header (goa.py:149-159); header is driver-side
    // envelope, rows render in executors
    Sinks.writeTsvGz(
      df.select(concat_ws("\t", col("entry_acc"), col("go_id"),
        col("protein_acc")).as("line")),
      dir)
    val lines = gunzipLines(dir)
    assert(lines.size === n)
    assert(lines.forall(_.split("\t", -1).length == 3))
    assert(lines.forall(l => l.startsWith("IPR") && l.contains("\tGO:")))
  }

  test("pdb2interpro2go keeps chains with no protein as empty field") {
    val df = GoaQueries.queries("goa_pdb2ipr2go")(spark, sf)
    val cols = df.columns.toSeq
    assert(cols === Seq("pdb_id", "chain", "taxon_id", "entry_acc",
      "go_id", "protein_acc"))
    // goa.py:128-130: `proteins = pdb2uniprot.get(pdb_chain, [""])` —
    // a chain without mapped proteins still emits rows, protein empty
    val rows = df.select(col("protein_acc")).distinct().collect()
      .map(_.getString(0))
    assert(rows.contains(""), "empty-protein fallback rows must exist")
    assert(df.filter(col("protein_acc").isNull).count() === 0)
  }

  test("panther match scan pushes the dbcode predicate to parquet") {
    val plan = GoaQueries.queries("goa_pthr2go")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(l_returnflag,R\\)".r
      .findFirstIn(plan).isDefined,
      s"dbcode partition predicate did not reach the scan:\n$plan")
  }

  test("panther matches without a dictionary node are dropped, '-' kept") {
    // goa.py:203-208: a (family, AN) pair absent from PANTHER2GO is
    // skipped; families not integrated in InterPro render '-'
    val df = GoaQueries.queries("goa_pthr2go")(spark, sf)
    val fams = df.select(col("interpro_acc")).distinct().collect()
      .map(_.getString(0)).toSet
    assert(fams.contains("-"), "non-integrated families must render '-'")
    assert(df.filter(col("ptn_id").isNull).count() === 0,
      "every surviving row carries its tree-node id")
    // matches scan (FEATURE NOT NULL, dbcode=R) strictly exceeds the
    // joined output: some (family, AN) combos have no dictionary row
    val scanned = graft.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R" && col("l_linenumber") % 13 =!= 0)
      .count()
    assert(df.count() < scanned,
      "dictionary join must drop at least one (family, AN) pair")
  }
}
