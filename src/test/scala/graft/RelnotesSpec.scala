package graft

import graft.harness.ExportQueries
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Flat-file golden for the release-notes export (ftp/relnotes.py):
  * the fixed-width lines are re-derived independently (plain parquet
  * count + Java format strings) and compared byte-for-byte with the
  * engine-rendered lines, and the assembled file carries the
  * reference's section order and ordinal date.
  */
class RelnotesSpec extends SparkSpec {

  test("type-count lines match an independent fixed-width rendering") {
    val rendered = ExportQueries.queries("relnotes_types")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // independent path: raw parquet count + Java Formatter
    val famCount = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_partkey") % 5 === 0).count()
    assert(rendered("family") === f"${"Family"}%22s $famCount%6d")

    val hsCount = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_partkey") % 5 === 4).count()
    assert(rendered("homologous_superfamily") ===
      f"${"Homologous superfamily"}%22s $hsCount%6d")
  }

  test("coverage lines carry one-decimal percentages in the reference shape") {
    val line = ExportQueries.queries("relnotes_coverage")(spark, sf)
      .filter(col("seqdb") === "UniProtKB").head.getString(1)
    // {n_p:>21}    {n_s:>9} ({p:.1f}%)    {n_is:>9} ({p:.1f}%)
    val re = """ *\d+ {4} *\d+ \(\d+\.\d%\) {4} *\d+ \(\d+\.\d%\)""".r
    assert(re.matches(line), s"malformed coverage line: '$line'")
    assert(line.indexOf('(') > 0 && line.length > 40)
  }

  test("assembled release_notes.txt has the reference layout") {
    val out = Files.createTempDirectory("relnotes").toString + "/release_notes.txt"
    ExportQueries.Relnotes.assemble(spark, sf, out,
      version = "100.0", day = 22, month = "August", year = 2026)
    val txt = new String(Files.readAllBytes(Paths.get(out)), "UTF-8")
    assert(txt.startsWith("Release Notes\n\n======"))
    assert(txt.contains("Release 100.0, 22nd August 2026"),
      "ordinal day suffix (22 -> nd)")
    assert(txt.contains("Contents and coverage of InterPro 100.0"))
    assert(txt.contains("Member database information"))
    val idxTypes = txt.indexOf("Contents and coverage")
    val idxMembers = txt.indexOf("Member database information")
    assert(idxTypes < idxMembers, "types section precedes member table")
    // the cross-release diff closes the file (mysql/databases.py:262-330)
    val idxDiff = txt.indexOf("Sequence database coverage vs previous release")
    assert(idxDiff > idxMembers, "coverage diff section closes the file")
    assert(txt.contains("UniProtKB/Swiss-Prot") &&
      txt.contains("UniProtKB/TrEMBL"), "both sequence databases present")
    // the UniProt row is the SUM of the other two (databases.py:313-317)
    val diff = harness.GoaQueries.queries("relnotes_coverage_diff")(spark, sf)
      .select("seqdb", "cur_count").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff("UniProtKB") ===
      diff("UniProtKB/Swiss-Prot") + diff("UniProtKB/TrEMBL"))
    // ordinal suffix table matches the reference's branch structure
    assert(ExportQueries.Relnotes.daySuffix(1) === "st")
    assert(ExportQueries.Relnotes.daySuffix(2) === "nd")
    assert(ExportQueries.Relnotes.daySuffix(3) === "rd")
    assert(ExportQueries.Relnotes.daySuffix(11) === "th")
    assert(ExportQueries.Relnotes.daySuffix(21) === "st")
    assert(ExportQueries.Relnotes.daySuffix(23) === "rd")
    assert(ExportQueries.Relnotes.daySuffix(31) === "st")
  }
}
