package graft

import graft.ops.Mitab
import graft.sources.FileSources
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Golden-fixture round-trips for the two flat-file import kernels the
  * named queries derive synthetically: a real 42-column MITAB TSV
  * through Mitab.interproInteractions (intact.py:24-133) and a real
  * `//`-terminated MetaCyc .dat file through FileSources.readStanzas
  * (metacyc.py:12-81).
  */
class IntactMetacycSpec extends SparkSpec {

  private def dash(n: Int): Seq[String] = Seq.fill(n)("-")

  /** A MITAB line with the ten meaningful fields set, rest '-'. */
  private def mitab(idsA: String, idsB: String, aliasA: String,
                    aliasB: String, pubs: String, inter: String,
                    typesA: String, typesB: String,
                    f36: String, f37: String): String =
    (Seq(idsA, idsB) ++ dash(2) ++ Seq(aliasA, aliasB) ++ dash(2) ++
      Seq(pubs) ++ dash(4) ++ Seq(inter) ++ dash(6) ++
      Seq(typesA, typesB) ++ dash(14) ++ Seq(f36, f37) ++ dash(4))
      .mkString("\t")

  test("MITAB fixture parses with reference precedence rules") {
    val good = mitab(
      idsA = "uniprotkb:P12345|intact:EBI-111",
      idsB = "UniProtKB:Q99999",
      aliasA = "uniprotkb:geneA(gene name)|psi-mi:long_a(display_long)",
      aliasB = "uniprotkb:geneB(gene name)",
      pubs = "pubmed:31331) 234|pubmed:777",
      inter = "intact:EBI-42|imex:IM-1",
      typesA = "psi-mi:\"MI:0326\"(protein)",
      typesB = "psi-mi:\"MI:0328\"(peptide)",
      f36 = "binding-associated region:IPR000001(positions)",
      f37 = "sufficient binding region:IPR000002|x:IPR000001")
    // dropped: two type values on interactor A
    val twoTypes = mitab("uniprotkb:P1", "uniprotkb:Q1",
      "psi-mi:a(display_long)", "psi-mi:b(display_long)",
      "pubmed:1", "intact:EBI-7",
      "psi-mi:\"MI:1\"(protein)|psi-mi:\"MI:2\"(dna)",
      "psi-mi:\"MI:1\"(protein)", "region:IPR000009", "-")
    // dropped: no InterPro accession anywhere
    val noIpr = mitab("uniprotkb:P2", "uniprotkb:Q2",
      "psi-mi:a(display_long)", "psi-mi:b(display_long)",
      "pubmed:2", "intact:EBI-8",
      "psi-mi:\"MI:1\"(protein)", "psi-mi:\"MI:1\"(protein)", "-", "-")
    val rows = Mitab.interproInteractions(
      spark.createDataFrame(Seq(Tuple1(good), Tuple1(twoTypes), Tuple1(noIpr)))
        .toDF("value"))
      .orderBy("entry_acc").collect()

    assert(rows.length === 2) // good fans out to IPR000001 + IPR000002
    val r = rows.head
    assert(r.getAs[String]("entry_acc") === "IPR000001")
    assert(r.getAs[String]("intact_id") === "EBI-42")
    assert(r.getAs[Int]("pubmed_id") === 31331)
    assert(r.getAs[String]("acc_1") === "P12345")
    assert(r.getAs[String]("name_1") === "LONG_A") // display_long wins, uppercased
    assert(r.getAs[String]("type_1") === "protein")
    assert(r.getAs[String]("acc_2") === "Q99999") // case-insensitive prefix
    assert(r.getAs[String]("name_2") === "geneB") // fallback alias, not uppercased
    assert(r.getAs[String]("type_2") === "peptide")
    assert(rows(1).getAs[String]("entry_acc") === "IPR000002")
  }

  test("MITAB column-count contract fails loudly on malformed lines") {
    val bad = spark.createDataFrame(Seq(Tuple1("a\tb\tc"))).toDF("value")
    val e = intercept[Exception] {
      Mitab.interproInteractions(bad).collect()
    }
    assert(e.getMessage.contains("expecting 42 columns") ||
      Option(e.getCause).exists(_.getMessage.contains("expecting 42 columns")))
  }

  test("MetaCyc .dat stanza read + parse matches the reference loop") {
    val dir = Files.createTempDirectory("metacyc")
    dir.toFile.deleteOnExit()
    val dat =
      """# header comment
        |UNIQUE-ID - RXN-1
        |EC-NUMBER - EC-3.4.19
        |IN-PATHWAY - PWY-10
        |IN-PATHWAY - PWYG-3
        |//
        |UNIQUE-ID - RXN-2
        |EC-NUMBER - EC-1.2.3.4
        |IN-PATHWAY - PWY-10
        |//
        |UNIQUE-ID - RXN-3
        |IN-PATHWAY - PWY-99
        |//
        |""".stripMargin
    Files.write(Paths.get(dir.toString, "reactions.dat"),
      dat.getBytes(StandardCharsets.UTF_8))

    val stanzas = FileSources.readStanzas(spark, dir.toString)
    assert(stanzas.count() === 3)

    val rawEc = nullif(regexp_extract(col("stanza"),
      """(?m)^EC-NUMBER - EC-(\d+\.\d+\.\d+(\.\d+)?)$""", 1), lit(""))
    val parsed = stanzas
      .select(rawEc.as("raw_ec"),
        regexp_extract_all(col("stanza"),
          lit("(?m)^IN-PATHWAY - (PWYG?-\\d+)$"), lit(1)).as("pws"))
      .filter(col("raw_ec").isNotNull)
      .select(
        when(col("raw_ec").rlike("""^\d+\.\d+\.\d+$"""),
          concat(col("raw_ec"), lit(".-"))).otherwise(col("raw_ec")).as("ec"),
        explode(col("pws")).as("pw"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

    // RXN-3 skipped (no EC); 3-part EC normalized with '.-'
    assert(parsed === Set(
      ("3.4.19.-", "PWY-10"), ("3.4.19.-", "PWYG-3"), ("1.2.3.4", "PWY-10")))
  }
}
