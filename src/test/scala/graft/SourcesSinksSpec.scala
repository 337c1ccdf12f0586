package graft

import graft.sources.{FileSources, Sinks}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Roundtrip tests for the non-parquet source/sink surface
  * (SURVEY.md §2.1 S10/S13/S14/S15/S16) — all IO under /tmp.
  */
class SourcesSinksSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("S15: gzip TSV sink writes compressed parts that read back") {
    val dir = tmpDir("tsv")
    val lines = Tables.nation(spark, sf)
      .select(concat_ws("\t", col("n_nationkey").cast("string"), col("n_name")).as("line"))
    Sinks.writeTsvGz(lines, s"$dir/out")
    val files = Files.list(Paths.get(s"$dir/out")).toArray.map(_.toString)
    assert(files.exists(_.endsWith(".gz")), s"no gzip parts in $files")
    val back = spark.read.text(s"$dir/out")
    assert(back.count() === 25)
    assert(back.filter(col("value").contains("\t")).count() === 25)
  }

  test("S16: XML sink stitches header + distributed fragments + footer") {
    val dir = tmpDir("xml")
    val frags = Tables.region(spark, sf)
      .select(concat(lit("<region id=\""), col("r_regionkey").cast("string"),
        lit("\"/>")).as("xml"))
    Sinks.writeXml(frags, s"$dir/parts", s"$dir/regions.xml",
      "<?xml version=\"1.0\"?>\n<regions>\n", "</regions>\n")
    val xml = new String(Files.readAllBytes(Paths.get(s"$dir/regions.xml")), "UTF-8")
    assert(xml.startsWith("<?xml"))
    assert(xml.endsWith("</regions>\n"))
    assert((0 to 4).forall(i => xml.contains(s"""<region id="$i"/>""")))
  }

  test("S10: bulk JSON doc sink writes docs plus _DONE sentinel") {
    val dir = tmpDir("docs")
    Sinks.writeJsonDocsWithSentinel(
      Tables.region(spark, sf).select("r_regionkey", "r_name"), s"$dir/out")
    assert(Files.exists(Paths.get(s"$dir/out/_DONE")))
    val back = spark.read.json(s"$dir/out/part-*")
    assert(back.count() === 5)
    assert(back.columns.toSet === Set("r_regionkey", "r_name"))
  }

  test("S13: gzip CSV source reads with schema and codec inference") {
    val dir = tmpDir("csv")
    val csv = "acc,plddt\nP1,90.5\nP2,55.25\n"
    val gz = graft.functions.GzipUtil.compress(csv.getBytes("UTF-8"))
    Files.write(Paths.get(s"$dir/preds.csv.gz"), gz)
    val schema = StructType(Seq(
      StructField("acc", StringType), StructField("plddt", DoubleType)))
    val df = FileSources.readCsv(spark, s"$dir/preds.csv.gz", schema)
    assert(df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ===
      Set(("P1", 90.5), ("P2", 55.25)))
  }

  test("S14: gzip-JSON-files source decodes and parses distributed") {
    val dir = tmpDir("json")
    for (i <- 1 to 3) {
      val doc = s"""{"acc":"P$i","score":${i * 10}}"""
      Files.write(Paths.get(s"$dir/doc$i.json.gz"),
        graft.functions.GzipUtil.compress(doc.getBytes("UTF-8")))
    }
    val schema = StructType(Seq(
      StructField("acc", StringType), StructField("score", IntegerType)))
    val df = FileSources.readGzipJsonFiles(spark, s"$dir/*.json.gz", schema)
      .select(col("doc.acc"), col("doc.score"))
    assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSet ===
      Set(("P1", 10), ("P2", 20), ("P3", 30)))
  }

  test("gzip expressions roundtrip arbitrary binary") {
    import spark.implicits._
    val df = Seq("hello", "", "αβγ multi-byte ✓").toDF("s")
      .select(call_function("gzip_decompress",
        call_function("gzip_compress", col("s").cast("binary")))
        .cast("string").as("s"))
    assert(df.as[String].collect().toSeq === Seq("hello", "", "αβγ multi-byte ✓"))
  }
}
