package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format sources beyond plain parquet (SURVEY.md §2.1).
  *
  * S13 — gzip CSV (reference: AlphaFold accession→model,pLDDT CSV,
  * interpro7dw/alphafold.py:23-69). Spark infers the codec from the
  * `.gz` extension; the read stays splittable-per-file and prunes
  * columns like any other scan.
  *
  * S14 — archive-of-JSON (reference: BFVD tar members → gzip JSON,
  * interpro7dw/bfvd.py:9-39). Modeled as `binaryFile` scan + per-row
  * decompress + `from_json`: the container format is driver-agnostic,
  * the JSON decode is distributed, and the schema is enforced.
  */
object FileSources {

  /** S13: header CSV with explicit schema (codec inferred from path). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S14: every file under `path` (glob) is one gzip-compressed JSON
    * document; returns (path, parsed struct). The gzip_decompress
    * custom expression keeps the decode inside the plan.
    */
  def readGzipJsonFiles(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"),
        from_json(
          call_function("gzip_decompress", col("content")).cast("string"),
          schema).as("doc"))

  /** Record-stanza text source (reference: MetaCyc .dat files — blocks
    * of `KEY - value` lines terminated by a `//` line, parsed
    * line-by-line with per-record state in metacyc.py:12-81).
    *
    * Spark's text reader accepts a custom line separator, so each
    * STANZA becomes one row and the read stays distributed and
    * splittable across records — the per-record accumulator loop
    * collapses into multiline regexes over the stanza string
    * (`(?m)^KEY - ...`), evaluated inside codegen. Returns one
    * non-empty `stanza` string column.
    */
  def readStanzas(spark: SparkSession, path: String,
                  separator: String = "\n//\n"): DataFrame =
    spark.read.option("lineSep", separator).text(path)
      .select(col("value").as("stanza"))
      .filter(length(trim(col("stanza"))) > 0)
}
