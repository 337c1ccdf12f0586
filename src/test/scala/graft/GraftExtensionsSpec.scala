package graft

import org.apache.spark.sql.functions._

/** The custom expressions must be first-class SQL citizens: callable
  * from `spark.sql` text, not just the Column API (that's what
  * SparkSessionExtensions.injectFunction buys over plain UDF
  * registration).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("array_dot is callable from SQL over a view") {
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT vec_id, array_dot(embedding, embedding) AS norm2
         FROM emb_sql""").collect()
    assert(rows.length === 10)
    assert(rows.forall(r => r.getDouble(1) > 0.0))
  }

  test("gzip roundtrip is callable from SQL") {
    val r = spark.sql(
      """SELECT CAST(gzip_decompress(gzip_compress(CAST('squeeze me' AS BINARY)))
                AS STRING) AS s""").collect()
    assert(r(0).getString(0) === "squeeze me")
  }

  test("hamming_bits matches the summed-CASE formulation") {
    val cases = Seq(
      ("0000", "0000", 0L), ("0101", "1010", 4L), ("0110", "0100", 1L),
      ("", "", 0L), ("01", "0111", 2L), ("abc", "abd", 1L))
    cases.foreach { case (a, b, want) =>
      val r = spark.sql(s"SELECT hamming_bits('$a', '$b') AS d").head.getLong(0)
      assert(r === want, s"hamming('$a','$b')")
    }
    // null propagation
    assert(spark.sql("SELECT hamming_bits(CAST(NULL AS STRING), '01') AS d")
      .head.isNullAt(0))
    // codegen path over a real column pair
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      format_string("%08d", col("id")).as("a"),
      format_string("%08d", col("id") + 1).as("b"))
      .select(call_function("hamming_bits", col("a"), col("b")).as("d"))
    assert(df.agg(min("d")).head.getLong(0) >= 1L)
  }

  test("array_dot survives explain/codegen paths") {
    val df = Tables.embeddings(spark, sf)
      .select(call_function("array_dot",
        transform(col("embedding"), _.cast("double")),
        transform(col("embedding"), _.cast("double"))).as("d"))
    // both the interpreted eval path (collect on small data) and the
    // codegen string must work
    assert(df.queryExecution.executedPlan.toString.nonEmpty)
    assert(df.limit(5).collect().forall(!_.isNullAt(0)))
  }
}
