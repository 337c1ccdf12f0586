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
