package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The documents table as a file stream (the ingest side of a
  * streaming corpus pipeline), staged through [[FileInbox]].
  */
object DocsStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(FileInbox.stage(dir, "documents"))
}
