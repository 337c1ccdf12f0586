package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9: the reference is
  * batch-only; this demonstrates the streaming analogue of its
  * sentinel-file export/index pipelines — a file stream + watermarked
  * tumbling-window aggregation, same code path for batch frames).
  */
object EventsStream {

  /** Schema of events.parquet with the ns timestamp kept as long
    * (Spark has no ns type; `spark.sql.legacy.parquet.nanosAsLong`).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling-window counts per event type. Works on both
    * batch and streaming frames (watermark is a no-op in batch). The
    * value sum runs in exact decimal so results are deterministic
    * across partition orders, then renders as double.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("total_value"))

  /** Open events as a file stream via the [[FileInbox]] staging
    * pattern (ns timestamps kept as long, then truncated to µs).
    */
  def readStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.readStream.schema(rawSchema)
      .parquet(FileInbox.stage(dir, "events")))
  }
}
