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

  /** Schema of events.parquet. `ts` has shipped as parquet
    * TIMESTAMP(NANOS) (no Spark type — kept as long via
    * `spark.sql.legacy.parquet.nanosAsLong`, truncated to µs in
    * [[normalize]]) and as plain µs TIMESTAMP with or without the UTC
    * annotation. A file stream needs its schema fixed up front, so
    * [[readStream]] probes the static file's footer (one batch read of
    * the schema only) and reuses its `ts` type verbatim — decoding µs
    * values as ns would collapse every timestamp 1000× and turn
    * windowed/sessionized/range-join results into garbage.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Collapse every `ts` encoding to the one downstream contract:
    * `ts: TimestampType` in µs (same branch as [[graft.Tables.events]]).
    */
  def normalize(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }

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
    * pattern, probing the static file's schema (a one-footer read)
    * to choose the ns-as-long vs µs-timestamp decode.
    */
  def readStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType
    normalize(spark.readStream.schema(rawSchema(tsType))
      .parquet(FileInbox.stage(dir, "events")))
  }
}
