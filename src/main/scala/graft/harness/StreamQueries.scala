package graft.harness

import graft.streaming.EventsStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface (SURVEY.md §2.9). The reference is
  * batch-only (sentinel-file pipelines between export and index
  * tasks); this is the Spark-native analogue: a file stream with
  * watermarked tumbling-window aggregation run to completion with
  * Trigger.AvailableNow — the pattern that replaces the reference's
  * `.load`/`.done` handoff (interpro/elastic/export.py:44-67).
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Watermark + 1h tumbling window over the events file stream,
    // drained via AvailableNow into a memory sink. The value sum runs
    // in exact decimal (double sum order is nondeterministic across
    // partitions) and renders as double, matching the oracle.
    "stream_window_counts" -> ((s, d) => {
      val name = "stream_window_counts_mem"
      s.catalog.dropTempView(name)
      val agg = EventsStream
        .windowedCounts(EventsStream.readStream(s, d))
        .select(
          date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n"), col("total_value"))
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_window_counts" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2"""
  )
}
