package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The events loader contract across every `ts` encoding the dataset
  * has shipped in, pinned WITHOUT depending on /root/testdata: the r8
  * regression was a regenerated dataset flipping TIMESTAMP(NANOS) →
  * µs TIMESTAMP while the loaders hard-coded the ns decode (7 queries
  * died or silently returned 1000×-collapsed windows). Both
  * [[Tables.events]] and [[EventsStream.readStream]] must surface
  * `ts: TimestampType` with IDENTICAL values for:
  *   - ns-as-long (INT64 of nanoseconds — how TIMESTAMP(NANOS)
  *     surfaces under `spark.sql.legacy.parquet.nanosAsLong`),
  *   - µs TIMESTAMP (UTC-adjusted),
  *   - µs TIMESTAMP_NTZ (no UTC annotation — the current driver
  *     layout; sessions run UTC so naive == UTC wall clock).
  */
class EventsEncodingSpec extends SparkSpec {

  // two rows spanning an hour boundary so windowed results are
  // encoding-sensitive (a 1000× collapse folds them into one window)
  private val baseUs = 1700000000000000L // 2023-11-14 22:13:20 UTC
  private val rowsUs = Seq(
    (1L, baseUs, 10L, "click", 1.5, "{}"),
    (2L, baseUs + 3600L * 1000000L, 10L, "purchase", 2.5, "{}"),
    (3L, baseUs + 2 * 3600L * 1000000L, 11L, "click", 3.5, "{}"))

  private def writeFixture(encoding: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-events-$encoding-").toString
    import spark.implicits._
    val asLong = rowsUs
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val df: DataFrame = encoding match {
      case "ns_long" => asLong.withColumn("ts", col("ts") * 1000L)
      case "us_ltz"  => asLong.withColumn("ts", timestamp_micros(col("ts")))
      case "us_ntz"  => asLong.withColumn("ts",
        timestamp_micros(col("ts")).cast(TimestampNTZType))
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings = Seq("ns_long", "us_ltz", "us_ntz")

  private def canon(df: DataFrame): Seq[(Long, Long)] = {
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must yield TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  private val wantTs = rowsUs.map(r => (r._1, r._2))

  test("Tables.events decodes every shipped ts encoding to identical µs timestamps") {
    encodings.foreach { enc =>
      val got = canon(Tables.events(spark, writeFixture(enc)))
      assert(got === wantTs, s"encoding $enc")
    }
  }

  test("EventsStream decodes every shipped ts encoding identically (windowed drain)") {
    encodings.foreach { enc =>
      val dir = writeFixture(enc)
      val name = s"events_enc_$enc"
      val stream = EventsStream.readStream(spark, dir)
      assert(stream.schema("ts").dataType === TimestampType, s"encoding $enc")
      val q = EventsStream.windowedCounts(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(name)
        .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm").as("w"),
          col("event_type"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      spark.catalog.dropTempView(name)
      // three rows, three distinct hours → three windows of one event
      assert(got === Seq(
        ("2023-11-14 22:00", "click", 1L),
        ("2023-11-14 23:00", "purchase", 1L),
        ("2023-11-15 00:00", "click", 1L)), s"encoding $enc")
    }
  }
}
