package graft

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Boundary semantics of the BANDED stream-stream interval join
  * (stream_join, StreamQueries): banding the 6-hour window into the
  * equi-key is a pure rewrite, so the band arms must neither prune a
  * legal pair nor admit an illegal one at the edges the rewrite
  * touches:
  *
  *  - a purchase at EXACTLY c_ts + 6h is in range and lands in the
  *    click's band+1 arm when the click sits just before a band
  *    boundary — the `floor((p-c)/W) ∈ {0,1}` inclusion proof's
  *    equality case;
  *  - a purchase 1s past the window is out even though band
  *    adjacency alone would admit it (the range predicate still
  *    guards);
  *  - a purchase CROSSING the band boundary 31s after the click is
  *    found only through the band+1 arm;
  *  - purchases before the click, and other users' purchases, stay
  *    out.
  */
class StreamJoinBandSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-streamjoin-fixture-").toString
    val t0 = java.sql.Timestamp.valueOf("1970-01-01 05:59:59") // band 0
    def at(plusSec: Long) = new java.sql.Timestamp(t0.getTime + plusSec * 1000)
    // (event_id, ts, user_id, event_type, value, props)
    Seq(
      (1L, t0, 1L, "click", 1.0, "{}"),
      // band+1 arm, in range: 06:00:30
      (2L, at(31), 1L, "purchase", 1.0, "{}"),
      // exactly c+6h: 11:59:59, band 1 — the boundary inclusion
      (3L, at(6 * 3600), 1L, "purchase", 1.0, "{}"),
      // 1s past the window: 12:00:00 — out by range
      (4L, at(6 * 3600 + 1), 1L, "purchase", 1.0, "{}"),
      // before the click — out by range, same band
      (5L, at(-3599), 1L, "purchase", 1.0, "{}"),
      // other user, perfect timing — out by key
      (6L, at(31), 2L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("band arms include exactly the 6h window, across band boundaries") {
    val out = SparkEntry.queries("stream_join")(spark, fixtureDir)
      .select(col("click_id"), col("purchase_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (1L, 3L)),
      "banded join must admit the cross-band and boundary pairs and nothing else")
  }
}
