package graft

import graft.harness.StreamQueries

/** Streaming drains must not leak configuration into the shared
  * session: each drain runs on its own `newSession()` child with a
  * drain-scoped shuffle-partition count, so a concurrent query on the
  * parent session never observes a mutated
  * `spark.sql.shuffle.partitions` (the anti-pattern previously fixed
  * in Graphs.scala after it was flagged there).
  */
class StreamIsolationSpec extends SparkSpec {

  test("a streaming drain leaves the parent session conf untouched") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    // Watch the parent conf DURING the drain from a second thread:
    // the old implementation set 8 on the shared session for the
    // drain's duration, which this sampler would observe.
    @volatile var observed = Set.empty[String]
    @volatile var running = true
    val sampler = new Thread(() => {
      while (running) { observed += spark.conf.get(key); Thread.sleep(1) }
    })
    sampler.start()
    val out = try StreamQueries.queries("stream_window_counts")(spark, sf)
    finally { running = false; sampler.join() }
    assert(out.count() > 0)
    assert(spark.conf.get(key) === before)
    assert(observed === Set(before),
      s"parent session observed mutated $key values: $observed")
  }

  test("the drained result is rehomed to the parent and the sink freed") {
    val out = StreamQueries.queries("stream_dedup")(spark, sf)
    // the drain ran on a child session (test above proves the scoped
    // conf never leaks); the RESULT is copied back to the parent so
    // the child session and its memory-sink table can be collected —
    // without that, every drain in a long JVM retains a full table copy
    assert(out.sparkSession eq spark)
    assert(!spark.catalog.tableExists("stream_dedup_mem"),
      "memory-sink view must not leak into the parent catalog")
    assert(out.count() > 0)
  }
}
