package graft

import graft.sources.kvlog.KVLogFormat
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The graft KV log DataSource V2 (S6/S7 deepened — the reference's
  * KVStore as a real Spark source/sink): round-trip, writer-demanded
  * clustering+ordering, column pruning, and key-range bucket pruning.
  */
class GraftKVSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graftkv").toString

  private def seed = {
    import spark.implicits._
    spark.range(0, 2000).select(
      format_string("k%05d", col("id")).as("key"),
      col("id").as("n"),
      (col("id") % 13).cast("double").as("score"),
      concat(lit("payload-"), col("id").cast("string")).as("payload"),
      (col("id") % 2 === 0).as("even"))
  }

  test("round-trips typed rows through the kv log") {
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 128).mode("append").save(dir)
    val back = spark.read.format("graftkv").load(dir)
    assert(back.schema.fieldNames.toSeq ===
      Seq("key", "n", "score", "payload", "even"))
    assert(back.count() === 2000)
    assert(back.agg(sum("n")).head.getLong(0) === (0L until 2000L).sum)
    // spot-check full row content incl. nullability of none
    val r = back.filter(col("key") === "k00042").head
    assert(r.getLong(1) === 42 && r.getString(3) === "payload-42"
      && r.getBoolean(4) === true)
  }

  test("writer demands clustering + per-task key order (Catalyst plans the shuffle+sort)") {
    val dir = tmp()
    // deliberately unsorted, badly partitioned input
    seed.orderBy(rand(seed = 11)).repartition(7)
      .write.format("graftkv").option("bucketsize", 64).mode("append").save(dir)
    // per part file the footer's bucket mins/maxes must be
    // non-overlapping and internally ascending — only possible if the
    // writer really received clustered, sorted rows
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gkv")).sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val footer = graft.sources.kvlog.GraftKVUtilAccess.footerOf(f.getPath)
      val bs = footer.buckets
      assert(bs.nonEmpty)
      // ascending, non-overlapping buckets within the file
      bs.sliding(2).foreach {
        case Seq(a, b) => assert(a.maxKey <= b.minKey)
        case _ => ()
      }
      assert(bs.forall(b => b.minKey <= b.maxKey))
    }
    // clustered: the same key never appears in two files (trivially
    // true for unique keys; check global ranges don't interleave docs
    // of one key) and nothing is lost
    val back = spark.read.format("graftkv").load(dir)
    assert(back.count() === 2000)
    assert(back.select(countDistinct("key")).head.getLong(0) === 2000)
  }

  test("compaction restores a tight layout after many appends; lookups identical") {
    import graft.sources.kvlog.{GraftKVCompact, GraftKVUtilAccess}
    def layout(dir: String) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gkv")).sortBy(_.getName)
      (files.length,
        files.map(f => GraftKVUtilAccess.footerOf(f.getPath).buckets.size).sum)
    }
    // reference layout: the same rows in ONE write
    val ref = tmp()
    seed.write.format("graftkv").option("bucketsize", 128).mode("append").save(ref)
    val (refParts, refBuckets) = layout(ref)

    // incremental layout: 8 appended slices -> 8x the part files, small
    // tail buckets per slice
    val dir = tmp()
    (0 until 8).foreach { i =>
      seed.filter(col("n") % 8 === i)
        .write.format("graftkv").option("bucketsize", 128).mode("append").save(dir)
    }
    val (fragParts, fragBuckets) = layout(dir)
    // the degradation compaction repairs is part-file proliferation
    // (point lookups probe O(parts) footers); total bucket count stays
    // ~rows/bucketSize under any fragmentation
    assert(fragParts > refParts, "appends must accumulate part files")
    assert(fragBuckets >= refBuckets)

    val probe = spark.read.format("graftkv").load(dir)
      .filter(col("key") === "k01234").collect().map(_.toSeq).toSeq

    val (before, after) = GraftKVCompact.compact(spark, dir, bucketSize = 128)
    assert(before === fragParts)

    // compacted layout matches a fresh single write of the same rows
    assert(layout(dir) === (refParts, refBuckets))
    assert(after === refParts)
    val back = spark.read.format("graftkv").load(dir)
    assert(back.count() === 2000)
    assert(back.agg(sum("n")).head.getLong(0) === (0L until 2000L).sum)
    // point lookup (footer range + bloom path) returns the same row
    assert(back.filter(col("key") === "k01234").collect().map(_.toSeq).toSeq
      === probe)
  }

  test("column pruning reaches the scan") {
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 128).mode("append").save(dir)
    val q = spark.read.format("graftkv").load(dir).select("n")
    val scan = q.queryExecution.executedPlan.toString()
    assert(scan.contains("columns=n"), s"expected pruned scan in:\n$scan")
    assert(q.agg(sum("n")).head.getLong(0) === (0L until 2000L).sum)
  }

  test("key-range filters prune whole buckets via the footer index") {
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 100).mode("append").save(dir)
    val q = spark.read.format("graftkv").load(dir)
      .filter(col("key") >= "k01500" && col("key") < "k01600")
    assert(q.count() === 100)
    assert(q.agg(sum("n")).head.getLong(0) === (1500L until 1600L).sum)
    // the pure pruning decision: of the 20 buckets only the ones
    // overlapping [k01500, k01600) survive
    val footer = graft.sources.kvlog.GraftKVUtilAccess
      .footerOf(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gkv")).head.getPath)
    val total = footer.buckets.length
    val kept = KVLogFormat.selectBuckets(footer.buckets,
      KVLogFormat.KeyRange(Some("k01500"), Some("k01600"))).length
    assert(kept < total, s"pruning kept $kept of $total buckets")
  }

  test("non-key predicates prune buckets via footer column stats") {
    import graft.sources.kvlog.GraftKVScanCounters
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 100).mode("append").save(dir)

    // n correlates with the key sort, so bucket [min, max] stats on n
    // exclude most buckets for a tail filter — counted live
    GraftKVScanCounters.reset()
    val q = spark.read.format("graftkv").load(dir).filter(col("n") >= 1900L)
    assert(q.count() === 100)
    assert(q.agg(sum("n")).head.getLong(0) === (1900L until 2000L).sum)
    assert(GraftKVScanCounters.bucketsSkipped.get() > 0,
      "a non-key filter skipped no buckets")
    assert(GraftKVScanCounters.bucketsRead.get() <
      GraftKVScanCounters.bucketsSkipped.get(),
      "tail filter should read fewer buckets than it skips")

    // the pure decision, on the footer directly
    val footer = graft.sources.kvlog.GraftKVUtilAccess
      .footerOf(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gkv")).head.getPath)
    val total = footer.buckets.length
    val keptGe = KVLogFormat.selectBuckets(footer.buckets,
      KVLogFormat.FullRange, footer.schema,
      Seq(KVLogFormat.ColPred("n", "ge", 1900L))).length
    assert(keptGe < total, s"ge-pruning kept $keptGe of $total buckets")
    val keptEq = KVLogFormat.selectBuckets(footer.buckets,
      KVLogFormat.FullRange, footer.schema,
      Seq(KVLogFormat.ColPred("n", "eq", 1234L))).length
    assert(keptEq === 1, s"point predicate should keep exactly 1 bucket")
    // a predicate on a stat-less field never prunes
    val noStats = footer.buckets.map(b => b.copy(colStats = Seq.empty))
    assert(KVLogFormat.selectBuckets(noStats, KVLogFormat.FullRange,
      footer.schema, Seq(KVLogFormat.ColPred("n", "eq", 1234L))).length
      === total)
  }

  test("key blooms skip buckets on negative point lookups") {
    import graft.sources.kvlog.GraftKVScanCounters
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 100).mode("append").save(dir)
    val footer = graft.sources.kvlog.GraftKVUtilAccess
      .footerOf(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gkv")).head.getPath)

    // keys are k00000..k01999 with no gaps in steps of 1, so "k00500x"
    // sorts INSIDE a bucket's [min, max] range but was never written:
    // range pruning keeps exactly one bucket, the bloom drops it too
    val absent = "k00500x"
    val range = KVLogFormat.KeyRange(Some(absent), Some(absent))
    val byRangeOnly = footer.buckets.filter(range.overlaps)
    assert(byRangeOnly.length === 1, "absent key should land in one bucket")
    assert(KVLogFormat.selectBuckets(footer.buckets, range).isEmpty,
      "bloom should drop the in-range bucket for an absent key")

    // a present key must survive both range and bloom
    val present = KVLogFormat.KeyRange(Some("k00500"), Some("k00500"))
    assert(KVLogFormat.selectBuckets(footer.buckets, present).length === 1)
    // a bloom-less footer (older file) never prunes
    val noBloom = footer.buckets.map(_.copy(bloom = scala.collection.immutable.ArraySeq.empty))
    assert(KVLogFormat.selectBuckets(noBloom, range).length === 1)

    // live: the negative lookup decompresses ZERO buckets
    GraftKVScanCounters.reset()
    val none = spark.read.format("graftkv").load(dir)
      .filter(col("key") === absent)
    assert(none.count() === 0)
    assert(GraftKVScanCounters.bucketsRead.get() === 0,
      "negative point lookup should decompress no buckets")
    val hit = spark.read.format("graftkv").load(dir)
      .filter(col("key") === "k01234")
    assert(hit.count() === 1)
  }

  test("NaN doubles disable that column's bucket stats — no silent row loss") {
    import spark.implicits._
    val dir = tmp()
    // one bucket holding (NaN, 1.0, 2.0): Spark treats NaN as larger
    // than every double, so `score > 5.0` MUST return the NaN row — a
    // min/max stat built ignoring the NaN would prune the only bucket
    Seq(("a", Double.NaN), ("b", 1.0), ("c", 2.0)).toDF("key", "score")
      .coalesce(1)
      .write.format("graftkv").option("bucketsize", 10).mode("append").save(dir)
    val back = spark.read.format("graftkv").load(dir)
    assert(back.filter(col("score") > 5.0).count() === 1)
    assert(back.filter(col("score") <= 5.0).count() === 2)
    val footer = graft.sources.kvlog.GraftKVUtilAccess
      .footerOf(new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".gkv")).head.getPath)
    assert(!footer.buckets.head.colStats.head.defined,
      "a NaN-containing double column must carry no stats")
  }

  test("key pruning uses UTF-8 binary order, matching the engine") {
    import spark.implicits._
    val dir = tmp()
    // U+10000 (a surrogate pair) sorts ABOVE U+E000 in UTF-8 bytes
    // (Spark's predicate order) but BELOW it in Java's UTF-16 compare;
    // a Java-collated index would prune the bucket holding the row
    val hi = "k" + new String(Character.toChars(0x10000))
    val mid = "k"
    Seq((hi, 1L), (mid, 2L), ("ka", 3L)).toDF("key", "n")
      .coalesce(1)
      .write.format("graftkv").option("bucketsize", 2).mode("append").save(dir)
    val back = spark.read.format("graftkv").load(dir)
    assert(back.count() === 3)
    assert(back.filter(col("key") > mid).select("n").head.getLong(0) === 1L)
    assert(back.filter(col("key") === hi).count() === 1)
  }

  test("overwrite truncates previous files; nulls round-trip") {
    import spark.implicits._
    val dir = tmp()
    seed.write.format("graftkv").mode("append").save(dir)
    val small = Seq(("a", Some(1L)), ("b", None), ("c", Some(3L)))
      .toDF("key", "n")
      .select(col("key"), col("n"))
    small.write.format("graftkv").mode("overwrite").save(dir)
    val back = spark.read.format("graftkv").load(dir)
    assert(back.count() === 3)
    assert(back.filter(col("n").isNull).select("key").head.getString(0) === "b")
  }

  test("COUNT(*) is answered from the footer index without decoding buckets") {
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 128).mode("append").save(dir)
    graft.sources.kvlog.GraftKVCountScanAccess.reset()
    val n = spark.read.format("graftkv").load(dir).count()
    assert(n === 2000)
    assert(graft.sources.kvlog.GraftKVCountScanAccess.planned > 0,
      "footer-count scan never engaged")
    // a filtered count must NOT use the footer shortcut (exactness)
    graft.sources.kvlog.GraftKVCountScanAccess.reset()
    val nf = spark.read.format("graftkv").load(dir)
      .filter(col("key") >= "k01000").count()
    assert(nf === 1000)
    assert(graft.sources.kvlog.GraftKVCountScanAccess.planned === 0,
      "footer count must not engage under predicates")
  }

  test("scan reports footer-exact statistics, range-pruned") {
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 100).mode("append").save(dir)
    val full = spark.read.format("graftkv").load(dir)
    val fullStats = full.queryExecution.optimizedPlan.stats
    assert(fullStats.rowCount.exists(_.toLong === 2000L))
    val narrow = spark.read.format("graftkv").load(dir)
      .filter(col("key") >= "k01900")
    val narrowStats = narrow.queryExecution.optimizedPlan.stats
    // the range-pruned estimate must be far below the full size
    assert(narrowStats.sizeInBytes < fullStats.sizeInBytes / 2,
      s"narrow=${narrowStats.sizeInBytes} full=${fullStats.sizeInBytes}")
  }

  test("streaming sink drains a file stream into epoch-stamped kv parts") {
    val dir = tmp()
    val ckpt = tmp()
    val ev = graft.streaming.EventsStream.readStream(spark, sf)
      .select(
        format_string("%s:%08d", col("event_type"), col("event_id")).as("key"),
        col("user_id").as("user_id"),
        col("value").as("value"))
    val q = ev.writeStream.format("graftkv")
      .option("path", dir).option("bucketsize", 256)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.format("graftkv").load(dir)
    val expected = Tables.events(spark, sf).count()
    assert(back.count() === expected)
    assert(back.schema.fieldNames.toSeq === Seq("key", "user_id", "value"))
    // footer min/max stay honest for arbitrary (unsorted) stream order
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gkv"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val footer = graft.sources.kvlog.GraftKVUtilAccess.footerOf(f.getPath)
      footer.buckets.foreach(b => assert(b.minKey <= b.maxKey))
    }
  }

  test("runtime join-key filters tighten the scan (DPP-style)") {
    import spark.implicits._
    val dir = tmp()
    seed.write.format("graftkv").option("bucketsize", 100).mode("append").save(dir)
    val kv = spark.read.format("graftkv").load(dir)
    val dim = Seq("k00100", "k00150").toDF("k").filter(col("k") > "k00000")
    // without stats DPP falls back to the fixed filter-ratio heuristic,
    // which lets the pruning fire on a small test table
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val rows =
      try kv.join(dim.hint("broadcast"), kv("key") === dim("k")).collect()
      finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("n")).sorted.toSeq === Seq(100L, 150L))
    // engagement through the planner is Spark's heuristic decision (DPP
    // declines tiny scans); the join result above proves correctness
    info(s"runtime filter engagements: ${graft.sources.kvlog.GraftKVScanRuntime.engaged.get()}")

    // drive the SupportsRuntimeFiltering contract directly: the
    // delivered IN-set must tighten every planned partition to the
    // set's [min, max] envelope
    import org.apache.spark.sql.connector.catalog.SupportsRead
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
    val src = new graft.sources.kvlog.GraftKVSource
    val table = src.getTable(src.inferSchema(opts), Array.empty, opts.asCaseSensitiveMap())
    val scan = table.asInstanceOf[SupportsRead].newScanBuilder(opts).build()
    scan.asInstanceOf[SupportsRuntimeFiltering].filter(
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("key", Array("k00150", "k00100"))))
    val parts = scan.toBatch.planInputPartitions()
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val gp = p.asInstanceOf[graft.sources.kvlog.GraftKVInputPartition]
      assert(gp.lower === Some("k00100") && gp.upper === Some("k00150"))
    }
  }

  test("append with a different schema fails at plan time; overwrite allows it") {
    import spark.implicits._
    val dir = tmp()
    seed.write.format("graftkv").mode("append").save(dir)
    val other = Seq(("a", 1.5)).toDF("key", "score2")
    val e = intercept[Exception] {
      other.write.format("graftkv").mode("append").save(dir)
    }
    assert(e.getMessage.contains("schema mismatch")
      || Option(e.getCause).exists(_.getMessage.contains("schema mismatch")))
    other.write.format("graftkv").mode("overwrite").save(dir)
    assert(spark.read.format("graftkv").load(dir).count() === 1)
  }

  test("rejects schemas without a string key or with unsupported types") {
    import spark.implicits._
    val dir = tmp()
    val bad = Seq((1L, "x")).toDF("key", "v") // key not string
    intercept[Exception] {
      bad.write.format("graftkv").mode("append").save(dir)
    }
  }
}
