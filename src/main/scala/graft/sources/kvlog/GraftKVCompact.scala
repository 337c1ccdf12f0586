package graft.sources.kvlog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Compaction for an appended graftkv directory — the Spark-native
  * analogue of the reference's k-way merge of sorted runs into one
  * tight store (interpro7dw keeps lookup stores fast the same way:
  * many incrementally written chunks merge into one key-sorted file,
  * utils/store.py:262-341 / lookup loaders).
  *
  * Incremental ingest (dedup_incremental's O(batch) story, streaming
  * epoch appends) accumulates small part files, each with its own
  * footer index: point lookups stay CORRECT but degrade toward
  * O(parts) footer probes, and tiny tail buckets blunt the range/bloom
  * pruning. Compacting re-reads the directory through the DSv2 source
  * and rewrites it through the DSv2 writer, whose
  * RequiresDistributionAndOrdering contract makes Catalyst plan the
  * cluster-wide shuffle + per-task key sort — so compaction is an
  * ordinary distributed Spark job, not a driver-side merge, and the
  * result is byte-layout-identical to a fresh single write of the same
  * rows (same clustering, same 4096-row buckets, fresh blooms/stats).
  *
  * The rewrite lands in a sibling temp directory first and part files
  * swap in afterwards, so a crash mid-compact leaves the original
  * directory fully readable (at worst plus a stale `.compact-*` temp
  * to sweep).
  */
object GraftKVCompact {

  /** Rewrite `dir` as one freshly sorted, tightly bucketed log.
    * Returns (parts before, parts after).
    */
  def compact(spark: SparkSession, dir: String,
              bucketSize: Int = 4096): (Int, Int) = {
    val (fs, p) = GraftKVUtil.fs(dir)
    val before = GraftKVUtil.partFiles(dir)
    require(before.nonEmpty, s"nothing to compact under $dir")
    val tmp = new Path(p.getParent,
      s".${p.getName}.compact-${java.util.UUID.randomUUID}")
    spark.read.format("graftkv").load(dir)
      .write.format("graftkv")
      .option("bucketsize", bucketSize.toString)
      .mode("append")
      .save(tmp.toString)
    // the new log is fully committed: swap parts in, drop the old ones
    before.foreach(f => fs.delete(f, false))
    GraftKVUtil.partFiles(tmp.toString).foreach { f =>
      fs.rename(f, new Path(p, f.getName))
    }
    fs.delete(tmp, true)
    (before.size, GraftKVUtil.partFiles(dir).size)
  }
}
