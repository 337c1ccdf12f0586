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
  * The rewrite lands in a sibling temp directory first and the swap
  * is two whole-DIRECTORY renames (old aside, new in, then drop old):
  * no crash point can lose data or leave a silently wrong store.
  * Before the first rename the original is untouched; between the
  * renames the store path is briefly absent — readers fail LOUDLY and
  * both full copies sit beside it (`.old-*` + `.compact-*`) for
  * recovery; deleting only file-by-file was rejected because a crash
  * mid-delete leaves an empty-looking store and a crash mid-move-in
  * leaves doubled rows.
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
    // the new log is fully committed: swap whole directories, checking
    // every rename (a false return here means the store is in an
    // unknown filesystem state — stop loudly, both copies intact)
    val old = new Path(p.getParent,
      s".${p.getName}.old-${java.util.UUID.randomUUID}")
    require(fs.rename(p, old), s"compact: failed to stage $p aside to $old")
    require(fs.rename(tmp, p), s"compact: failed to move $tmp in as $p " +
      s"(original preserved at $old)")
    // a false return here silently leaks a full .old-* copy of the
    // store beside the live one, doubling disk per compaction — the
    // store itself is already consistent, so surface the leak loudly
    require(fs.delete(old, true),
      s"compact: store swapped OK but could not delete staged copy $old " +
        "(disk now holds two full copies; remove it manually)")
    (before.size, GraftKVUtil.partFiles(dir).size)
  }
}
