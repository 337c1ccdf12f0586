package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the Delta/Iceberg-style data-skipping layer
  * ABOVE parquet's own footer statistics: a `_zonemap` sidecar holds
  * one row per data file with [min,max] per stat column, and a range
  * read consults the sidecar FIRST, so files whose zone cannot match
  * are never even LISTED for the scan. Parquet footer pruning still
  * pays a footer read (an S3 GET per file at lake scale); the sidecar
  * turns that into one small parquet read — exactly why the table
  * formats keep file stats in the transaction log. The sidecar is
  * file-count-sized, the same cardinality every lakehouse driver
  * already collects, so the driver-side prune is metadata work, not
  * data work.
  *
  * Write path: one range repartition on the cluster key + in-file
  * sort (tight zones need clustering — a random layout gives every
  * file the full domain and the map prunes nothing), then the sidecar
  * is computed from a read-back grouped by `input_file_name()` — the
  * stats describe what actually landed on disk, not what the plan
  * intended.
  */
object ZoneMap {

  /** Write `df` range-clustered on `key` into `files` parquet files
    * under `path/data`, plus the `path/_zonemap` sidecar with
    * per-file [min,max] of each `statCols` column and a row count.
    */
  def write(df: DataFrame, path: String, files: Int, key: String,
            statCols: Seq[String]): Unit = {
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(s"$path/data")
    val s = df.sparkSession
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    s.read.parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  final case class Pruned(df: DataFrame, filesTotal: Long,
                          filesScanned: Long)

  /** Range read `lo <= c <= hi` that scans ONLY the files whose
    * [min_c, max_c] zone overlaps the predicate; the residual filter
    * still applies row-level inside survivors (zones admit, never
    * prove). An empty survivor set returns an empty frame with the
    * data schema intact.
    */
  def prunedRead(s: SparkSession, path: String, c: String,
                 lo: Long, hi: Long): Pruned = {
    // zone stats come back in whatever integral width the stat column
    // was written as (int ids, long keys, short codes) — read through
    // Number rather than hardcoding getLong, and fail with a named
    // error instead of a ClassCastException far from the mismatch.
    // Only integral range predicates are supported; decimal/date stat
    // columns need a widened sidecar schema first.
    def statLong(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i) match {
        case n: java.lang.Number => n.longValue()
        case other => throw new IllegalArgumentException(
          s"zone-map stat column '$c' must be integral, found " +
            s"${other.getClass.getName} in $path/_zonemap")
      }
    val zm = s.read.parquet(s"$path/_zonemap")
      .select(col("file"), col(s"min_$c"), col(s"max_$c")).collect()
    val keep = zm.filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        statLong(r, 2) >= lo && statLong(r, 1) <= hi)
      .map(_.getString(0))
    val base =
      if (keep.isEmpty) s.read.parquet(s"$path/data").filter(lit(false))
      else s.read.parquet(keep.toIndexedSeq: _*)
    Pruned(base.filter(col(c).between(lo, hi)), zm.length, keep.length)
  }
}
