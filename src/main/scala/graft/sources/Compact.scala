package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the lakehouse maintenance op every
  * long-running ingest needs (streaming sinks, incremental appends,
  * and per-task writers all accrete kilobyte parquet files whose
  * footer/open cost eventually dominates scans; the reference's
  * nightly rebuild sidesteps this by rewriting everything, which is
  * exactly what doesn't fly at 100 TB).
  *
  * The rewrite is SHUFFLE-FREE by construction: Spark's file-source
  * packing (`spark.sql.files.maxPartitionBytes` +
  * `spark.sql.files.openCostInBytes`) bin-packs the small files into
  * read splits of ~targetBytes, and the write emits one output file
  * per packed split — scan → write, no Exchange, no row ever leaves
  * its executor. Conf is scoped to a child session so the caller's
  * session never observes mutated file-split settings.
  */
object Compact {

  final case class Stats(filesBefore: Long, filesAfter: Long,
                         rowsBefore: Long, rowsAfter: Long)

  /** The packed read: one partition per ~targetBytes bin of input
    * files. Exposed for plan inspection (CompactSpec asserts no
    * Exchange).
    */
  def packedFrame(spark: SparkSession, dir: String,
                  targetBytes: Long): DataFrame = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    // default openCost (4 MiB) would count each tiny file as 4 MiB
    // and cap bins at maxPartitionBytes/4MiB files — pack by real
    // bytes plus a nominal footer-read cost instead
    sess.conf.set("spark.sql.files.openCostInBytes", "16384")
    sess.read.parquet(dir)
  }

  private def listParquet(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1L else 0L
    walk(new java.io.File(dir))
  }

  /** Rewrite `dir` into `outDir` as ~targetBytes files. */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long): Stats = {
    val before = listParquet(dir)
    val df = packedFrame(spark, dir, targetBytes)
    val rowsBefore = df.count()
    df.write.mode("overwrite").parquet(outDir)
    val out = spark.read.parquet(outDir)
    Stats(before, listParquet(outDir), rowsBefore, out.count())
  }
}
