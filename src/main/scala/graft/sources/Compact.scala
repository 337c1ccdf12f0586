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
    // split size is min(maxPartitionBytes, max(openCost,
    // totalBytes/minPartitionNum)) and minPartitionNum defaults to
    // the core count — on a wide executor a small input would pack
    // one-file-per-split and compact NOTHING. Pin it to 1 so bins
    // are sized by targetBytes alone, independent of parallelism.
    sess.conf.set("spark.sql.files.minPartitionNum", "1")
    sess.read.parquet(dir)
  }

  private def listParquet(spark: SparkSession, dir: String): Long = {
    // Hadoop FileSystem, not java.io.File: the census must work on
    // any supported URI scheme (hdfs://, s3a://), not just local disk.
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var n = 0L
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1L
    }
    n
  }

  /** Rewrite `dir` into `outDir` as ~targetBytes files. */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long): Stats = {
    val before = listParquet(spark, dir)
    val df = packedFrame(spark, dir, targetBytes)
    val rowsBefore = df.count()
    df.write.mode("overwrite").parquet(outDir)
    val out = spark.read.parquet(outDir)
    Stats(before, listParquet(spark, outDir), rowsBefore, out.count())
  }
}
