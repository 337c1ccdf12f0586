package graft

import graft.sources.Compact
import org.apache.spark.sql.functions._

/** The compaction contract: fewer files, identical content, and a
  * shuffle-free plan (the packing happens on the READ side; a rewrite
  * that exchanges rows would be a repartition in disguise and defeat
  * the point at 100 TB).
  */
class CompactSpec extends SparkSpec {

  test("compacts many small files into few, content-identical, no shuffle") {
    val root = java.nio.file.Files.createTempDirectory("graft-compact-")
    val smallDir = s"$root/small"
    val outDir = s"$root/compacted"

    val src = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    src.repartition(40).write.parquet(smallDir)

    val stats = Compact.compact(spark, smallDir, outDir, 64L * 1024 * 1024)
    assert(stats.filesBefore >= 40, s"setup wrote ${stats.filesBefore} files")
    assert(stats.filesAfter < stats.filesBefore / 4,
      s"expected real consolidation, got ${stats.filesBefore} -> " +
        s"${stats.filesAfter}")
    assert(stats.rowsBefore === stats.rowsAfter)

    // content identical (order-free): same per-key checksums
    val a = spark.read.parquet(smallDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_partkey")).as("sp"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("se"))
    val b = spark.read.parquet(outDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_partkey")).as("sp"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("se"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compacted content must equal the input")

    // the packed read plan is scan-only: no Exchange anywhere
    val plan = Compact.packedFrame(spark, smallDir, 64L * 1024 * 1024)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction shuffles:\n$plan")
  }
}
