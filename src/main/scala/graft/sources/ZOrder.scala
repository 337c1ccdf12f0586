package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-code) clustered layout for multi-dimension scan
  * pruning — the 100-TB lever parquet min/max statistics need when
  * queries filter on MORE than one column. Sorting a table by
  * `(a, b)` makes every file's `a` range tight but leaves `b` spanning
  * the whole domain in every file; interleaving the bits of both keys
  * and range-partitioning on the interleaved code gives every file a
  * tight range on EVERY participating dimension, so a predicate on any
  * of them skips most files from the footer stats alone (the layout
  * behind Delta/Iceberg's OPTIMIZE ZORDER; Morton 1966 is the code).
  *
  * The code is a pure Column expression — `bits` per dimension,
  * bit `i` of dimension `j` landing at interleaved position
  * `i*dims + j` — so it rides whole-stage codegen, and the write is
  * one range repartition + an in-partition sort: exactly one shuffle,
  * the same cost as any global sort the table was going to pay for a
  * single-column layout.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (long-castable,
    * non-negative after the caller's own bucketing/normalization —
    * rank or hash-bucket raw values first; 16 bits × 4 dims fits a
    * long with room to spare).
    */
  def interleave(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"interleave: ${cols.size} dims x $bits bits exceeds a long")
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      val v = c.cast("long")
      (0 until bits).map { i =>
        shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on `zCols` into `files` parquet files:
    * range-partition on the Morton code and sort within each partition
    * so row groups inside a file cluster too. The primary range key is
    * the code's top ceil(log2(files)) bits — an ALIGNED z-block id —
    * with the full code as tiebreaker: sampled range boundaries then
    * fall between block ids instead of inside one, so each file covers
    * whole z-rectangles of the key space rather than straddling a
    * curve discontinuity (a straddling file's min/max spans the jump
    * and footer pruning loses the dimension). The code column never
    * lands on disk.
    */
  def writeClustered(df: DataFrame, path: String, files: Int,
                     bits: Int, zCols: Column*): Unit = {
    val zkey = interleave(bits, zCols: _*)
    val blockBits =
      math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(files.toLong - 1))
    val shift = math.max(0, bits * zCols.size - blockBits)
    df.withColumn("__z", zkey)
      .withColumn("__zb", shiftright(col("__z"), shift))
      .repartitionByRange(files, col("__zb"), col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__zb")
      .write.mode("overwrite").parquet(path)
  }

  /** The block-ALIGNED variant: one hive partition directory per
    * aligned z-block (the code's top ceil(log2(files)) bits). Range
    * partitioning samples its boundaries, so a file always straddles
    * two blocks a little — and a file's min/max is destroyed by a
    * single row from across a curve discontinuity. Writing the block
    * id as a partition column instead makes the alignment exact:
    * every data FILE holds exactly one block = one tight z-rectangle
    * on every clustered dimension (footer stats prune multi-dim range
    * predicates file by file), and the block id itself prunes at the
    * directory level. One hash shuffle on the block id; the in-task
    * sort keeps row groups inside each file clustered too.
    */
  def writeCubes(df: DataFrame, path: String, files: Int,
                 bits: Int, zCols: Column*): Unit = {
    val zkey = interleave(bits, zCols: _*)
    val blockBits =
      math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(files.toLong - 1))
    val shift = math.max(0, bits * zCols.size - blockBits)
    df.withColumn("__z", zkey)
      .withColumn("__zb", shiftright(col("__z"), shift))
      .repartition(files, col("__zb"))
      .sortWithinPartitions(col("__zb"), col("__z"))
      .drop("__z")
      .write.mode("overwrite").partitionBy("__zb").parquet(path)
  }
}
