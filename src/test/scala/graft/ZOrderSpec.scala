package graft

import graft.sources.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The z-order layout must deliver its actual promise: per-file
  * min/max ranges that are tight on EVERY clustered dimension at
  * once (that is what parquet footer pruning consumes). Measured as
  * the sum over files of (max-min) per dimension, against the same
  * data laid out by a plain single-column sort: the single-column
  * layout wins its own dimension but leaves the other spanning ~the
  * full domain per file; the z-layout must beat it by a wide margin
  * there while staying far below the unsorted baseline on both.
  */
class ZOrderSpec extends SparkSpec {

  private def spread(dir: String, dim: String): Long =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(col(dim)) - min(col(dim))).as("s"))
      .agg(sum(col("s"))).head().getLong(0)

  test("morton interleave: known bit patterns") {
    import spark.implicits._
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 0L))
      .toDF("a", "b")
      .select(ZOrder.interleave(3, col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of `a` -> position 2i; of `b` -> position 2i+1
    assert(out === Seq(0L, 1L, 2L, 15L, 17L))
  }

  test("property: interleave is the Morton bijection on its domain") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .distinct
    val codes = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.interleave(8, col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // injective: distinct points -> distinct codes
    assert(codes.map(_._3).distinct.length === pts.length)
    // invertible: de-interleaving the code recovers both coordinates
    codes.foreach { case (a, b, z) =>
      val (da, db) = (0 until 8).foldLeft((0L, 0L)) { case ((x, y), i) =>
        (x | (((z >> (2 * i)) & 1L) << i), y | (((z >> (2 * i + 1)) & 1L) << i))
      }
      assert(da === a && db === b, s"code $z did not invert to ($a, $b)")
    }
  }

  test("z-ordered files are tight on both dimensions; sorted files on one") {
    val n = 1 << 16
    val df = spark.range(n).select(
      // the full 256x256 grid, one row per cell, in scrambled order
      (col("id") % 256).as("u"),
      floor(col("id") / 256).cast("long").as("w"),
      (col("id") * 2654435761L % n).as("shuffle_key"))
      .orderBy("shuffle_key").drop("shuffle_key")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    df.repartition(8).write.parquet(s"$base/unsorted")
    df.withColumn("__s", col("u")).repartitionByRange(8, col("__s"))
      .sortWithinPartitions(col("__s")).drop("__s")
      .write.parquet(s"$base/sorted_u")
    ZOrder.writeClustered(df, s"$base/zorder", 8, 8, col("u"), col("w"))
    ZOrder.writeCubes(df, s"$base/zcubes", 8, 8, col("u"), col("w"))

    val (uZ, wZ) = (spread(s"$base/zorder", "u"), spread(s"$base/zorder", "w"))
    val (uC, wC) = (spread(s"$base/zcubes", "u"), spread(s"$base/zcubes", "w"))
    val (uS, wS) = (spread(s"$base/sorted_u", "u"), spread(s"$base/sorted_u", "w"))
    val (uN, wN) = (spread(s"$base/unsorted", "u"), spread(s"$base/unsorted", "w"))
    // unsorted: every file spans ~the full domain on both dims
    assert(uN > 8 * 250 * 9 / 10 && wN > 8 * 250 * 9 / 10)
    // single-column sort: tight on u, blind on w
    assert(uS < uN / 4 && wS > wN * 8 / 10)
    // range-partitioned z-order: clustered on both dims (boundaries
    // straddle a little, so rectangles are loose but real)
    assert(uZ < uN * 3 / 4, s"u spread $uZ not clustered (unsorted $uN)")
    assert(wZ < wN / 2, s"w spread $wZ not clustered (unsorted $wN)")
    // block-aligned cubes: EXACT rectangles — the top 3 code bits fix
    // (w7, u7, w6), so each of 8 files spans <=128 of u and <=64 of w
    assert(uC <= 8 * 127, s"cube u spread $uC exceeds aligned rectangles")
    assert(wC <= 8 * 63, s"cube w spread $wC exceeds aligned rectangles")
    assert(uC + wC < (uS + wS) * 3 / 4,
      s"cubes ($uC + $wC) not beating single-sort ($uS + $wS) overall")
  }
}
