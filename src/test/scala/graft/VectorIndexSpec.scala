package graft

import graft.sources.VectorIndex
import org.apache.spark.sql.functions._

/** The persisted IVF-int8 serving layout (sources/VectorIndex):
  * build writes a cell-partitioned code parquet + centroid sidecar;
  * search must (a) return exactly what the in-memory composition
  * (`ann_int8_ivf_topk`) computes for the same corpus, queries, and
  * parameters — the index adds a storage hop, never a semantic one —
  * and (b) actually PRUNE: the probed read must be a static
  * partition-filtered scan touching only the routed cells, which is
  * the entire point of the layout at corpus scale.
  */
class VectorIndexSpec extends SparkSpec {

  test("persisted-index search equals the in-memory int8-over-IVF search and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecindex-")
      .toString
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.build(emb, "vec_id", "embedding", nCells = 8, outDir = dir)

    val centDir = new java.io.File(s"$dir/centroids")
    val cellRoot = new java.io.File(s"$dir/cells")
    assert(centDir.isDirectory && cellRoot.isDirectory)
    val cellDirs = cellRoot.listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length > 1 && cellDirs.length <= 8,
      s"expected a directory per cell, got ${cellDirs.map(_.getName).toSeq}")

    val queries = emb.filter(col("vec_id") < 50)
    val served = VectorIndex.search(spark, dir, queries,
      "vec_id", "embedding", nprobe = 2, k = 5)

    // (a) storage hop, not a semantic one
    val fromIndex = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    val inMemory = SparkEntry.queries("ann_int8_ivf_topk")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(fromIndex === inMemory,
      s"index search diverged: only-index=${(fromIndex -- inMemory).take(3)} " +
        s"only-memory=${(inMemory -- fromIndex).take(3)}")

    // (b) the cell scan is statically partition-pruned to the routed
    // cells (all 50 queries probe 2 of 8 cells each here, so the scan
    // must carry an IN/INSET partition filter, not read the root)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan.take(2000))
    assert(plan.contains("INSET") || plan.contains(" IN ("),
      s"no partition IN-filter on the cells scan:\n${plan.take(2000)}")
  }

  test("append assigns a new batch to the standing cells; search sees both generations") {
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft-vecindex3-")
      .toString
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val half = n / 2
    VectorIndex.build(emb.filter(col("vec_id") < half),
      "vec_id", "embedding", nCells = 8, outDir = dir)
    VectorIndex.append(spark, dir, emb.filter(col("vec_id") >= half),
      "vec_id", "embedding")

    // every corpus vector is in the layout exactly once, in the cell
    // the SIDE CAR routes it to (appends ride the standing cell map,
    // they never retrain)
    val cells = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    assert(cells.count() === n)
    assert(cells.select(col("vec_id")).distinct().count() === n)
    val cents = spark.read.parquet(s"$dir/centroids")
    val expected = emb
      .select(col("vec_id"), graft.ops.VectorOps.asDouble(col("embedding"))
        .as("v"))
      .withColumn("nv", graft.ops.VectorOps.norm(col("v")))
      .crossJoin(broadcast(cents))
      .withColumn("simc", round(graft.ops.VectorOps.dot(col("v"), col("cv"))
        / (col("nv") * col("cn")), 6))
      .withColumn("rc", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("simc").desc, col("cid"))))
      .filter(col("rc") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    assert(cells.join(expected, Seq("vec_id"))
      .filter(cells("cell") =!= expected("cell")).count() === 0,
      "an appended vector landed outside its sidecar-routed cell")

    // search spans both generations: a first-half query must be able
    // to surface second-half neighbors
    val served = VectorIndex.search(spark, dir,
      emb.filter(col("vec_id") < 20), "vec_id", "embedding",
      nprobe = 2, k = 5)
    assert(served.count() === 20 * 5)
    assert(served.filter(col("vec_id") >= half).count() > 0,
      "no appended-generation vector ever ranked — append is invisible")
  }

  test("a narrow probe reads strictly fewer partitions than the corpus holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecindex2-")
      .toString
    val emb = Tables.embeddings(spark, sf)
    VectorIndex.build(emb, "vec_id", "embedding", nCells = 8, outDir = dir)
    // one query, one probe: exactly one cell directory may be read
    val served = VectorIndex.search(spark, dir,
      emb.filter(col("vec_id") === 0), "vec_id", "embedding",
      nprobe = 1, k = 3)
    assert(served.count() === 3)
    val scan = served.queryExecution.executedPlan.toString
    val m = "partition count: (\\d+)".r.findFirstMatchIn(scan.toLowerCase)
    m.foreach(g => assert(g.group(1).toInt === 1, scan.take(1500)))
    // the routed cell holds vec 0's neighbors: every hit shares one cell
    assert(served.select(col("cell")).distinct().count() === 1)
  }
}
