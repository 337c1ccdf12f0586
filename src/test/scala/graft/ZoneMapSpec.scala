package graft

import graft.sources.ZoneMap
import org.apache.spark.sql.functions._

/** The zone-map contract: the sidecar describes what landed on disk,
  * a narrow range predicate scans only overlapping files (skipping at
  * the LISTING level, before any footer is touched), survivors still
  * filter row-level, and a predicate outside every zone returns an
  * empty frame without reading any data file.
  */
class ZoneMapSpec extends SparkSpec {

  test("range-clustered write prunes files by sidecar zones and keeps answers exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-zm-").toString
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), (col("l_orderkey") % 4096).as("k"),
        col("l_quantity"))
    ZoneMap.write(li, root, files = 16, key = "k", statCols = Seq("k"))

    val pr = ZoneMap.prunedRead(spark, root, "k", 1000L, 1199L)
    assert(pr.filesTotal === 16L, s"wrote ${pr.filesTotal} files")
    assert(pr.filesScanned < pr.filesTotal / 2,
      s"zone map admitted ${pr.filesScanned}/${pr.filesTotal} files " +
        "for a ~5% key range — clustering or pruning is broken")
    assert(pr.filesScanned >= 1L)

    // pruned answer == unpruned answer, row for row
    val expect = li.filter(col("k").between(1000, 1199))
    assert(pr.df.exceptAll(expect).isEmpty &&
      expect.exceptAll(pr.df).isEmpty,
      "pruned read must return exactly the predicate's rows")

    // a predicate outside every zone scans nothing and yields schema-
    // intact emptiness
    val none = ZoneMap.prunedRead(spark, root, "k", 100000L, 100001L)
    assert(none.filesScanned === 0L)
    assert(none.df.count() === 0L)
    assert(none.df.columns.toSeq === pr.df.columns.toSeq)
  }
}
