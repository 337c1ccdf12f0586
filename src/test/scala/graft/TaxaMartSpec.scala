package graft

import graft.harness.TaxaMartQueries
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Invariants of the proteome/structure marts the hash oracle cannot
  * state (r13 verdict item 6):
  *
  *  - `mart_structure_counts` is TOTAL over the structure dim (the
  *    reference iterates the full structures pickle,
  *    interpro/mysql/structures.py:117-153) and renders an unmatched
  *    structure as `"entries":{"total":0}` with NO per-db arm and no
  *    dangling comma — proven on a hand-built fixture with one
  *    matched supplier, one with no matches at all, and one whose
  *    only match fails the interval-overlap predicate;
  *  - the chain/match interval join plans as an EQUI join with range
  *    residuals (RelOps.intervalJoin keys on suppkey), never a
  *    BroadcastNestedLoopJoin or CartesianProduct;
  *  - the five countDistincts in one aggregate expand 5× and no more
  *    (the accepted-standard plan the r13 verdict flags for pinning).
  *
  * The proteome marts' JSON assembly (db-sorted arms, total-first key
  * order, mysql/proteomes.py:125-172) is pinned on the same fixture.
  */
class TaxaMartSpec extends SparkSpec {

  /** Mini sf-dir: supplier 1 matches protein 100 twice (cdd, panther),
    * supplier 2 has no lineitem at all, supplier 3's only lineitem
    * lies outside its chain interval ([10,12] vs chain [3,6]).
    */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-taxamart-fixture-").toString
    Seq((1L, "struct-one"), (2L, "struct-two"), (3L, "struct-three"))
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity)
    Seq((100L, 0L, 1L, 1L, 5.0), (100L, 1L, 1L, 2L, 15.0),
        (100L, 2L, 3L, 10L, 20.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, "cust-one")).toDF("c_custkey", "c_nationkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    dir
  }

  private def counts(df: org.apache.spark.sql.DataFrame,
                     keyCol: String): Map[String, String] =
    df.select(col(keyCol), col("counts")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("mart_structure_counts: total over the dim; unmatched renders " +
       "{\"total\":0} with no per-db arm") {
    val out = TaxaMartQueries.queries("mart_structure_counts")(spark, fixtureDir)
    val byPdb = counts(out, "accession")
    assert(byPdb.keySet === Set("PDB1", "PDB2", "PDB3"),
      "every structure in the dim must get a row (left-join totality)")
    val zero = """{"domain_architectures":0,"entries":{"total":0},""" +
      """"proteomes":0,"proteins":0,"sets":0,"taxa":0}"""
    assert(byPdb("PDB2") === zero, "no matches at all")
    assert(byPdb("PDB3") === zero, "interval-overlap miss is a miss")
    assert(byPdb("PDB1") ===
      """{"domain_architectures":1,"entries":{"total":2,"cdd":1,""" +
      """"panther":1},"proteomes":1,"proteins":1,"sets":2,"taxa":1}""")
  }

  test("mart_structure_counts plan: equi interval join (no BNLJ), Expand width 5") {
    // pin the STATIC plan: AQE wraps stages in AdaptiveSparkPlanExec,
    // hiding ExpandExec from a plain collect; the shape under pin
    // (join strategy choice, Expand width) is decided at planning time
    val sess = spark.newSession()
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    val out = TaxaMartQueries.queries("mart_structure_counts")(sess, fixtureDir)
    val plan = out.queryExecution.executedPlan
    val rendered = plan.toString
    assert(!rendered.contains("BroadcastNestedLoopJoin") &&
      !rendered.contains("CartesianProduct"),
      s"interval join must plan as an equi join, got:\n$rendered")
    val expandWidths = plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.ExpandExec => e.projections.size
    }
    assert(expandWidths.nonEmpty, "expected the 5-distinct Expand")
    assert(expandWidths.max === 5,
      s"five countDistincts must expand 5x and no more, got $expandWidths")
  }

  test("proteome marts: db-sorted arms, total-first key order on the fixture") {
    val pc = counts(
      TaxaMartQueries.queries("mart_proteome_counts")(spark, fixtureDir),
      "accession")
    // all three of protein 100's matches count here (no interval
    // filter on the proteome axis); structures = distinct pdb hits
    assert(pc === Map("UPC1" ->
      ("""{"entries":{"total":3,"cdd":1,"panther":1,"pfam":1},""" +
       """"proteins":1,"structures":2}""")))
    val pe = TaxaMartQueries.queries("mart_proteome_per_entry")(spark, fixtureDir)
      .select(col("entry_acc"), col("counts")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pe === Map(
      "cdd-0" -> """{"proteins":1,"structures":1}""",
      "panther-1" -> """{"proteins":1,"structures":1}""",
      "pfam-2" -> """{"proteins":1,"structures":1}"""))
    val pdb = TaxaMartQueries.queries("mart_proteome_per_entry_db")(spark, fixtureDir)
      .select(col("source_database"), col("counts")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pdb === Map(
      "cdd" -> """{"entries":1,"proteins":1,"structures":1}""",
      "panther" -> """{"entries":1,"proteins":1,"structures":1}""",
      "pfam" -> """{"entries":1,"proteins":1,"structures":1}"""))
  }
}
