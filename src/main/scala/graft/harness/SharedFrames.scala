package graft.harness

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Cross-query cached frames. The driver's Verify/Bench mains run
  * query builders back to back in one session with no per-query
  * teardown hook, so several expensive intermediates (dedup shingle
  * sets, the taxonomy lineage closure) would otherwise be recomputed
  * by every query in their family. The cache is keyed by (session, sf
  * dir, frame name); entries of stopped sessions are evicted on
  * access. MEMORY_AND_DISK so eviction degrades to recompute-from-disk
  * rather than OOM at larger corpora.
  */
object SharedFrames {
  private val frameCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Unpersist and forget every frame cached under `s`'s context (any
    * sf dir). Bench/Verify call this between query families: a frame
    * kept persisted after its family finished is pure GC pressure on
    * every later query — the r8 bench artifact was dominated by it
    * (kernel_match_merge 9.9 s solo, 90 s when run after the dedup
    * family in the same JVM). A cross-family frame (taxa lineage) just
    * rebuilds once for its next family — bounded, and honest per-family
    * attribution beats a once-per-JVM build landing on whichever query
    * happens to run first.
    */
  def release(s: SparkSession): Unit =
    frameCache.filterInPlace { case ((sess, _, _), df) =>
      val keep = sess.sparkContext != s.sparkContext
      if (!keep && !sess.sparkContext.isStopped) df.unpersist(blocking = false)
      keep
    }

  /** Run independent frame-build chains concurrently on a small
    * driver-side pool (optimization guide §2.6 — overlap independent
    * jobs): each chain is a sequence of small stages that leaves most
    * of local[N] idle, and the FIFO scheduler backfills one chain's
    * stage tails with the others' tasks. Callers must ensure the
    * chains touch DISTINCT cache keys (shared roots built before the
    * fan-out): `cachedFrame`'s TrieMap is thread-safe, but two threads
    * racing the same key would each run the build job once.
    */
  def buildConcurrently(chains: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(chains.size)
    try {
      implicit val ec: scala.concurrent.ExecutionContextExecutorService =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      Await.result(scala.concurrent.Future.sequence(
        chains.map(c => Future(c()))), Duration.Inf)
      ()
    } finally pool.shutdown()
  }

  def cachedFrame(s: SparkSession, d: String, key: String)
                 (build: => DataFrame): DataFrame = {
    frameCache.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
    frameCache.getOrElseUpdate((s, d, key), {
      // materialize EAGERLY and fully: several builders (lineage
      // closure, connected components) are backed by localCheckpointed
      // loop RDDs that Bench sweeps between queries — a lazily-persisted
      // frame whose first consumer fails mid-materialization, or whose
      // partitions later need recompute, would chase destroyed
      // checkpoint blocks. After count() every partition is
      // memory/disk-backed and the truncated lineage is never re-walked.
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })
  }

  /** The synthetic taxonomy dimension every lineage/tree query walks:
    * region(domain) → nation(phylum) → customer(genus|species), ids
    * prefixed R/N/C (the harness analogue of the reference's taxa
    * table, interpro/oracle/taxa.py:15-60).
    */
  def taxaDims(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(
        concat(lit("R"), col("r_regionkey").cast("string")).as("id"),
        lit(null).cast("string").as("parent"),
        lit("domain").as("rank"), col("r_name").as("name"))
      .unionByName(Tables.nation(s, d).select(
        concat(lit("N"), col("n_nationkey").cast("string")).as("id"),
        concat(lit("R"), col("n_regionkey").cast("string")).as("parent"),
        lit("phylum").as("rank"), col("n_name").as("name")))
      .unionByName(Tables.customer(s, d).select(
        concat(lit("C"), col("c_custkey").cast("string")).as("id"),
        concat(lit("N"), col("c_nationkey").cast("string")).as("parent"),
        when(col("c_custkey") % 3 === 0, "genus").otherwise("species")
          .as("rank"),
        col("c_name").as("name")))

  /** Root→self lineage closure (id, lineage) over [[taxaDims]],
    * computed once per (session, sf) and shared by `lineage_closure`,
    * `agg_tree_ranks`, and any other tree consumer — the closure is
    * an O(depth)-shuffle iterative loop, the single most expensive
    * piece those queries would otherwise each re-run.
    */
  def taxaLineage(s: SparkSession, d: String): DataFrame =
    cachedFrame(s, d, "taxa_lineage") {
      graft.ops.Graphs.lineageClosure(
        taxaDims(s, d).select(col("id"), col("parent")), "id", "parent")
    }
}
