package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ops.Loops.LoopOps

/** Tree/graph helpers. The reference materializes taxonomy lineage
  * arrays once by parent-pointer chasing (interpro/oracle/taxa.py:38-53)
  * and every rollup then explodes them (SURVEY.md §4.3). Here the
  * closure is an iterative self-join — O(depth) shuffles on the small
  * dimension, with every iteration locally checkpointed so both plan
  * lineage and Catalyst planning time stay bounded.
  */
object Graphs {

  /** Compute root→self lineage arrays from (id, parent) rows. Parent
    * NULL marks roots. Iterates to the tree height (taxonomies are
    * ~40 deep); `maxDepth` guards cycles.
    */
  def lineageClosure(nodes: DataFrame, idCol: String, parentCol: String,
                     maxDepth: Int = 64): DataFrame = {
    val edges = nodes.select(col(idCol).as("__id"), col(parentCol).as("__p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = edges.select(col("__id"), array(col("__id")).as("lineage"),
      col("__p").as("__cursor"))
    var depth = 0
    var remaining = 1L
    while (remaining > 0 && depth < maxDepth) {
      // localCheckpoint, not persist: truncates the logical plan so
      // Catalyst does not re-optimize a lineage that grows by one join
      // per level (quadratic planning time); blocks of superseded
      // levels are reclaimed by the context cleaner once unreferenced
      cur = cur.loopCheckpoint(eager = false) // materialized by the count
      remaining = cur.filter(col("__cursor").isNotNull).count()
      if (remaining > 0) {
        val up = edges.select(col("__id").as("__pid"), col("__p").as("__pp"))
        cur = cur.join(up, cur("__cursor") === col("__pid"), "left_outer")
          .select(col("__id"),
            when(col("__cursor").isNotNull,
              concat(array(col("__cursor")), col("lineage")))
              .otherwise(col("lineage")).as("lineage"),
            when(col("__cursor").isNotNull, col("__pp")).otherwise(lit(null))
              .as("__cursor"))
        depth += 1
      }
    }
    // the final frame stays checkpointed (it backs the returned
    // result); the edges cache is done once the loop has materialized
    edges.unpersist(blocking = false)
    if (remaining > 0)
      throw new IllegalStateException(
        s"lineageClosure did not reach the roots after $maxDepth levels " +
          s"($remaining cursors still open) — deeper tree than maxDepth, " +
          "or a parent-pointer cycle")
    cur.select(col("__id").as(idCol), col("lineage"))
  }

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round joins labels across (undirected)
    * edges and keeps the minimum; stops at fixpoint. All shuffles are
    * keyed, no driver-side union-find; pointer jumping engages for
    * deep graphs so rounds stay O(log diameter). Returns
    * (node, component) with component = the minimum reachable node id.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 32): DataFrame = {
    // persist the projected input first: the symmetric union consumes
    // it twice, and the caller's edge pipeline (e.g. the dedup
    // verification join) can be far more expensive than the CC loop
    val e0 = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e0Count = e0.count() // populate BEFORE the union: its two
               // branches otherwise race the cache within one job and
               // compute the (often expensive) upstream edge pipeline
               // twice
    val sym = e0
      .unionByName(e0.select(col("__b").as("__a"), col("__a").as("__b")))
      .distinct()
    // size the loop's shuffles to the MATERIALIZED edge count (~2M
    // edges per partition): the fixpoint loop runs O(diameter)
    // two-shuffle iterations, and running each over the session-wide
    // partition count burns a fixed per-task cost per iteration when
    // the verified edge set is far smaller than the input that
    // produced it (cached plans don't get AQE's coalescing). The
    // narrowing is scoped to THIS loop's frames via explicit
    // repartition-by-key — never by mutating the session-global
    // spark.sql.shuffle.partitions, which would leak the reduced
    // width into concurrent queries on a shared session
    val spark = edges.sparkSession
    // 2·|directed| bounds the symmetric edge count from above, which
    // is all the partition sizing needs — sizing from the exact
    // distinct count would cost one extra materializing action
    val sessionParts = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    val loopParts = math.max(1L,
      math.min(sessionParts.toLong, 2L * e0Count / 2000000L + 1)).toInt
    // pre-partition the edge frame once on the probe key: every
    // iteration's sym⋈labels then needs no exchange on either side
    // (labels stays hash(__n, loopParts) across the loop)
    val symB = sym.repartition(loopParts, col("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val symCount = symB.count()
    // localCheckpoint (not persist) per iteration: a persisted frame
    // keeps its FULL logical plan, so iteration i re-optimizes a plan
    // embedding all i-1 predecessors plus the (often large) edge
    // pipeline — Catalyst time grows quadratically and dominates the
    // loop. Checkpointing truncates lineage to an RDD scan; freed
    // blocks are reclaimed by the context cleaner once unreferenced.
    var labels = symB.select(col("__a").as("__n")).distinct()
      .withColumn("__l", col("__n"))
      .repartition(loopParts, col("__n"))
      .loopCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // the min-label exchange is pinned to loopParts explicitly; the
      // following groupBy reuses that clustering (no second exchange)
      val nbrMin = symB.join(labels, symB("__b") === labels("__n"))
        .select(col("__a"), col("__l"))
        .repartition(loopParts, col("__a"))
        .groupBy(col("__a")).agg(min(col("__l")).as("__nl"))
      val stepped = labels.join(nbrMin, labels("__n") === nbrMin("__a"), "left_outer")
        .select(col("__n"),
          least(col("__l"), coalesce(col("__nl"), col("__l"))).as("__l"),
          col("__l").as("__old"))
      // pointer jump (path halving) for DEEP graphs only: follow the
      // new label one more hop, shrinking label chains geometrically
      // — O(log diameter) rounds. Engaged adaptively after a few
      // plain rounds: typical dedup clusters converge in 2-3 rounds
      // where the extra self-join would just double the work, while
      // a chain-shaped graph keeps converging long after round 3.
      // Every label IS a node id, so the inner self-join is total.
      val next = (if (iter < 3) stepped
        else stepped.repartition(loopParts, col("__l"))
          .join(stepped.select(col("__n").as("__jn"), col("__l").as("__jl")),
            col("__l") === col("__jn"))
          .select(col("__n"), least(col("__l"), col("__jl")).as("__l"),
            col("__old"))
        ).loopCheckpoint(eager = false) // materialized by the count
      changed = next.filter(col("__l") =!= col("__old")).count()
      // restore hash(__n, loopParts) so the next iteration's joins
      // align exchange-free regardless of which branch produced `next`
      labels = next.select(col("__n"), col("__l"))
        .repartition(loopParts, col("__n"))
      iter += 1
    }
    e0.unpersist(blocking = false)
    symB.unpersist(blocking = false)
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"connectedComponents: $symCount directed edges, " +
        s"converged=${changed == 0} after $iter iterations")
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still changing) — raise maxIter for graphs of " +
          "larger diameter")
    labels.select(col("__n").as("node"), col("__l").as("component"))
  }
}
