package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tree/graph helpers. The reference materializes taxonomy lineage
  * arrays once by parent-pointer chasing (interpro/oracle/taxa.py:38-53)
  * and every rollup then explodes them (SURVEY.md §4.3). Here the
  * closure is an iterative self-join — O(depth) shuffles on the small
  * dimension, cached, with every iteration persisted so plan lineage
  * stays bounded.
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
    var prev: DataFrame = null
    var depth = 0
    var remaining = 1L
    while (remaining > 0 && depth < maxDepth) {
      cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
      remaining = cur.filter(col("__cursor").isNotNull).count()
      // cur is materialized now; the previous iteration's cache (its
      // only parent) can go — otherwise each invocation leaks
      // depth+1 cached RDDs for the session's lifetime
      if (prev != null) prev.unpersist(blocking = false)
      prev = cur
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
    // the final frame stays cached (it backs the returned result); the
    // edges cache is no longer needed once the loop has materialized it
    edges.unpersist(blocking = false)
    cur.select(col("__id").as(idCol), col("lineage"))
  }

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round joins labels across (undirected)
    * edges and keeps the minimum; stops at fixpoint. O(diameter)
    * shuffles, all keyed — the standard large-scale formulation (a
    * large-star/small-star variant would cut rounds further; diameter
    * here is tiny). Returns (node, component) with component = the
    * minimum node id reachable.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 32): DataFrame = {
    val sym = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("__a").as("__n")).distinct()
      .withColumn("__l", col("__n"))
    var prev: DataFrame = null
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels, sym("__b") === labels("__n"))
        .groupBy(col("__a")).agg(min(col("__l")).as("__nl"))
      val next = labels.join(nbrMin, labels("__n") === nbrMin("__a"), "left_outer")
        .select(col("__n"),
          least(col("__l"), coalesce(col("__nl"), col("__l"))).as("__l"),
          col("__l").as("__old"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("__l") =!= col("__old")).count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = next
      labels = next.select(col("__n"), col("__l"))
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels.select(col("__n").as("node"), col("__l").as("component"))
  }
}
