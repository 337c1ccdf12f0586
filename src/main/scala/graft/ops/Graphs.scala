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
}
