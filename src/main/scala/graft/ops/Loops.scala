package graft.ops

import org.apache.spark.sql.Dataset

/** Loop-round materialization — the one primitive every iterative
  * operator here (PageRank/BFS/label-prop/k-core rounds, BPE passes,
  * taxonomy folds, connected-components doubling) needs: truncate the
  * Catalyst lineage so plans stay flat across rounds, and pin the
  * round's result so later rounds stop recomputing it.
  *
  * Local/default mode uses `localCheckpoint`: block-manager blocks,
  * zero filesystem traffic — the right call in a single JVM and on
  * healthy clusters. But localCheckpoint blocks LIVE ON THEIR
  * EXECUTOR and are not recomputable: measured on the multi-process
  * mini-cluster, killing one executor between rounds fails the next
  * consume with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  * (ExecutorLossDrill's loop drill). On a preemptible/autoscaled
  * cluster set `spark.graft.reliableLoops=true` (plus a durable
  * `sparkContext.setCheckpointDir`, e.g. HDFS/S3, and
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
  * dereferenced rounds are deleted): rounds then write reliable
  * checkpoints that survive any executor loss — same lineage
  * truncation, same loop structure, storage traffic instead of
  * fragility. The drill proves the same loop that DIES under
  * executor loss in default mode converges bit-identically in
  * reliable mode.
  */
object Loops {
  val ReliableConf = "spark.graft.reliableLoops"

  /** Unset, the conf defaults to the master's nature: a single-JVM
    * local master keeps localCheckpoint (fast, and its one executor
    * cannot "lose" blocks without losing the app), while ANY real
    * cluster master defaults to reliable — a library user deploying
    * on an autoscaled cluster gets survivable loops without reading
    * this file; the drills set the conf explicitly to measure each
    * mode.
    */
  def materialize[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val ss = ds.sparkSession
    val reliable = ss.conf.getOption(ReliableConf)
      .map(_.toBoolean).getOrElse(!ss.sparkContext.isLocal)
    if (reliable) {
      if (ss.sparkContext.getCheckpointDir.isEmpty)
        ss.sparkContext.setCheckpointDir(java.nio.file.Files
          .createTempDirectory("graft-reliable-ckpt").toString)
      ds.checkpoint(eager)
    } else ds.localCheckpoint(eager)
  }

  /** Chain syntax for the loop sites: `frame.loopCheckpoint()`. */
  implicit class LoopOps[T](private val ds: Dataset[T]) extends AnyVal {
    def loopCheckpoint(eager: Boolean = true): Dataset[T] =
      materialize(ds, eager)
  }
}
