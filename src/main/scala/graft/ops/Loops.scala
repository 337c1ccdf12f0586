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

  /** The fail-fast text for reliable mode on a non-local master with
    * no checkpoint dir (a `val` so LoopsSpec pins it verbatim).
    */
  val MissingCheckpointDirMsg: String =
    "graft reliable loops: the master is non-local and no checkpoint " +
      "dir is set. Reliable checkpoints must land on storage EVERY " +
      "executor can read back after a node loss — call " +
      "sparkContext.setCheckpointDir(<durable shared path, e.g. " +
      "HDFS/S3>) before the first loop (and set " +
      "spark.cleaner.referenceTracking.cleanCheckpoints=true at " +
      "session build so superseded rounds are deleted). A driver-" +
      "local temp dir is auto-created only on local masters, where " +
      "one machine owns every block; silently doing that on a " +
      "cluster would checkpoint to each node's private /tmp and " +
      "corrupt the very recovery this mode exists to provide."

  /** Pure checkpoint-dir policy, factored out so the non-local branch
    * is unit-testable without standing up a cluster master: returns
    * true when a driver-local temp dir should be created (local
    * master, no dir), false when the existing dir stands, and THROWS
    * for the one configuration that silently corrupts recovery —
    * reliable mode on a non-local master with no checkpoint dir set.
    * On a multi-HOST cluster a driver-created `file:/tmp/...` path
    * makes every executor checkpoint to its own node-local disk;
    * later rounds reading remote partitions fail (or worse, read
    * stale local files), and Spark itself only logs a warning. The
    * single-machine mini-cluster drills can never surface that —
    * every process shares one filesystem — so the policy refuses
    * instead of defaulting.
    */
  def needsTempCheckpointDir(isLocalMaster: Boolean,
                             hasCheckpointDir: Boolean): Boolean =
    if (hasCheckpointDir) false
    else if (isLocalMaster) true
    else throw new IllegalStateException(MissingCheckpointDirMsg)

  /** Unset, the conf defaults to the master's nature: a single-JVM
    * local master keeps localCheckpoint (fast, and its one executor
    * cannot "lose" blocks without losing the app), while ANY real
    * cluster master defaults to reliable — a library user deploying
    * on an autoscaled cluster gets survivable loops without reading
    * this file; the drills set the conf explicitly to measure each
    * mode. On a non-local master reliable mode REQUIRES a durable
    * shared checkpoint dir and fails fast when none is set (see
    * [[needsTempCheckpointDir]]); local masters keep the temp-dir
    * convenience.
    */
  def materialize[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] = {
    val ss = ds.sparkSession
    val reliable = ss.conf.getOption(ReliableConf)
      .map(_.toBoolean).getOrElse(!ss.sparkContext.isLocal)
    if (reliable) {
      if (needsTempCheckpointDir(ss.sparkContext.isLocal,
          ss.sparkContext.getCheckpointDir.nonEmpty))
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
