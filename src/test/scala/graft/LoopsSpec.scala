package graft

import graft.ops.Loops
import org.apache.spark.sql.functions._

/** Loop-round materialization contract: mode resolution (explicit conf
  * beats the master-derived default; a local master defaults to
  * localCheckpoint) and output identity between the two modes.
  */
class LoopsSpec extends SparkSpec {

  test("local master defaults to localCheckpoint; conf flips to reliable") {
    def localCkCount: Int = spark.sparkContext.getPersistentRDDs.values
      .count(org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed)
    val df = spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))

    // default on local[4]: block-manager localCheckpoint (the mode
    // Bench/WarmBench's unpersist sweeps look for)
    spark.conf.unset(Loops.ReliableConf)
    val before = localCkCount
    val localCk = Loops.materialize(df)
    assert(localCkCount > before, "local default must localCheckpoint")

    // explicit reliable: no new locally-checkpointed block RDD, a
    // checkpoint dir appears, and the rows are identical
    spark.conf.set(Loops.ReliableConf, "true")
    try {
      val mid = localCkCount
      val reliable = Loops.materialize(df)
      assert(localCkCount === mid, "reliable mode must not localCheckpoint")
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "reliable mode must set a checkpoint dir")
      assert(reliable.count() === 1000)
      assert(reliable.exceptAll(localCk).isEmpty &&
        localCk.exceptAll(reliable).isEmpty)
    } finally spark.conf.set(Loops.ReliableConf, "false")
  }

  test("non-local master without a checkpoint dir FAILS FAST " +
      "(no silent driver-local tmp dir)") {
    // the policy is pure so the cluster branch pins without standing
    // up a cluster master: local masters get the tmp-dir convenience,
    // an existing dir always stands, and the non-local/no-dir combo —
    // the one that would scatter checkpoint blocks across node-local
    // /tmp on a real multi-host cluster — throws with the actionable
    // message instead of defaulting
    assert(Loops.needsTempCheckpointDir(isLocalMaster = true,
      hasCheckpointDir = false), "local + no dir => create tmp dir")
    assert(!Loops.needsTempCheckpointDir(isLocalMaster = true,
      hasCheckpointDir = true), "an existing dir stands")
    assert(!Loops.needsTempCheckpointDir(isLocalMaster = false,
      hasCheckpointDir = true), "cluster + configured dir stands")
    val e = intercept[IllegalStateException] {
      Loops.needsTempCheckpointDir(isLocalMaster = false,
        hasCheckpointDir = false)
    }
    assert(e.getMessage === Loops.MissingCheckpointDirMsg)
    assert(e.getMessage.contains("setCheckpointDir") &&
      e.getMessage.contains("cleanCheckpoints"),
      "the error must tell the operator exactly what to configure")
  }

  test("an iterative loop is bit-identical across modes") {
    import org.apache.spark.sql.DataFrame
    def loop(): DataFrame = {
      var cur = spark.range(0, 500)
        .select(col("id").as("node"), (col("id") % 13).as("label"))
      for (_ <- 1 to 3)
        cur = Loops.materialize(cur.groupBy(col("label"))
          .agg(count(lit(1)).as("n"), sum(col("node")).as("s"))
          .select(col("label").as("node"), (col("label") % 5).as("label"),
            col("n"), col("s"))
          .groupBy(col("node"), col("label"))
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
          .select(col("node"), col("label")))
      cur
    }
    spark.conf.set(Loops.ReliableConf, "false")
    val a = loop().collect().map(_.toString).sorted
    spark.conf.set(Loops.ReliableConf, "true")
    val b = try loop().collect().map(_.toString).sorted
            finally spark.conf.set(Loops.ReliableConf, "false")
    assert(a.sameElements(b))
  }
}
