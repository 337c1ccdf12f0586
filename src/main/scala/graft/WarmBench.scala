package graft
import org.apache.spark.sql.SparkSession

/** Steady-state micro-benchmark: runs each named query N times in one
  * session and prints every run. The first run absorbs codegen/JIT and
  * broadcast machinery; later runs are the number a long-lived cluster
  * session would see — the driver's Bench measures each query exactly
  * once, so run-order JIT artifacts show up there as per-query noise
  * that this tool separates from real plan cost.
  *
  * Usage: tools/run.sh graft.WarmBench <sfDir> <query> [query ...]
  *        (SPARK_GRAFT_RUNS to change the per-query run count;
  *        SPARK_GRAFT_CONF="k=v;k=v" sets extra session confs, e.g.
  *        spark.graft.treeEntries for the group-bound scaling drill)
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extraConf = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench/Verify's input-sized shuffle width: without it the
      // perf A/B tool measures a different shuffle configuration than
      // the bench it is meant to explain at rehearsal SFs
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        SparkLocal.initialShufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    for (q <- args.drop(1); i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"$q run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same ephemeral-block sweep as Bench: without it each run's
      // localCheckpoint blocks linger until a GC lets the context
      // cleaner fire, and block-manager pressure turns repeat runs
      // into a noise generator (the exact artifact this tool exists
      // to remove)
      spark.sparkContext.getPersistentRDDs.values
        .filter(org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed)
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
