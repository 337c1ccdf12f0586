package graft

import graft.ops.Loops.LoopOps

/** A/B harness for the batched BPE trainer (r13 carried item): trains
  * `rounds` merges over `sfDir`'s documents at a given `batchM` and
  * prints one JSON line with pass count, scheduler job count, and wall
  * seconds — run with batchM=1 (classic one-merge-per-pass) vs the
  * default 256 to quantify the scheduler-round-trip saving. The merge
  * sequences are bit-identical by construction (BpeSpec proves it);
  * this tool only measures.
  *
  * Usage: BpeBench <sfDir> [rounds=1000] [batchM=256] [relaxed=false]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf3v")
    val rounds = args.lift(1).map(_.toInt).getOrElse(1000)
    val batchM = args.lift(2).map(_.toInt).getOrElse(256)
    val relaxed = args.lift(3).exists(_.toBoolean)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      // the job counter below reads the status tracker, which retains
      // only spark.ui.retainedJobs entries (default 1000) — a
      // sequential 1000-merge run exceeds it and under-reports
      .config("spark.ui.retainedJobs", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = graft.ops.Bpe.wordCounts(Tables.documents(spark, sfDir), "text")
      .loopCheckpoint()
    val vocab = counts.count()
    val jobs0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val (merges, _) = graft.ops.Bpe.train(spark, counts, rounds, batchM,
      relaxedTies = relaxed)
    val sec = math.round((System.nanoTime() - t0) / 1e6) / 1e3
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
    // block-manager flatness evidence: train unpersists each pass's
    // checkpoint before the next, so the live RDD count must be O(1)
    // (the counts frame + the final segmentation), never O(passes)
    val liveRdds = spark.sparkContext.getPersistentRDDs.size
    println(s"""{"tool":"bpe_bench","sf":"$sfDir","vocab":$vocab,""" +
      s""""rounds":${merges.length},"batchM":$batchM,"relaxed":$relaxed,""" +
      s""""jobs":$jobs,"live_rdds":$liveRdds,"sec":$sec}""")
    spark.stop()
  }
}
