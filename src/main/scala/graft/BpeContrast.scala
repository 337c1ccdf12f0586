package graft

import graft.ops.Bpe
import graft.ops.Loops.LoopOps
import org.apache.spark.sql.functions._

/** Downstream-contract delta between the classic (bit-identity) and
  * relaxed-tie BPE trainers (r16 carried item): the 6-fixture vocab-
  * SET probe says the two contracts can learn different vocabs at tied
  * counts — this tool prices what that means for the artifact a
  * tokenizer actually ships, the ENCODING of unseen text.
  *
  * Protocol: split the corpus by a doc-id hash — TRAIN on ~95%, hold
  * out the rest — train both vocabs to the same merge count on the
  * train split, then encode the held-out slice's words with each and
  * report (a) count-weighted total subtoken counts (the token-budget
  * delta a pretraining run would see), (b) the fraction of distinct
  * held-out words whose token COUNT differs, and (c) the fraction
  * whose token SEQUENCE differs at all (boundary disagreement — the
  * superset of b: same count, different bracketing counts here too).
  * Both encodes run distributed over the distinct-word frame with the
  * merge tables broadcast; rates ship as exact integer ppm
  * (occurrence-weighted rates additionally, since rare words dominate
  * the distinct census but not the token stream).
  *
  * Usage: BpeContrast <sfDir> [rounds=4000] [batchM=4096]
  */
object BpeContrast {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf3v")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4000)
    val batchM = args.lift(2).map(_.toInt).getOrElse(4096)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.retainedJobs", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir)
      .withColumn("__hv", pmod(hash(col("doc_id"), lit("bpeheld")), lit(100)))
    val trainDocs = docs.filter(col("__hv") >= 5)
    val heldDocs = docs.filter(col("__hv") < 5)

    val counts = Bpe.wordCounts(trainDocs, "text").loopCheckpoint()
    def trainOne(relaxed: Boolean): (Seq[Bpe.Merge], Double) = {
      val t0 = System.nanoTime()
      val (m, segs) = Bpe.train(spark, counts, rounds, batchM,
        relaxedTies = relaxed)
      segs.unpersist()
      (m, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
    }
    val (classic, classicSec) = trainOne(relaxed = false)
    val (relaxed, relaxedSec) = trainOne(relaxed = true)

    // distinct held-out words with occurrence counts; encode each word
    // under both vocabs inside one partition pass (merge tables are a
    // few-thousand-entry broadcast, the word frame is the scaled side)
    val held = Bpe.wordCounts(heldDocs, "text")
    val bc = spark.sparkContext.broadcast((classic, relaxed))
    val per = held.as[(String, Long)].mapPartitions { it =>
      val (cm, rm) = bc.value
      it.map { case (w, n) =>
        val ec = Bpe.encode(w, cm)
        val er = Bpe.encode(w, rm)
        (n, ec.length.toLong, er.length.toLong,
          if (ec.length != er.length) 1L else 0L,
          if (ec != er) 1L else 0L)
      }
    }.toDF("n", "tc", "tr", "cnt_diff", "seq_diff")
    val agg = per.agg(
      count(lit(1)).as("n_words"),
      sum(col("n")).as("n_occ"),
      sum(col("tc") * col("n")).as("tok_classic"),
      sum(col("tr") * col("n")).as("tok_relaxed"),
      sum(col("cnt_diff")).as("w_cnt_diff"),
      sum(col("seq_diff")).as("w_seq_diff"),
      sum(col("cnt_diff") * col("n")).as("occ_cnt_diff"),
      sum(col("seq_diff") * col("n")).as("occ_seq_diff")).head()
    def l(i: Int) = agg.getLong(i)
    val (nw, no) = (l(0), l(1))
    println(s"""{"tool":"bpe_contrast","sf":"$sfDir","rounds":$rounds,""" +
      s""""batchM":$batchM,"train_words":${counts.count()},""" +
      s""""classic_sec":$classicSec,"relaxed_sec":$relaxedSec,""" +
      s""""held_words":$nw,"held_occ":$no,""" +
      s""""tok_classic":${l(2)},"tok_relaxed":${l(3)},""" +
      s""""word_tokcount_diff_ppm":${if (nw == 0) 0 else l(4) * 1000000 / nw},""" +
      s""""word_boundary_diff_ppm":${if (nw == 0) 0 else l(5) * 1000000 / nw},""" +
      s""""occ_tokcount_diff_ppm":${if (no == 0) 0 else l(6) * 1000000 / no},""" +
      s""""occ_boundary_diff_ppm":${if (no == 0) 0 else l(7) * 1000000 / no}}""")
    spark.stop()
  }
}
