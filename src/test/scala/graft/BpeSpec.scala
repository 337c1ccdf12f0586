package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** Differential gate for the distributed BPE trainer: the learned
  * merge sequence and final segmentations must equal a plain
  * single-machine implementation of the classic algorithm (same
  * count-desc / pair-asc argmax), and greedy encode with the learned
  * merges must reproduce the trainer's own segmentation for every
  * word — the invariant an exported tokenizer relies on.
  */
class BpeSpec extends SparkSpec {

  private def mergePair(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  private def refTrain(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var segs: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> (w.map(_.toString) :+ Bpe.Eow) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < rounds) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, syms) <- segs; Seq(a, b) <- syms.sliding(2))
        pc((a, b)) += words(w)
      if (pc.isEmpty) round = rounds
      else {
        val ((l, r), n) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r, n))
        segs = segs.map { case (w, s) => w -> mergePair(s, l, r) }
        round += 1
      }
    }
    (merges.toSeq, segs)
  }

  test("differential: distributed trainer equals the classic algorithm") {
    val docs = Tables.documents(spark, sf)
    val counts = Bpe.wordCounts(docs, "text")
    val wordMap = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rounds = 12
    val (merges, segs) = Bpe.train(spark, counts, rounds)
    val (refMerges, refSegs) = refTrain(wordMap, rounds)
    assert(merges.map(m => (m.left, m.right, m.n)) === refMerges)
    val got = segs.collect().map(ws => ws.word -> ws.syms).toMap
    assert(got === refSegs)
  }

  test("batched merge sequence equals the one-merge-per-pass loop") {
    val counts = Bpe.wordCounts(Tables.documents(spark, sf), "text")
    val rounds = 40
    val (seqSeq, _) = Bpe.train(spark, counts, rounds, batchM = 1)
    val (seqBat, segsBat) = Bpe.train(spark, counts, rounds, batchM = 256)
    assert(seqBat.map(m => (m.rank, m.left, m.right, m.n)) ===
      seqSeq.map(m => (m.rank, m.left, m.right, m.n)))
    // and the batch-applied segmentations equal the sequential ones
    val wordMap = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, refSegs) = refTrain(wordMap, rounds)
    assert(segsBat.collect().map(ws => ws.word -> ws.syms).toMap === refSegs)
  }

  test("batched equals sequential on collision-rich tiny-alphabet vocabs") {
    // Stress for the cumulative batch ceiling: words over {a,b,c} are
    // dense in string collisions ('abc' reachable as ab+c and a+bc
    // while a,bc adjacencies survive), the shape where one pair can
    // gain under TWO batch members and a max-of-contributions bound
    // over-batches. Deterministic PRNG; 20 vocabs x 30 merges, each
    // checked against the classic single-machine loop.
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val alpha = "abc"
    (0 until 20).foreach { trial =>
      val words = (0 until 40).map { _ =>
        val len = 2 + rng.nextInt(9)
        (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      }.distinct
      val wordMap = words.map(w => w -> (1L + rng.nextInt(5))).toMap
      val counts = wordMap.toSeq.toDF("word", "n")
      val rounds = 30
      val (got, _) = Bpe.train(spark, counts, rounds)
      val (want, _) = refTrain(wordMap, rounds)
      assert(got.map(m => (m.left, m.right, m.n)) === want,
        s"batched trainer diverged from classic BPE on trial $trial")
    }
  }

  test("encodeCorpus equals the per-word encode summed over each document") {
    val docs = Tables.documents(spark, sf).limit(50)
    val counts = Bpe.wordCounts(Tables.documents(spark, sf), "text")
    val (merges, _) = Bpe.train(spark, counts, 8)
    val got = Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val words = r.getString(1).split(' ').filter(_.nonEmpty)
      val want = (words.length.toLong,
        words.map(w => Bpe.encode(w, merges).length.toLong).sum)
      assert(got(r.getLong(0)) === want)
    }
  }

  test("greedy encode reproduces the trainer's segmentation per word") {
    val counts = Bpe.wordCounts(Tables.documents(spark, sf), "text")
    val (merges, segs) = Bpe.train(spark, counts, 8)
    segs.collect().foreach { ws =>
      assert(Bpe.encode(ws.word, merges) === ws.syms,
        s"encode diverged on '${ws.word}'")
    }
  }
}
