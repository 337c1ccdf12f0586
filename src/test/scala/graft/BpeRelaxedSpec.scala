package graft

import graft.ops.Bpe

/** Differential gate for the OPT-IN relaxed-tie BPE mode
  * (`train(..., relaxedTies = true)`): deep merge tiers serialize
  * under the default bit-identity contract (ties across thousands of
  * candidates + the conflict/ceiling rules → ~1–2 merges/pass, r15
  * 32k rehearsal), and every mainstream tokenizer already treats tie
  * order as arbitrary. The relaxed mode batches whole tie plateaus;
  * this spec proves the two properties that make that sound:
  *
  *  1. PER-MERGE MAX-COUNT VALIDITY — replaying the learned sequence
  *     through a naive single-machine simulator, every merge's
  *     recorded count equals its live pair count at its turn AND no
  *     pair's live count strictly exceeds it. That is exactly the
  *     greedy-BPE invariant under an arbitrary tie-break: there exists
  *     a tie order realizing the sequence.
  *  2. TIE-CONFINED DIVERGENCE — in lockstep with the classic loop,
  *     the relaxed sequence is bit-identical until the first turn
  *     where the live maximum is achieved by more than one pair, and
  *     at the divergence turn the classic simulator confirms a
  *     genuine tie. Nothing stronger is a theorem: different tie
  *     resolutions re-bracket clusters (abcbcba built as (abcbc|ba)+
  *     (abcbcba|bba</w>) vs (ba|bba</w>)+(abcbc|babba</w>)) and can
  *     even change the total merge count to exhaustion (probed:
  *     4 of 6 seeded fixtures learn the exact same vocab SET at
  *     exhaustion, one differs by re-bracketed entries at tied counts,
  *     one by merge count 83 vs 85) — the same property mainstream
  *     tokenizers have across versions, which is why property 1 is
  *     the contract worth gating.
  *
  * The default mode's bit-identity is pinned separately by BpeSpec and
  * is untouched by the flag.
  */
class BpeRelaxedSpec extends SparkSpec {

  private def mergePair(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Classic single-machine loop: (count desc, pair asc) argmax. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(String, String, Long)] = {
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
    merges.toSeq
  }

  /** Replays `merges` one at a time against naive live pair counts,
    * asserting the greedy invariant at every turn.
    */
  private def assertMaxCountValid(words: Map[String, Long],
                                  merges: Seq[Bpe.Merge],
                                  tag: String): Unit = {
    var segs: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> (w.map(_.toString) :+ Bpe.Eow) }
    merges.sortBy(_.rank).foreach { m =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, syms) <- segs; Seq(a, b) <- syms.sliding(2))
        pc((a, b)) += words(w)
      val live = pc((m.left, m.right))
      assert(live === m.n,
        s"$tag: merge ${m.rank} (${m.left},${m.right}) recorded n=${m.n} " +
          s"but live count is $live")
      val maxLive = pc.values.max
      assert(maxLive <= m.n,
        s"$tag: merge ${m.rank} (${m.left},${m.right}) applied at n=${m.n} " +
          s"while some pair had live count $maxLive")
      segs = segs.map { case (w, s) => w -> mergePair(s, m.left, m.right) }
    }
  }

  private def fixtures: Seq[(Int, Map[String, Long])] = {
    val rng = new scala.util.Random(42)
    val alpha = "abc"
    (0 until 12).map { trial =>
      val words = (0 until 40).map { _ =>
        val len = 2 + rng.nextInt(9)
        (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      }.distinct
      trial -> words.map(w => w -> (1L + rng.nextInt(5))).toMap
    }
  }

  test("relaxed merges are each max-count-valid at their turn") {
    import spark.implicits._
    fixtures.foreach { case (trial, wordMap) =>
      val counts = wordMap.toSeq.toDF("word", "n")
      val (merges, _) =
        Bpe.train(spark, counts, rounds = 40, relaxedTies = true)
      assertMaxCountValid(wordMap, merges, s"trial $trial")
    }
  }

  test("relaxed merges are max-count-valid on real word counts") {
    val counts = Bpe.wordCounts(Tables.documents(spark, sf), "text")
    val wordMap = counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (merges, _) = Bpe.train(spark, counts, 60, relaxedTies = true)
    assertMaxCountValid(wordMap, merges, "sf0.001 documents")
  }

  test("relaxed equals classic until the first tie, then diverges only on a tie") {
    import spark.implicits._
    fixtures.foreach { case (trial, wordMap) =>
      val counts = wordMap.toSeq.toDF("word", "n")
      val (relaxed, _) =
        Bpe.train(spark, counts, 40, relaxedTies = true)
      val classic = refTrain(wordMap, 40)
      // walk both sequences in lockstep over the naive simulator
      var segs: Map[String, Seq[String]] =
        wordMap.map { case (w, _) => w -> (w.map(_.toString) :+ Bpe.Eow) }
      var i = 0
      var diverged = false
      while (i < math.min(relaxed.length, classic.length) && !diverged) {
        val rm = (relaxed(i).left, relaxed(i).right)
        val cm = (classic(i)._1, classic(i)._2)
        if (rm == cm) {
          segs = segs.map { case (w, s) => w -> mergePair(s, rm._1, rm._2) }
          i += 1
        } else diverged = true
      }
      if (diverged) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        for ((w, syms) <- segs; Seq(a, b) <- syms.sliding(2))
          pc((a, b)) += wordMap(w)
        val mx = pc.values.max
        val argmax = pc.filter(_._2 == mx)
        assert(argmax.size >= 2,
          s"trial $trial: sequences diverged at turn $i without a tie " +
            s"(max $mx achieved by ${argmax.keys})")
        assert(relaxed(i).n === mx && classic(i)._3 === mx,
          s"trial $trial: divergent turn $i not at the live maximum")
      }
    }
  }

  test("relaxed greedy encode reproduces the trainer's segmentations") {
    val counts = Bpe.wordCounts(Tables.documents(spark, sf), "text")
    val (merges, segs) = Bpe.train(spark, counts, 30, relaxedTies = true)
    segs.collect().foreach { ws =>
      assert(Bpe.encode(ws.word, merges) === ws.syms,
        s"encode diverged on '${ws.word}'")
    }
  }
}
