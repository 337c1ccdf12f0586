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

  test("encode-contract delta vs classic stays bounded on held-out words") {
    // The downstream number the vocab-SET probe lacks (r16 carried
    // item): train BOTH contracts to the same depth per fixture, then
    // encode a held-out word sample (same alphabet, fresh seed) with
    // each and measure how often the CLASSIC and RELAXED vocabs
    // disagree on the artifact that matters — the token sequence.
    // Disagreement is tie-bracketing only, so it is bounded, not zero;
    // the bounds pinned below sit above the observed (deterministic —
    // seeded fixtures, deterministic trainers) fixture-corpus rates
    // with headroom: measured 172/2208 words re-bracketed (7.8%),
    // 142/2208 with a different token COUNT (6.4%), count-weighted
    // token budget delta 77/9080 (0.85%) — recorded in SCALE.md r17.
    import spark.implicits._
    val rng = new scala.util.Random(43)
    val heldOut = (0 until 200).map { _ =>
      val len = 2 + rng.nextInt(11)
      (0 until len).map(_ => "abc"(rng.nextInt(3))).mkString
    }.distinct
    var totSeqDiff = 0L
    var totCntDiff = 0L
    var totWords = 0L
    var totClassicToks = 0L
    var totRelaxedToks = 0L
    fixtures.foreach { case (trial, wordMap) =>
      val counts = wordMap.toSeq.toDF("word", "n")
      val (relaxed, _) = Bpe.train(spark, counts, 40, relaxedTies = true)
      val classic = refTrain(wordMap, 40).zipWithIndex
        .map { case ((l, r, n), i) => Bpe.Merge(i, l, r, n) }
      val deltas = heldOut.map { w =>
        val ec = Bpe.encode(w, classic)
        val er = Bpe.encode(w, relaxed)
        (ec.length.toLong, er.length.toLong,
          if (ec.length != er.length) 1L else 0L,
          if (ec != er) 1L else 0L)
      }
      val seqDiff = deltas.map(_._4).sum
      totSeqDiff += seqDiff
      totCntDiff += deltas.map(_._3).sum
      totWords += heldOut.length
      totClassicToks += deltas.map(_._1).sum
      totRelaxedToks += deltas.map(_._2).sum
      assert(seqDiff <= heldOut.length / 2,
        s"trial $trial: ${seqDiff}/${heldOut.length} held-out words " +
          "re-bracketed — tie divergence should not dominate the corpus")
    }
    info(s"held-out contract delta over ${fixtures.size} fixtures: " +
      s"seq-diff $totSeqDiff/$totWords, cnt-diff $totCntDiff/$totWords, " +
      s"tokens classic=$totClassicToks relaxed=$totRelaxedToks")
    // aggregate bounds across all 12 fixtures: boundary (sequence)
    // disagreement under 1/3 of held-out encodes, token-count
    // disagreement under 15%, and the count-weighted token budget
    // within 5% — the contract delta is priced, not open-ended
    assert(totSeqDiff * 3 <= totWords,
      s"boundary disagreement $totSeqDiff/$totWords exceeds 1/3")
    assert(totCntDiff * 100 <= totWords * 15,
      s"token-count disagreement $totCntDiff/$totWords exceeds 15%")
    val budgetDelta = math.abs(totClassicToks - totRelaxedToks)
    assert(budgetDelta * 100 <= totClassicToks * 5,
      s"token budget delta $budgetDelta vs $totClassicToks exceeds 5%")
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
