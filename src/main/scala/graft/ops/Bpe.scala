package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Loops.LoopOps

/** Corpus-scale BPE tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the learning half next to `text_bpe_tokens`'s
  * fixed pre-tokenizer. The classic algorithm never needs the corpus
  * inside its merge loop: it operates on the UNIQUE-WORD frequency
  * table, so the only corpus-scaled stage here is one word-count
  * groupBy; every merge round then runs on the vocabulary-sized frame
  * (pair-count aggregate + per-word re-segmentation), which at 100 TB
  * is millions of rows, not the corpus. Determinism: the best pair is
  * argmax by (count desc, pair lexicographic asc) — a total order, so
  * the learned merge sequence is a pure function of the corpus.
  */
object Bpe {

  /** End-of-word marker appended as its own symbol (the standard
    * trick letting merges distinguish word-final from word-internal
    * contexts).
    */
  val Eow = "</w>"

  case class WordSeg(word: String, n: Long, syms: Seq[String])
  case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Count unique words — THE corpus-scaled stage (one shuffle with
    * map-side combine). `docs` must expose a whitespace-tokenizable
    * `textCol`.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  private def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Longest batchable prefix of a descending (count desc, pair asc)
    * candidate list — the merges the SEQUENTIAL algorithm would pick
    * in exactly this order, provable from one census.
    *
    * Applying merge (a,b)→ab can change pair counts in only three
    * directional ways (greedy left-to-right apply, per occurrence):
    *  - SHRINK pairs (x,a): an "x a b" site loses its "x a";
    *  - SHRINK pairs (b,y): an "a b y" site loses its "b y";
    *  - GROW pairs involving the STRING ab (when "ab" already exists
    *    as a symbol, its (x,ab)/(ab,y) adjacencies gain the created
    *    occurrences; when it doesn't, the created pairs are new).
    * A candidate (l,r) is therefore count-INVARIANT under all earlier
    * selections iff r is no selected left symbol, l is no selected
    * right symbol, and neither l nor r equals a selected merged
    * string — sharing a left symbol (a,y) or a right symbol (x,b) is
    * harmless. The scan stops at the first conflicting candidate:
    * skipping it and continuing would be unsound, since its true
    * count at its sequential turn is unknown.
    *
    * Created-pair ceiling, PER CREATOR: a pair created by (a,b)→ab
    * gains ≤ n(x,a) / n(b,y) occurrences (each creation consumes one
    * such adjacency of THIS merge's own symbols) on top of ≤
    * n_old(x,ab)/(ab,y) pre-existing ones when the string ab already
    * exists as a symbol. So with shrink_i = max census count over
    * pairs of form (·, ci.left) / (ci.right, ·) and merged_i = max
    * over pairs touching the string ci.left+ci.right (each floored by
    * `unseenBound`, the count every pair NOT in the collected census
    * is ≤; a complete census needs no floor), applying ci alone can
    * push no pair above shrink_i + merged_i — and shrink_i < 0 means
    * ci can create nothing at all. Contributions do NOT compose under
    * max: one pair can gain from SEVERAL batch members — e.g. with
    * s_k = ck's string and s_i = ci's string, occurrences "… a_k b_k
    * a_i b_i …" become (s_k, s_i) after both merges, and when a
    * merge's string pre-exists as a symbol (string collisions from
    * earlier passes, 'ABC' formed as AB+C while A,BC adjacencies
    * remain) the same pair also starts from a census count. So the
    * ceiling is CUMULATIVE: runningBound = Σ of earlier
    * contributions. Each creation by ci consumes an adjacency of ci's
    * own symbols whose live count is itself ≤ its census ceiling plus
    * earlier selections' contributions, so the sum dominates any
    * pair's reachable count at any sequential turn inside the batch.
    * A selection is kept only while STRICTLY above the bound — a
    * created/grown pair can then never tie-or-beat a later batch
    * member at its sequential turn (ties lose on the strict count).
    * The head (the true argmax, preceded by nothing) survives
    * unconditionally. No selected pair contributes to another's
    * adjacency maxima (such a pair would have conflicted), so the
    * maxima come from the full candidate list unchanged.
    */
  private[ops] def selectBatch(cands: Seq[(String, String, Long)],
                               unseenBound: Long,
                               relaxedTies: Boolean = false,
                               priorConcats: Set[String] = Set.empty)
      : Seq[(String, String, Long)] = {
    val leftS = scala.collection.mutable.Set.empty[String]
    val rightS = scala.collection.mutable.Set.empty[String]
    val mergedS = scala.collection.mutable.Set.empty[String]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var stopIdx = -1 // index of the first conflicting candidate
    while (i < cands.length && stopIdx < 0) {
      val c @ (l, r, _) = cands(i)
      if (leftS(r) || rightS(l) || mergedS(l) || mergedS(r)) stopIdx = i
      else { sel += c; leftS += l; rightS += r; mergedS += (l + r) }
      i += 1
    }
    // per-symbol adjacency maxima over the census: the largest count
    // of any pair ending at / starting from a symbol
    val maxInto = scala.collection.mutable.HashMap.empty[String, Long]
    val maxFrom = scala.collection.mutable.HashMap.empty[String, Long]
    cands.foreach { case (l, r, n) =>
      if (n > maxFrom.getOrElse(l, Long.MinValue)) maxFrom(l) = n
      if (n > maxInto.getOrElse(r, Long.MinValue)) maxInto(r) = n
    }
    def adj(m: scala.collection.mutable.HashMap[String, Long],
            s: String): Long = m.getOrElse(s, -1L).max(unseenBound)
    var runningBound = -1L
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var j = 0
    var trimmed = false
    while (j < sel.length && !trimmed) {
      val c @ (l, r, n) = sel(j)
      // strict (bit-identity) mode keeps only while STRICTLY above the
      // bound — a grown pair may never tie-or-beat a later member;
      // relaxed mode allows the tie (tie order is the relaxed
      // contract's free variable), so only a strict excess stops it
      if (j > 0 && (if (relaxedTies) n < runningBound else n <= runningBound))
        trimmed = true
      else {
        kept += c
        val shrink = math.max(adj(maxInto, l), adj(maxFrom, r))
        val merged = math.max(adj(maxFrom, l + r), adj(maxInto, l + r))
        val contribution =
          if (shrink < 0L) -1L else shrink + math.max(merged, 0L)
        // cumulative, not max: a pair can gain under several batch
        // members (cross-feeding via created symbols / pre-existing
        // collided strings), so earlier ceilings add up
        if (contribution >= 0L)
          runningBound =
            (if (runningBound < 0L) 0L else runningBound) + contribution
      }
      j += 1
    }
    if (!relaxedTies || kept.length >= cands.length) return kept.toSeq
    // Relaxed-tie plateau sweep. Let cPlat be the count of the first
    // candidate the strict machinery left unselected. Every candidate
    // with a LARGER count was selected (the scan keeps a prefix of the
    // desc-sorted census), so at the plateau's sequential turns the
    // live maximum is at most cPlat: unselected census pairs are
    // ≤ cPlat, unseen pairs are ≤ unseenBound ≤ cPlat, pairs grown by
    // the strictly-above-plateau HEAD merges are ≤ the head's
    // cumulative ceiling (required ≤ cPlat below), and a pair CREATED
    // by a plateau merge gains at most that merge's own occurrence
    // count = cPlat (each creation consumes one occurrence of the
    // merge's own adjacency) on top of a pre-existing mass the concat
    // test forces to zero: a multi-char symbol exists only as some
    // earlier merge's concat string, so requiring the candidate's
    // concat to be absent from the full merge HISTORY and unique
    // within the batch rules out both string collisions and
    // double-feeding. Ties at cPlat are fine — the relaxed contract
    // lets the batch's members order before any tied rival — so the
    // WHOLE plateau batches under structural rules (symbol conflicts
    // skip, not stop), instead of phase A's numeric ceiling stopping
    // the pass after ~2 tied picks (cPlat-count selections contribute
    // ≈cPlat each to the ceiling, tripping it immediately — measured:
    // 4000 relaxed merges still took 2365 passes before this sweep
    // was made structural). Selections AT cPlat are re-derived by the
    // sweep (stricter rules than phase A's numeric allowance — equally
    // sound); each kept merge remains individually max-count-valid at
    // its turn, and what is given up vs strict mode is only WHICH
    // tie-break order the sequence realizes.
    val cPlat = cands(kept.length)._3
    val head = kept.takeWhile(_._3 > cPlat)
    // head ceiling recomputed over ONLY the above-plateau selections
    var headBound = -1L
    head.foreach { case (l, r, _) =>
      val shrink = math.max(adj(maxInto, l), adj(maxFrom, r))
      val merged = math.max(adj(maxFrom, l + r), adj(maxInto, l + r))
      val contribution =
        if (shrink < 0L) -1L else shrink + math.max(merged, 0L)
      if (contribution >= 0L)
        headBound = (if (headBound < 0L) 0L else headBound) + contribution
    }
    if (headBound > cPlat) return kept.toSeq
    val hLeft = scala.collection.mutable.Set.empty[String]
    val hRight = scala.collection.mutable.Set.empty[String]
    val hMerged = scala.collection.mutable.Set.empty[String]
    val concats = scala.collection.mutable.Set.empty[String]
    concats ++= priorConcats
    head.foreach { case (l, r, _) =>
      hLeft += l; hRight += r; hMerged += (l + r); concats += (l + r)
    }
    val swept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    swept ++= head
    var m = head.length
    while (m < cands.length && cands(m)._3 == cPlat) {
      val d @ (l, r, _) = cands(m)
      val s = l + r
      if (!hLeft(r) && !hRight(l) && !hMerged(l) && !hMerged(r) &&
          !concats(s)) {
        swept += d; hLeft += l; hRight += r; hMerged += s; concats += s
      }
      m += 1
    }
    // both results are individually sound batches; take the longer
    if (swept.length >= kept.length) swept.toSeq else kept.toSeq
  }

  /** Learn `rounds` merges from the word-frequency table. Merges come
    * in provably-sequential-equal BATCHES (see [[selectBatch]]): each
    * pass runs ONE pair-count aggregate weighted by word frequency
    * (vocab-sized shuffle), collects the top `batchM` candidates,
    * selects the batchable prefix on the driver (the model, not
    * data), and applies the whole batch in ONE typed per-word
    * re-segmentation — so a 32k-merge training run costs
    * 32k/avg-batch scheduler round-trips instead of 32k (r13 carried
    * item; the learned sequence is bit-identical, BpeSpec proves it
    * against the classic algorithm and against `batchM = 1`).
    * Returns (merges, final segmentation) — segmentations feed
    * vocabulary export or an encode pass. `batchM = 1` degenerates to
    * the classic one-merge-per-pass loop; the default 4096 usually
    * collects the COMPLETE census (distinct pairs are symbol-pair-,
    * not corpus-, sized), which drops the unseen-count floor from the
    * created-pair ceiling and lets tie-heavy tiers batch.
    *
    * `relaxedTies = false` (the default) keeps the bit-identity
    * contract: the sequence equals the classic (count desc, pair asc)
    * loop exactly. At deep tiers that contract serializes training —
    * counts tie across thousands of candidates and the conflict rule
    * stops each pass after ~1–2 merges (the r15 32k rehearsal).
    * `relaxedTies = true` adopts the contract every mainstream
    * tokenizer already ships — tie ORDER among equal counts is
    * arbitrary — and under it batches whole tie plateaus (see the
    * plateau sweep in [[selectBatch]]). Every merge remains
    * individually max-count-valid at its sequential turn (no pair's
    * live count can strictly exceed a selected merge's count when it
    * is applied — BpeRelaxedSpec replays the sequence against a naive
    * simulator to prove it); what changes is only which tie-break
    * order the learned sequence realizes, so a relaxed run is a valid
    * greedy BPE but not byte-equal to the lexicographic one.
    */
  def train(spark: SparkSession, counts: DataFrame, rounds: Int,
            batchM: Int = 4096,
            relaxedTies: Boolean = false): (Seq[Merge], Dataset[WordSeg]) = {
    import spark.implicits._
    require(batchM >= 1, s"batchM must be >= 1, got $batchM")
    val historyConcats = scala.collection.mutable.Set.empty[String]
    var segs: Dataset[WordSeg] = counts.select(col("word"), col("n"))
      .as[(String, Long)]
      .map { case (w, n) =>
        WordSeg(w, n, w.map(_.toString) :+ Eow)
      }
      // cache the working frame: every pass reads it twice (pair
      // census + re-segmentation); it is vocab-sized by construction
      .loopCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var passes = 0
    var exhausted = false
    while (merges.length < rounds && !exhausted) {
      // collect batchM+1 rows: the extra row is the tie-safe bound on
      // every pair the collect did NOT see (census is sorted desc)
      val top = segs.flatMap(ws =>
          ws.syms.sliding(2).collect {
            case Seq(a, b) => ((a, b), ws.n)
          })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(batchM + 1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val unseenBound = if (top.length > batchM) top.last._3 else -1L
        val batch = selectBatch(top.take(batchM).toSeq, unseenBound,
          relaxedTies, historyConcats.toSet).take(rounds - merges.length)
        batch.foreach { case (l, r, n) =>
          merges += Merge(merges.length, l, r, n)
          historyConcats += (l + r)
        }
        val ms = batch.map { case (l, r, _) => (l, r) }
        val next = segs.map { ws =>
          var s = ws.syms
          ms.foreach { case (l, r) => s = mergePair(s, l, r) }
          ws.copy(syms = s)
        }.loopCheckpoint()
        // the new checkpoint is materialized (eager) and no longer
        // reads from the previous pass's blocks — release them, or
        // block-manager storage grows O(passes x vocab) over a
        // realistic 10k-50k-merge training run. In RELIABLE mode the
        // superseded round's checkpoint FILES are deleted by the
        // context cleaner once the dropped reference is GC'd — which
        // requires spark.cleaner.referenceTracking.cleanCheckpoints=
        // true at session build (static conf; Loops' fail-fast
        // message and the harness mains both set/state it), else a
        // long run accumulates one checkpoint dir per pass on disk
        segs.unpersist(blocking = false)
        segs = next
      }
      passes += 1
    }
    System.err.println(
      s"bpe.train: ${merges.length} merges in $passes passes (batchM=$batchM)")
    (merges.toSeq, segs)
  }

  /** Encode a token with a learned merge list (greedy by merge rank —
    * the standard BPE apply order). Driver/executor-pure; used by the
    * spec and available for an encode pass over a corpus.
    */
  def encode(word: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString) :+ Eow
    merges.sortBy(_.rank).foreach(m => syms = mergePair(syms, m.left, m.right))
    syms
  }

  /** Distributed encode pass: subtoken count per document under the
    * learned merges — the real token-cost census a trained tokenizer
    * is FOR. The merge list (model, ~rounds rows) ships in the
    * closure; per-document work is embarrassingly parallel with a
    * per-partition memo over the word vocabulary (documents repeat
    * words heavily, so each partition encodes each distinct word
    * once).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        def enc(w: String): Int = memo.getOrElseUpdate(w, {
          var syms: Seq[String] = w.map(_.toString) :+ Eow
          ordered.foreach { case (l, r) => syms = mergePair(syms, l, r) }
          syms.length
        })
        rows.map { case (id, text) =>
          val words = text.split(' ').iterator.filter(_.nonEmpty)
          var total = 0L; var n = 0L
          words.foreach { w => total += enc(w); n += 1 }
          (id, n, total)
        }
      }
      .toDF(idCol, "n_words", "n_subtokens")
  }
}
