package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Learn `rounds` merges from the word-frequency table. Each round:
    * a pair-count aggregate weighted by word frequency (vocab-sized
    * shuffle), a driver-side argmax of ONE row (the model, not data),
    * and a typed per-word re-segmentation. Returns (merges, final
    * segmentation) — segmentations feed vocabulary export or an
    * encode pass.
    */
  def train(spark: SparkSession, counts: DataFrame, rounds: Int)
      : (Seq[Merge], Dataset[WordSeg]) = {
    import spark.implicits._
    var segs: Dataset[WordSeg] = counts.select(col("word"), col("n"))
      .as[(String, Long)]
      .map { case (w, n) =>
        WordSeg(w, n, w.map(_.toString) :+ Eow)
      }
      // cache the working frame: every round reads it twice (pair
      // census + re-segmentation); it is vocab-sized by construction
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val top = segs.flatMap(ws =>
          ws.syms.sliding(2).collect {
            case Seq(a, b) => ((a, b), ws.n)
          })
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = top.head
        merges += Merge(merges.length, l, r, n)
        val next = segs.map(ws => ws.copy(syms = mergePair(ws.syms, l, r)))
          .localCheckpoint(true)
        // the new checkpoint is materialized (eager) and no longer
        // reads from the previous round's blocks — release them, or
        // block-manager storage grows O(rounds x vocab) over a
        // realistic 10k-50k-merge training run
        segs.unpersist(blocking = false)
        segs = next
      }
      round += 1
    }
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
