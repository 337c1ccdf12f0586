package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.functions._

/** Property net for the corpus-curation operators: the distributed
  * implementations must agree with independent brute-force Scala
  * reference implementations on seeded pseudo-random corpora
  * (deterministic LCG — no java.util.Random, so failures replay).
  */
class CorpusOpsSpec extends SparkSpec {

  // deterministic token streams: small vocabulary + planted repeats
  private def docs(nDocs: Int, seed: Long): Seq[(Long, Seq[String])] = {
    var x = seed
    def next(bound: Int): Int = {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      (((x >>> 33) % bound).toInt + bound) % bound
    }
    val vocab = (0 until 12).map(i => s"w$i")
    (0 until nDocs).map { id =>
      val n = 8 + next(40)
      val base = Seq.fill(n)(vocab(next(vocab.size)))
      // plant a shared run in half the docs so repeated spans exist
      val toks =
        if (id % 2 == 0) base.take(3) ++ (0 until 12).map(i => s"r$i") ++ base.drop(3)
        else base
      (id.toLong, toks)
    }
  }

  test("substringSpans matches a brute-force span merge") {
    val w = 4
    val corpus = docs(40, seed = 7)
    // brute force: census of every w-window, then per-doc merge of
    // duplicated window positions into maximal spans
    val census = collection.mutable.Map.empty[Seq[String], Int]
    for ((_, t) <- corpus; i <- 0 to t.size - w)
      census.updateWith(t.slice(i, i + w))(c => Some(c.getOrElse(0) + 1))
    val expected = (for ((id, t) <- corpus) yield {
      val hits = (0 to t.size - w).filter(i => census(t.slice(i, i + w)) > 1)
      val spans = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for (p <- hits) {
        val (s1, e1) = (p + 1L, p + w.toLong) // 1-based inclusive
        spans.lastOption match {
          case Some((s0, e0, n0)) if s1 <= e0 + 1 =>
            spans(spans.size - 1) = (s0, math.max(e0, e1), n0 + 1)
          case _ => spans += ((s1, e1, 1L))
        }
      }
      spans.map { case (s1, e1, n1) => (id, s1, e1, n1) }
    }).flatten.toSet

    import spark.implicits._
    val df = corpus.toDF("doc_id", "toks")
    val spansDf = CorpusOps.substringSpans(df, "doc_id", "toks", w)
    val got = spansDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)

    // removeSpans must keep exactly the tokens outside the spans
    val rewritten = CorpusOps.removeSpans(df, "doc_id", "toks", spansDf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val spansByDoc = expected.groupBy(_._1)
    for ((id, t) <- corpus) {
      val sp = spansByDoc.getOrElse(id, Set.empty)
      val kept = t.zipWithIndex.collect {
        case (tok, i) if !sp.exists(s => i + 1 >= s._2 && i + 1 <= s._3) => tok
      }
      assert(rewritten(id) === ((t.size - kept.size).toLong, kept.mkString(" ")),
        s"doc $id")
    }
  }

  test("substringSpans handles a 100k-token document without row blowup") {
    import spark.implicits._
    // one mega-doc (the 100 TB skew case: a pathological giant page)
    // plus a small doc sharing one run with it — the giant's shingle
    // array lives in ONE row, so this proves the per-row HOF path and
    // the seed census survive a document 3 orders of magnitude above
    // the mean without needing a row split
    val giant = (0 until 100000).map(i => s"g${i % 9973}")
    val small = giant.slice(500, 520)
    val df = Seq((1L, giant), (2L, small)).toDF("id", "toks")
    val spans = CorpusOps.substringSpans(df, "id", "toks", 10)
    // doc 2's whole body is a copy of a giant slice → one full span
    val s2 = spans.filter(col("id") === 2L).collect()
    assert(s2.length === 1)
    assert(s2.head.getLong(1) === 1L && s2.head.getLong(2) === small.size.toLong)
    // the giant itself repeats its vocab cycle, so spans exist and
    // positions stay within bounds
    val s1 = spans.filter(col("id") === 1L)
      .agg(min(col("span_start")), max(col("span_end"))).head
    assert(s1.getLong(0) >= 1L && s1.getLong(1) <= giant.size.toLong)
  }

  test("repetitionSignals matches brute-force fractions") {
    val corpus = docs(30, seed = 13)
    import spark.implicits._
    val got = CorpusOps.repetitionSignals(
        corpus.toDF("doc_id", "toks"), "doc_id", "toks")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def round6(d: Double) = math.round(d * 1e6) / 1e6
    for ((id, t) <- corpus if t.size >= 3) {
      val g2 = t.sliding(2).map(_.mkString(" ")).toSeq
      val g3 = t.sliding(3).map(_.mkString(" ")).toSeq
      val c2 = g2.groupBy(identity).values.map(_.size)
      val c3 = g3.groupBy(identity).values.map(_.size)
      val (nTok, dupF, top2, dup3) = got(id)
      assert(nTok === t.size.toLong)
      assert(dupF === round6(1.0 - t.distinct.size.toDouble / t.size))
      assert(top2 === round6(c2.max.toDouble / g2.size))
      assert(dup3 === round6(c3.filter(_ > 1).sum.toDouble / g3.size))
    }
  }

  test("rankQuantiles matches brute-force rank selection") {
    var x = 99L
    def next(bound: Int): Int = {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      (((x >>> 33) % bound).toInt + bound) % bound
    }
    // uneven group sizes incl. 1 and 2 to hit the rank edge cases
    val rows = for {
      (g, n) <- Seq(("a", 1), ("b", 2), ("c", 7), ("d", 100), ("e", 101))
      _ <- 0 until n
    } yield (g, next(1000).toLong)
    import spark.implicits._
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
    val got = CorpusOps.rankQuantiles(rows.toDF("g", "v"), "g", "v", qs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val n = sorted.size
      def at(a: Int, b: Int) = sorted(((a.toLong * n + b - 1) / b).toInt - 1)
      assert(got(g) === ((n.toLong, at(1, 2), at(9, 10), at(99, 100))), s"group $g")
    }
  }

  test("packSequences matches a single-ordered brute-force chunking") {
    var x = 41L
    def next(bound: Int): Int = {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      (((x >>> 33) % bound).toInt + bound) % bound
    }
    val budget = 64L
    val rows = (0L until 500L).map(id => (id, next(40).toLong + 1))
    import spark.implicits._
    val got = CorpusOps.packSequences(
        rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok", budget)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute force: one global order by (md5(id:pack), id), running
    // exclusive prefix sum, bin = offset / budget
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"$id:pack".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val ordered = rows.sortBy { case (id, _) => (h(id), id) }
    var cum = 0L
    val expected = ordered.map { case (id, n) =>
      val bin = cum / budget; cum += n; id -> bin
    }.toMap
    assert(got === expected)
    // conservation + bounded overflow: every bin holds < budget + max
    // doc tokens (a doc is assigned where its first token lands)
    val perBin = rows.groupBy(r => expected(r._1)).view
      .mapValues(_.map(_._2).sum)
    assert(perBin.values.sum === rows.map(_._2).sum)
    val maxDoc = rows.map(_._2).max
    perBin.foreach { case (bin, tks) =>
      assert(tks < budget + maxDoc, s"bin $bin overflows: $tks")
    }
  }

  test("temperatureSample thresholds and kept sets match brute force") {
    import spark.implicits._
    // skewed strata: en 60, fr 15, de 5 → thresholds 256·sqrt(5/n)
    val rows = (0 until 60).map(i => (i.toLong, "en")) ++
      (100 until 115).map(i => (i.toLong, "fr")) ++
      (200 until 205).map(i => (i.toLong, "de"))
    val hash = graft.ops.TextOps.hexByteValue(
      md5(concat(lit("t:"), col("id").cast("string"))))
    val kept = CorpusOps.temperatureSample(rows.toDF("id", "lang"), "lang", hash)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("thresh"))).toMap

    def hv(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(d.substring(0, 2), 16)
    }
    val counts = Map("en" -> 60, "fr" -> 15, "de" -> 5)
    def thresh(lang: String): Double =
      math.round(256.0 * math.sqrt(5.0 / counts(lang)) * 1e6) / 1e6
    for ((id, lang) <- rows) {
      val expectKeep = hv(id) < thresh(lang)
      assert(kept.contains(id) === expectKeep, s"doc $id ($lang)")
      if (expectKeep) assert(kept(id) === thresh(lang))
    }
    // the smallest stratum keeps everything (thresh = 256)
    assert((200L until 205L).forall(kept.contains))
  }

  test("decontaminate counts distinct shared shingles exactly") {
    val corpus = docs(30, seed = 29)
    import spark.implicits._
    val sh = CorpusOps.shingleFrame(corpus.toDF("doc_id", "toks"),
      "doc_id", "toks", 5)
    val train = sh.filter(col("doc_id") % 3 =!= 0)
    val ev = sh.filter(col("doc_id") % 3 === 0).select(col("s"))
    val got = CorpusOps.decontaminate(train, ev, "doc_id", "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force over hashed-free shingle STRINGS (the 52-bit hash is
    // injective here with overwhelming probability; counts must agree)
    def shset(t: Seq[String]) = t.sliding(5).map(_.mkString(" ")).toSet
    val evalSet = corpus.filter(_._1 % 3 == 0).flatMap(d => shset(d._2)).toSet
    for ((id, t) <- corpus if id % 3 != 0 && t.size >= 5) {
      val mine = shset(t)
      val overlap = (mine & evalSet).size.toLong
      if (overlap > 0) {
        assert(got(id) === ((overlap, mine.size.toLong)), s"doc $id")
      } else assert(!got.contains(id), s"doc $id should be absent")
    }
  }

  test("lshCandidates bucket cap keeps a witness pool in mega buckets") {
    import spark.implicits._
    // synthetic signature frame (k=4, 2 bands of 2): a "template"
    // cohort of 40 docs sharing EVERY hash row (the verbatim-template
    // shape — more bands cannot split identical signatures), one
    // 5-doc cluster sharing every row, and singletons sharing none
    val rows =
      (0L until 40L).map(id => (id, 1L, 2L, 3L, 4L)) ++
      (100L until 105L).map(id => (id, 9L, 8L, 7L, 6L)) ++
      (200L until 210L).map(id => (id, 100L + id, 200L + id, 300L + id, 400L + id))
    val sig = rows.toDF("doc_id", "h1", "h2", "h3", "h4")

    val uncapped = CorpusOps.lshCandidates(sig, "doc_id", 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all within-cohort pairs, nothing across
    val megaPairs = (for (a <- 0L until 40L; b <- a + 1 until 40L)
      yield (a, b)).toSet
    val smallPairs = (for (a <- 100L until 105L; b <- a + 1 until 105L)
      yield (a, b)).toSet
    assert(uncapped === megaPairs ++ smallPairs)

    // cap 8: the 40-doc template bucket shrinks to its witness pool —
    // the 8 LOWEST ids each pair with every higher member, so the
    // cluster still collapses to one component downstream while the
    // bucket's cost drops from |bucket|² to cap·|bucket|; the 5-doc
    // cluster is untouched
    val witnessPairs = (for (a <- 0L until 8L; b <- a + 1 until 40L)
      yield (a, b)).toSet
    val capped = CorpusOps.lshCandidates(sig, "doc_id", 2, 2, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === witnessPairs ++ smallPairs)
    // every template member is adjacent to witness 0 → one component
    (1L until 40L).foreach(b => assert(capped.contains((0L, b))))

    // a cap at exactly the bucket size keeps the bucket (<=, not <)
    val atCap = CorpusOps.lshCandidates(sig, "doc_id", 2, 2, bucketCap = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atCap === megaPairs ++ smallPairs)
  }
}
