package graft

import java.math.RoundingMode

/** Brute-force differentials for the text-scoring family — tf-idf,
  * add-one bigram perplexity, Kneser-Ney perplexity, collocation lift
  * and BM25, the queries whose formulas carry the most shared-author
  * risk (smoothing constants, discount edge cases, rounding points,
  * association order of the IEEE chains). Naive Scala
  * reimplementations over plain collections — java.lang.Math.log,
  * BigDecimal HALF_UP at the queries' documented rounding points, no
  * Spark expressions, no shared code — against the ACTUAL harness
  * queries on a seeded micro corpus.
  *
  * Pinned edges: the empty text and a single-token document produce
  * NO bigrams and must be absent from both perplexity outputs; a
  * self-repeating document pins the c(w,w) self-bigram path; the
  * KN discount is exercised on nab = 1 bigrams where c − d < 1; BM25
  * documents without any query term are absent.
  */
class TextDifferentialSpec extends SparkSpec {

  // ---- naive primitives -------------------------------------------------

  private def tokens(text: String): Seq[String] = text.split(" ", -1).toSeq

  private def dec(x: Double, scale: Int): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP))

  private def roundD(x: Double, d: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(d, RoundingMode.HALF_UP).doubleValue()

  // ---- seeded micro corpus ----------------------------------------------

  private case class Doc(id: Long, text: String, lang: String, source: String)

  private lazy val docs: Seq[Doc] = {
    val rnd = new scala.util.Random(90210L)
    // small vocab INCLUDING the BM25 query terms, so tf/df/idf vary;
    // heavy repetition guarantees collocations clear the nab >= 5 bar
    val vocab = Array("scan", "merge", "hash", "batch", "sort", "join",
      "spill", "agg", "scan", "merge", "probe", "build")
    val organic = (1L to 200L).map { i =>
      val n = 1 + rnd.nextInt(25)
      Doc(i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "), "en", "src0")
    }
    val pinned = Seq(
      Doc(9001, "", "en", "src0"),          // one "" token, zero bigrams
      Doc(9002, "scan", "en", "src1"),      // single token, zero bigrams
      Doc(9003, Seq.fill(12)("hash").mkString(" "), "en", "src2"), // self-bigrams
      Doc(9004, "sort qqq merge", "en", "src3")) // two nab=1 bigrams: the
      // KN discount's max(c−d, 0) small-count edge really occurs
    organic ++ pinned
  }

  private lazy val microDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-text-diff").toString
    docs.map(d => (d.id, d.text, d.lang, d.source, d.text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String) =
    harness.TextQueries.queries(name)(spark, microDir)

  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  /** Per-document bigram multiset and the corpus-wide model censuses
    * shared by the perplexity differentials.
    */
  private lazy val docBg: Map[Long, Map[(String, String), Long]] =
    docs.map { d =>
      val ts = tokens(d.text)
      d.id -> ts.zip(ts.drop(1)).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
    }.toMap
  private lazy val model: Map[(String, String), Long] =
    docBg.values.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
  private lazy val uni: Map[String, Long] =
    docs.flatMap(d => tokens(d.text)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap

  // ---- differentials ----------------------------------------------------

  test("text_tfidf matches a naive tf·idf top-3 per document") {
    val nd = docs.size.toDouble
    val df = docs.flatMap(d => tokens(d.text).distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val w = df.map { case (t, f) => t -> dec(math.log(nd / f), 6) }
    val naive = docs.flatMap { d =>
      val tf = tokens(d.text).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      tf.toSeq.map { case (t, f) =>
        (d.id, t, f, (w(t) * BigDecimal(f)).toDouble) }
        .sortBy { case (_, t, _, s) => (-s, t) }.take(3)
    }.toSet
    val got = run("text_tfidf").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2), r.getDouble(3))).toSet
    assert(got === naive)
  }

  test("text_perplexity matches a naive add-one bigram NLL") {
    val v = uni.size.toLong
    val naive = docBg.collect { case (id, bgs) if bgs.nonEmpty =>
      val n = bgs.values.sum
      val s = bgs.map { case ((w1, w2), k) =>
        dec(-math.log((model((w1, w2)) + 1.0) / (uni(w1) + v)), 9) * BigDecimal(k)
      }.sum
      (id, n, roundD(s.toDouble / n, 6))
    }.toSet
    val got = run("text_perplexity").collect()
      .map(r => (num(r, 0), num(r, 1), r.getDouble(2))).toSet
    assert(got === naive)
    // zero-bigram documents are absent, the self-repeater is present
    assert(!naive.exists(t => t._1 == 9001L || t._1 == 9002L))
    assert(naive.exists(_._1 == 9003L))
  }

  test("text_perplexity_kn matches a naive Kneser-Ney bigram NLL") {
    val c1 = model.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = model.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1p = model.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nt = model.size.toDouble
    val naive = docBg.collect { case (id, bgs) if bgs.nonEmpty =>
      val n = bgs.values.sum
      val s = bgs.map { case ((w1, w2), k) =>
        val p = (math.max(model((w1, w2)).toDouble - 0.75, 0.0) +
          0.75 * n1f(w1).toDouble * n1p(w2).toDouble / nt) / c1(w1).toDouble
        dec(-math.log(p), 9) * BigDecimal(k)
      }.sum
      (id, n, roundD(s.toDouble / n, 6))
    }.toSet
    val got = run("text_perplexity_kn").collect()
      .map(r => (num(r, 0), num(r, 1), r.getDouble(2))).toSet
    assert(got === naive)
    // the discount edge really occurs: some bigram has count exactly 1
    assert(model.values.exists(_ == 1L), "micro corpus must carry nab=1 bigrams")
  }

  test("text_collocations matches a naive lift ranking") {
    val nt = docs.map(d => tokens(d.text).size.toLong).sum
    val nbg = nt - docs.size
    val naive = model.toSeq.collect { case ((w1, w2), nab) if nab >= 5 =>
      val lift = roundD(nab.toDouble * nt * nt /
        (uni(w1).toDouble * uni(w2) * nbg), 6)
      (w1, w2, nab, lift)
    }.sortBy { case (w1, w2, _, l) => (-l, w1, w2) }.take(100).toSet
    val got = run("text_collocations").collect()
      .map(r => (r.getString(0), r.getString(1), num(r, 2), r.getDouble(3)))
      .toSet
    assert(got === naive)
    assert(naive.nonEmpty)
  }

  test("text_bm25 matches a naive Okapi ranking in integer micros") {
    val terms = Set("scan", "merge", "hash", "batch")
    val dl = docs.map(d => d.id -> tokens(d.text).size.toLong).toMap
    val nd = docs.size.toLong
    val sdl = dl.values.sum
    val hits = docs.flatMap { d =>
      tokens(d.text).filter(terms).map(t => (d.id, t)) }
    val df = hits.distinct.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val idf = df.map { case (t, f) =>
      t -> dec(math.log(1.0 + (nd.toDouble - f.toDouble + 0.5) / (f.toDouble + 0.5)), 6) }
    val scored = hits.groupBy(_._1).toSeq.map { case (id, hs) =>
      val byT = hs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
      val micros = byT.map { case (t, tf) =>
        val tfp = (tf.toDouble * 2.2) /
          (tf.toDouble + 1.2 * (0.25 + 0.75 *
            (dl(id).toDouble / (sdl.toDouble / nd.toDouble))))
        math.floor(idf(t).toDouble * tfp * 1e6 + 0.5).toLong
      }
      (id, byT.size.toLong, micros.sum)
    }
    val naive = scored.sortBy { case (id, _, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, n, s), i) => (id, n, s, (i + 1).toLong) }
      .toSet
    val got = run("text_bm25").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3))).toSet
    assert(got === naive)
  }
}
