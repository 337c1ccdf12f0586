package graft

import java.math.RoundingMode

/** Brute-force differentials for the sampling / packing family — the
  * CdcEventDifferentialSpec posture applied to the last big family
  * gated only by the same-author DuckDB oracle. Every operator here is
  * a pure function of salted content hashes (the family contract), so
  * the naive truth reimplements each selection/layout rule over plain
  * Scala collections with java.security MD5 — no Spark expressions, no
  * shared query code — and the ACTUAL harness queries run end-to-end
  * against a seeded micro corpus written as a real sf-dir.
  *
  * The micro corpus is adversarial on the family's edge set: texts
  * with double/trailing spaces and the empty string (split-semantics
  * pins: Spark's split keeps trailing empty strings), heavy (n_tok,
  * n_chars) tie mass to force every rank's doc_id tie-break, hash-byte
  * collisions (600 docs over 256 byte values), sources outside the
  * mixture spec (weight 0 → excluded) and at the epoch-multiplier
  * boundaries (k=0 and the hash-gated fractional copy).
  */
class SampleDifferentialSpec extends SparkSpec {

  // ---- naive primitives (JDK only — no Spark expressions) ------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** First byte of the salted md5, as the queries' hexByteValue. */
  private def hv(salt: String, id: Long): Int =
    Integer.parseInt(md5hex(s"$salt:$id").substring(0, 2), 16)

  /** Spark round(x, d): BigDecimal HALF_UP on the double. */
  private def roundD(x: Double, d: Int): Double =
    java.math.BigDecimal.valueOf(x).setScale(d, RoundingMode.HALF_UP)
      .doubleValue()

  private def tokens(text: String): Seq[String] = text.split(" ", -1).toSeq

  // ---- seeded micro corpus --------------------------------------------

  private case class Doc(id: Long, text: String, lang: String, source: String) {
    def nChars: Long = text.length.toLong
    def nTok: Long = tokens(text).size.toLong
  }

  private lazy val docs: Seq[Doc] = {
    val rnd = new scala.util.Random(20260816L)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi")
    val langs = Array("en", "en", "en", "de", "fr", "zh") // en-heavy
    val sources = Array("src0", "src0", "src1", "src2", "src3", "src4",
      "src5", "src6", "src7", "src8") // 7,8 outside the mixture spec
    val organic = (1L to 580L).map { i =>
      val n = 1 + rnd.nextInt(30)
      Doc(i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "),
        langs(rnd.nextInt(langs.length)), sources(rnd.nextInt(sources.length)))
    }
    val pinned = Seq(
      Doc(9001, "", "en", "src0"),                  // empty → one "" token
      Doc(9002, "alpha  beta", "de", "src1"),       // double space → "" mid
      Doc(9003, "alpha beta ", "fr", "src2"),       // trailing space → "" last
      Doc(9004, " ", "zh", "src3"),                 // one space → two "" tokens
      Doc(9005, vocab.mkString(" ") * 20, "en", "src8"), // long doc, k=1 gate
      Doc(9006, "alpha", "en", "src7"),             // k=0 → zero epoch copies
      Doc(9007, "alpha", "de", "src7"))             // n_tok/n_chars tie vs 9006
    organic ++ pinned
  }

  private lazy val microDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sample-diff").toString
    docs.map(d => (d.id, d.text, d.lang, d.source, d.nChars))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String) =
    harness.SampleQueries.queries(name)(spark, microDir)

  // constants mirrored from the query header docs (the CONTRACT under
  // test is the selection rule, so these must match SampleQueries)
  private val SampleThresh = 26
  private val StratumK = 50
  private val TrainHi = 204
  private val ValHi = 230
  private val PackBudget = 512L
  private val WeightedN = 150
  private val DsirN = 100
  private val Shards = 8
  private val MixWeights = Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.1,
    "src3" -> 0.05, "src4" -> 0.05, "src5" -> 0.05, "src6" -> 0.05)
  private val MixBudget = 0.2

  private def num(r: org.apache.spark.sql.Row, i: Int): Long =
    r.getAs[Number](i).longValue()

  // ---- differentials ----------------------------------------------------

  test("sample_hash matches the naive Bernoulli-by-hash filter") {
    val naive = docs.filter(d => hv("split1", d.id) < SampleThresh)
      .map(d => (d.id, d.lang, d.source, hv("split1", d.id).toLong)).toSet
    val got = run("sample_hash").collect()
      .map(r => (num(r, 0), r.getString(1), r.getString(2), num(r, 3))).toSet
    assert(got === naive)
  }

  test("sample_stratified matches a naive per-stratum hash-order top-K") {
    val naive = docs.groupBy(d => (d.lang, d.source)).toSeq.flatMap {
      case ((l, s), ds) =>
        ds.sortBy(d => (hv("strat1", d.id), d.id)).take(StratumK).zipWithIndex
          .map { case (d, i) =>
            (l, s, d.id, hv("strat1", d.id).toLong, (i + 1).toLong) }
    }.toSet
    val got = run("sample_stratified").collect()
      .map(r => (r.getString(0), r.getString(1), num(r, 2), num(r, 3),
        num(r, 4))).toSet
    assert(got === naive)
  }

  test("sample_temperature matches the naive sqrt-threshold rule") {
    val ns = docs.groupBy(_.lang).view.mapValues(_.size.toLong).toMap
    val nMin = ns.values.min
    val thresh = ns.map { case (l, n) =>
      l -> roundD(256.0 * math.sqrt(nMin.toDouble / n), 6) }
    val naive = docs.filter(d => hv("mix1", d.id) < thresh(d.lang))
      .map(d => (d.id, d.lang, hv("mix1", d.id).toLong, thresh(d.lang))).toSet
    val got = run("sample_temperature").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2), r.getDouble(3))).toSet
    assert(got === naive)
  }

  test("split_train_eval matches the naive hash-range assignment") {
    val naive = docs.groupBy { d =>
      val h = hv("split1", d.id)
      if (h < TrainHi) "train" else if (h < ValHi) "val" else "test"
    }.map { case (s, ds) =>
      (s, ds.size.toLong, ds.map(_.id).sum, ds.map(_.id).min, ds.map(_.id).max)
    }.toSet
    val got = run("split_train_eval").collect()
      .map(r => (r.getString(0), num(r, 1), num(r, 2), num(r, 3), num(r, 4)))
      .toSet
    assert(got === naive)
  }

  test("sample_pack_sequences matches a naive hash-order concat-and-chunk") {
    // global order = lexicographic salted hash (the bucketed prefix sum
    // must EQUAL this); bin = the window the doc's first token lands in
    val ordered = docs.sortBy(d => (md5hex(s"${d.id}:pack"), d.id))
    var cum = 0L
    val binned = ordered.map { d =>
      val bin = cum / PackBudget; cum += d.nTok; (d, bin)
    }
    val naive = binned.groupBy(_._2).map { case (bin, ds) =>
      (bin, ds.size.toLong, ds.map(_._1.nTok).sum, ds.map(_._1.id).sum)
    }.toSet
    val got = run("sample_pack_sequences").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3))).toSet
    assert(got === naive)
  }

  test("sample_weighted matches a naive Efraimidis–Spirakis draw") {
    val naive = docs.map { d =>
      val u = (hv("wrs1", d.id) + 1.0) / 257.0
      (d.id, d.lang, d.nTok, roundD(-math.log(u) / d.nTok.toDouble, 12))
    }.sortBy { case (id, _, _, c) => (c, id) }.take(WeightedN).toSet
    val got = run("sample_weighted").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2), r.getDouble(3))).toSet
    assert(got === naive)
  }

  test("sample_mixture matches the naive census-solved thresholds") {
    val nTot = docs.size.toLong
    val ns = docs.groupBy(_.source).view.mapValues(_.size.toLong).toMap
    val thresh = ns.map { case (s, n) =>
      s -> roundD(256.0 * MixBudget * MixWeights.getOrElse(s, 0.0) * nTot / n, 6)
    }
    val naive = docs.filter(d => hv("mixw1", d.id) < thresh(d.source))
      .map(d => (d.id, d.source, hv("mixw1", d.id).toLong, thresh(d.source)))
      .toSet
    val got = run("sample_mixture").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2), r.getDouble(3))).toSet
    assert(got === naive)
    // the weight-0 sources really are excluded end to end
    assert(!naive.exists(t => t._2 == "src7" || t._2 == "src8"))
  }

  test("sample_shuffle_shards matches a naive shard/pos layout") {
    val naive = docs.map { d =>
      (d, md5hex(s"shuf:${d.id}"))
    }.groupBy { case (_, h) => Integer.parseInt(h.substring(0, 2), 16) % Shards }
      .toSeq.flatMap { case (shard, ds) =>
        ds.sortBy { case (d, h) => (h, d.id) }.zipWithIndex.map {
          case ((d, _), i) => (d.id, shard.toLong, (i + 1).toLong) }
      }.toSet
    val got = run("sample_shuffle_shards").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2))).toSet
    assert(got === naive)
  }

  test("sample_pack_pairs matches a naive zig-zag length pairing") {
    val nn = docs.size.toLong
    val ranked = docs.sortBy(d => (-d.nTok, d.id)).zipWithIndex
      .map { case (d, i) => (d, i + 1L) }
    val naive = ranked.groupBy { case (_, rnk) => math.min(rnk, nn + 1 - rnk) }
      .map { case (bin, ds) =>
        (bin, ds.size.toLong,
          ds.map(_._1.id).sorted.mkString(","), ds.map(_._1.nTok).sum)
      }.toSet
    val got = run("sample_pack_pairs").collect()
      .map(r => (num(r, 0), num(r, 1), r.getString(2), num(r, 3))).toSet
    assert(got === naive)
  }

  test("sample_epochs matches the naive multiplier/hash-gate expansion") {
    val naive = docs.flatMap { d =>
      val k = d.source.filter(_.isDigit).toInt % 7
      val n = k / 2 + (if (k % 2 == 1 && hv("epoch1", d.id) < 128) 1 else 0)
      (0 until n).map(c => (d.id, d.source, c.toLong))
    }.toSet
    val got = run("sample_epochs").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2))).toSet
    assert(got === naive)
  }

  test("sample_curriculum matches a naive decile/epoch/shard layout") {
    val total = docs.size.toLong
    val ranked = docs.sortBy(d => (d.nChars, d.id)).zipWithIndex.map {
      case (d, i) => (d, i + 1L) }
    val naive = ranked.flatMap { case (d, rnk) =>
      val decile = 1L + ((rnk - 1) * 10) / total
      (1 to 3).filter(e => decile <= 1 + 3 * e).map { e =>
        val hh = md5hex(s"cur:$e:${d.id}")
        (e.toLong, d.id, decile, hh)
      }
    }.groupBy { case (e, _, _, hh) =>
      (e, Integer.parseInt(hh.substring(0, 2), 16) % 8)
    }.toSeq.flatMap { case ((e, shard), rows) =>
      rows.sortBy { case (_, id, _, hh) => (hh, id) }.zipWithIndex.map {
        case ((_, id, dec, _), i) => (e, id, dec, shard.toLong, (i + 1).toLong)
      }
    }.toSet
    val got = run("sample_curriculum").collect()
      .map(r => (num(r, 0), num(r, 1), num(r, 2), num(r, 3), num(r, 4))).toSet
    assert(got === naive)
  }

  test("sample_dsir matches a naive importance-resampling rank") {
    val docToks = docs.map(d => (d, tokens(d.text)))
    val cs = docToks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val ct = docToks.filter(_._1.lang == "en").flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totS = cs.values.sum.toDouble
    val totT = ct.values.sum.toDouble
    val v = cs.size.toDouble
    val w: Map[String, BigDecimal] = cs.keys.map { t =>
      t -> BigDecimal(roundD(
        math.log((ct.getOrElse(t, 0L) + 1.0) / (totT + v)) -
          math.log((cs(t) + 1.0) / (totS + v)), 6))
    }.toMap
    val naive = docToks.map { case (d, ts) =>
      (d.id, d.lang, ts.size.toLong, ts.map(w).sum.toDouble)
    }.sortBy { case (id, _, _, sc) => (-sc, id) }.take(DsirN).toSet
    val got = run("sample_dsir").collect()
      .map(r => (num(r, 0), r.getString(1), num(r, 2), r.getDouble(3))).toSet
    assert(got === naive)
  }
}
