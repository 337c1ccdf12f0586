package graft.kernels

import org.apache.spark.sql.{DataFrame, Dataset}

/** K6: HMMER3 text-model parser + information-content logo
  * (SURVEY.md §2.10; reference interpro/oracle/hmms.py:93-438 parses
  * each signature's HMM blob and computes per-position letter heights
  * for the web logo).
  *
  * Fresh implementation of the published HMMER3 file format's parts
  * the logo needs: the header (NAME / LENG / HMM alphabet line) and
  * each position block's match-emission line, which carries the
  * negative natural log of the emission probability per alphabet
  * letter ('*' = impossible, p = 0). Heights follow the standard
  * sequence-logo construction: information content
  * IC = log2(K) + Σ p·log2(p), letter height = p·IC.
  */
object HmmLogo {

  final case class HmmModel(name: String, length: Int, alphabet: Vector[Char],
                            matchEmissions: Vector[Vector[Double]])

  final case class LogoColumn(position: Int, infoContent: Double,
                              heights: Map[Char, Double])

  /** Parse one HMMER3 text model. Unknown/extra lines are skipped;
    * malformed mandatory structure throws IllegalArgumentException.
    */
  def parse(text: String): HmmModel = {
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    def field(key: String): Option[String] =
      lines.find(_.startsWith(key + " ")).map(_.drop(key.length).trim)
    val name = field("NAME").getOrElse(
      throw new IllegalArgumentException("missing NAME"))
    val leng = field("LENG").map(_.toInt).getOrElse(
      throw new IllegalArgumentException("missing LENG"))

    val hmmIdx = lines.indexWhere(_.startsWith("HMM "))
    if (hmmIdx < 0) throw new IllegalArgumentException("missing HMM header")
    val alphabet = lines(hmmIdx).drop(3).trim.split("\\s+").map(_.head).toVector

    // position blocks: lines whose first token is the 1-based position
    // index, followed by the match emission scores (-ln p, '*' = inf)
    val emissions = lines.drop(hmmIdx + 1).flatMap { l =>
      val toks = l.split("\\s+")
      if (toks.length >= alphabet.length + 1 && toks(0).forall(_.isDigit)) {
        val pos = toks(0).toInt
        val scores = toks.slice(1, alphabet.length + 1).map {
          case "*" => Double.PositiveInfinity
          case t => t.toDouble
        }.toVector
        Some(pos -> scores)
      } else None
    }.toMap
    val ordered = (1 to leng).map(p =>
      emissions.getOrElse(p,
        throw new IllegalArgumentException(s"missing match line for position $p")))
      .toVector
    HmmModel(name, leng, alphabet, ordered)
  }

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** Per-position logo columns from a parsed model. */
  def logo(m: HmmModel): Vector[LogoColumn] =
    m.matchEmissions.zipWithIndex.map { case (scores, i) =>
      val ps = scores.map(s => if (s.isInfinite) 0.0 else math.exp(-s))
      val ic = math.max(0.0,
        log2(m.alphabet.length) +
          ps.filter(_ > 0.0).map(p => p * log2(p)).sum)
      LogoColumn(i + 1,
        ic, m.alphabet.zip(ps.map(_ * ic)).toMap)
    }

  /** Distributed wrapper: parse a column of HMM texts per partition —
    * the reference does this per blob row under a process pool; here
    * the partition boundary amortizes nothing (the parser is cheap)
    * but keeps the shape ready for a real per-partition model cache.
    */
  def logoFrame(models: Dataset[(String, String)]): DataFrame = {
    val spark = models.sparkSession
    import spark.implicits._
    models.mapPartitions(_.flatMap { case (acc, text) =>
      val m = parse(text)
      logo(m).map(c => (acc, c.position, c.infoContent,
        c.heights.toSeq.sortBy(_._1).map { case (ch, h) =>
          s"$ch:${math.rint(h * 1e6) / 1e6}"
        }.mkString(",")))
    }).toDF("acc", "position", "info_content", "heights")
  }
}
