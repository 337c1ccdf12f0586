package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

import scala.util.Random

/** ShingleHash52 must be VALUE-IDENTICAL to the higher-order
  * formulation it replaced in the shingle frame — the oracle SQL
  * derives ids the HOF way, so any drift breaks the whole dedup
  * family's correctness gate.
  */
class ShingleHashSpec extends SparkSpec {

  test("native windows equal the HOF md5/conv formulation on random token arrays") {
    val rnd = new Random(42)
    val rows = (1 to 300).map { i =>
      val n = rnd.nextInt(12) + 5
      val toks = Seq.fill(n)(rnd.nextInt(4) match {
        case 0 => ""                        // empty token (split artifacts)
        case 1 => rnd.alphanumeric.take(1).mkString
        case _ => rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString
      })
      (i.toLong, toks)
    }
    import spark.implicits._
    val df = rows.toDF("id", "toks").filter(size(col("toks")) >= 5)
    val hof = df.select(col("id"),
        explode(TextOps.shingles(col("toks"), 5)).as("g"))
      .select(col("id"), TextOps.minhashX(col("g")).as("s"))
    val native = df.select(col("id"),
      explode(call_function("shingle_hash52", col("toks"), lit(5))).as("s"))
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
    assert(native.count() > 0)
  }

  test("native distinct char trigrams equal the HOF formulation on >=3-char strings") {
    val rnd = new Random(7)
    val rows = (1 to 300).map { i =>
      // small alphabet forces repeats so the distinct paths diverge
      // if first-occurrence order or equality ever drifts
      (i.toLong, Seq.fill(rnd.nextInt(60) + 3)("abc xyz".charAt(rnd.nextInt(7))).mkString)
    }
    import spark.implicits._
    val df = rows.toDF("id", "text")
    val hof = df.select(col("id"), array_distinct(transform(
      sequence(lit(1), length(col("text")) - 2),
      i => col("text").substr(i, lit(3)))).as("tris"))
    val native = df.select(col("id"),
      call_function("char_ngrams_distinct", col("text"), lit(3)).as("tris"))
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
  }

  test("sub-width strings yield an empty trigram array (the oracle semantics)") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("id", "text")
    assert(df.select(size(call_function("char_ngrams_distinct", col("text"), lit(3))))
      .head().getInt(0) === 0)
  }

  test("short inputs yield an empty window array") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    assert(df.select(size(call_function("shingle_hash52", col("toks"), lit(5))))
      .head().getInt(0) === 0)
  }
}
