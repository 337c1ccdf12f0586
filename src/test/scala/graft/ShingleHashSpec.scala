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

  test("short inputs yield an empty window array") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "toks")
    assert(df.select(size(call_function("shingle_hash52", col("toks"), lit(5))))
      .head().getInt(0) === 0)
  }
}
