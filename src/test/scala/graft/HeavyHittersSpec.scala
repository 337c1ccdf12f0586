package graft

import graft.kernels.HeavyHitters
import org.apache.spark.sql.functions._

import scala.util.Random

/** SpaceSaving properties the hash oracle can't state (the oracle
  * only pins the exact regime): the over-estimate bracket on skewed
  * over-capacity streams, exactness under capacity, and stability of
  * the result under different partitionings (mergeability).
  */
class HeavyHittersSpec extends SparkSpec {

  /** zipf-ish stream: token i appears ~N/(i+1) times, shuffled. */
  private def skewed(nTokens: Int, scale: Int, seed: Int): Seq[String] = {
    val items = (0 until nTokens).flatMap(i =>
      Seq.fill(math.max(1, scale / (i + 1)))(f"tok$i%03d"))
    new Random(seed).shuffle(items)
  }

  test("exact regime: under-capacity sketch equals the true counts on any partitioning") {
    import spark.implicits._
    val data = skewed(20, 500, 1)
    val truth = data.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    for (parts <- Seq(1, 7, 32)) {
      val out = data.toDF("value").repartition(parts).as[String]
        .select(HeavyHitters.spaceSaving(64).toColumn).toDF("hh")
        .select(explode(col("hh")).as("e"))
        .select("e.token", "e.count", "e.err")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.length === 20)
      out.foreach { case (t, n, err) =>
        assert(err === 0L, s"exact regime must carry zero error ($t)")
        assert(n === truth(t), s"count drift for $t on $parts partitions")
      }
    }
  }

  test("over-capacity regime: every reported item satisfies true <= est <= true + err") {
    import spark.implicits._
    val data = skewed(60, 2000, 2)
    val truth = data.groupBy(identity)
      .map { case (t, xs) => (t, xs.size.toLong) }
    val out = data.toDF("value").repartition(13).as[String]
      .select(HeavyHitters.spaceSaving(8).toColumn).toDF("hh")
      .select(explode(col("hh")).as("e"))
      .select("e.token", "e.count", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 8)
    out.foreach { case (t, est, err) =>
      val actual = truth(t)
      assert(est >= actual, s"$t: est $est under-counts true $actual")
      assert(est - err <= actual,
        s"$t: bracket violated (est $est, err $err, true $actual)")
    }
    // the stream's heaviest token dominates (scale/1 occurrences) and
    // must survive every merge truncation
    assert(out.exists(_._1 === "tok000"), "top item evicted")
  }

  test("single-partition sequential sketch honors the same bracket") {
    val data = skewed(40, 800, 3)
    val truth = data.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val agg = HeavyHitters.spaceSaving(10)
    val buf = data.foldLeft(agg.zero)(agg.reduce)
    val out = agg.finish(buf)
    assert(out.size <= 10)
    out.foreach { e =>
      val actual = truth(e.token)
      assert(e.count >= actual && e.count - e.err <= actual,
        s"${e.token}: est ${e.count}, err ${e.err}, true $actual")
    }
  }
}
