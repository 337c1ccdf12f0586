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

  test("merge min-offsets items absent from a lossy summary (no under-estimate)") {
    // substream X: k=2 sketch evicts 'b' (true count 5) and forgets it;
    // substream Y sees one more 'b'. A naive count-summing merge would
    // report b=1 against a true total of 6 — the mergeable-summaries
    // composition must add X's min count as offset instead.
    val agg = HeavyHitters.spaceSaving(2)
    val xs = Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(6)("c")
    val ys = Seq("b")
    val truth = (xs ++ ys).groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
    val merged = agg.finish(agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce),
      ys.foldLeft(agg.zero)(agg.reduce)))
    assert(merged.size <= 2)
    merged.foreach { e =>
      val actual = truth(e.token)
      assert(e.count >= actual,
        s"${e.token}: merged est ${e.count} under-counts true $actual")
      assert(e.count - e.err <= actual,
        s"${e.token}: bracket violated (est ${e.count}, err ${e.err}, true $actual)")
    }
    // both directions of the one-sided offset
    val agg2 = HeavyHitters.spaceSaving(2)
    val merged2 = agg2.finish(agg2.merge(
      ys.foldLeft(agg2.zero)(agg2.reduce),
      xs.foldLeft(agg2.zero)(agg2.reduce)))
    merged2.foreach { e =>
      val actual = truth(e.token)
      assert(e.count >= actual && e.count - e.err <= actual, s"${e.token}")
    }
  }

  test("merge of exact (non-lossy) summaries stays exact — no spurious offsets") {
    val agg = HeavyHitters.spaceSaving(8)
    val xs = Seq("a", "a", "b")
    val ys = Seq("c", "c", "c", "a")
    val truth = (xs ++ ys).groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
    val out = agg.finish(agg.merge(
      xs.foldLeft(agg.zero)(agg.reduce),
      ys.foldLeft(agg.zero)(agg.reduce)))
    assert(out.size === 3)
    out.foreach { e =>
      assert(e.err === 0L, s"${e.token}: exact merge must carry zero error")
      assert(e.count === truth(e.token), s"${e.token}")
    }
  }

  test("eviction-heavy regime: vocab >> k, bracket holds and top item survives") {
    // vocabulary far beyond capacity so eviction fires on most tokens —
    // the regime the harness corpus never reaches (31-token vocab)
    val data = skewed(5000, 20000, 7)
    val truth = data.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val agg = HeavyHitters.spaceSaving(64)
    val out = agg.finish(data.foldLeft(agg.zero)(agg.reduce))
    assert(out.size === 64)
    out.foreach { e =>
      val actual = truth(e.token)
      assert(e.count >= actual && e.count - e.err <= actual,
        s"${e.token}: est ${e.count}, err ${e.err}, true $actual")
    }
    assert(out.exists(_.token === "tok000"), "heaviest item evicted")
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
