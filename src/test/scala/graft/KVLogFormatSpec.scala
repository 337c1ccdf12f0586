package graft

import graft.sources.kvlog.KVLogFormat
import graft.sources.kvlog.KVLogFormat._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.util.Random

/** Pure-codec properties of the graft KV log: record round-trips under
  * arbitrary projection masks, footer round-trips, and bucket-pruning
  * soundness (never drops an overlapping bucket).
  */
class KVLogFormatSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("key", StringType), StructField("n", LongType),
    StructField("i", IntegerType), StructField("d", DoubleType),
    StructField("b", BooleanType)))

  private def randRecord(rnd: Random): Array[Any] = {
    def opt[T](v: => T): Any = if (rnd.nextInt(4) == 0) null else v
    Array[Any](
      "k" + rnd.alphanumeric.take(rnd.nextInt(12)).mkString,
      opt(rnd.nextLong()), opt(rnd.nextInt()),
      opt(rnd.nextDouble() * 1e12 - 5e11), opt(rnd.nextBoolean()))
  }

  test("property: records round-trip under any projection mask") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val recs = Seq.fill(rnd.nextInt(30) + 1)(randRecord(rnd))
      val mask = Array.fill(5)(rnd.nextBoolean())
      val buf = new ByteArrayOutputStream()
      val out = new DataOutputStream(buf)
      recs.foreach(r => writeRecord(out, schema, i => r(i)))
      out.flush()
      val in = new DataInputStream(new ByteArrayInputStream(buf.toByteArray))
      val dest = new Array[Any](5)
      recs.foreach { r =>
        java.util.Arrays.fill(dest.asInstanceOf[Array[AnyRef]], null)
        assert(readRecord(in, schema, mask, dest))
        (0 until 5).foreach { i =>
          if (mask(i)) assert(dest(i) === r(i), s"field $i mask ${mask.toSeq}")
        }
      }
      assert(!readRecord(in, schema, mask, dest)) // clean EOF
    }
  }

  test("a malformed bloom never prunes") {
    def meta(bloom: scala.collection.immutable.ArraySeq[Byte]) =
      BucketMeta(0L, 1L, 1L, "a", "z", Seq.empty, bloom)
    // absent and wrong-length blooms (corrupt footer, foreign writer)
    // must degrade to "may contain" — indexing them would throw
    assert(bloomMayContain(meta(scala.collection.immutable.ArraySeq.empty[Byte]), "k"))
    assert(bloomMayContain(
      meta(scala.collection.immutable.ArraySeq.unsafeWrapArray(new Array[Byte](10))), "k"))
    // a well-formed all-zero bloom DOES prune (no key was ever added)
    assert(!bloomMayContain(
      meta(scala.collection.immutable.ArraySeq.unsafeWrapArray(
        new Array[Byte](KVLogFormat.BloomBytes))), "k"))
    // and a well-formed bloom keeps its added keys
    val bits = new Array[Byte](KVLogFormat.BloomBytes)
    KVLogFormat.bloomAdd(bits, "present")
    assert(bloomMayContain(
      meta(scala.collection.immutable.ArraySeq.unsafeWrapArray(bits)), "present"))
  }

  test("property: footers round-trip") {
    val rnd = new Random(7)
    for (_ <- 1 to 100) {
      val metas = Seq.fill(rnd.nextInt(20)) {
        val a = "k" + rnd.alphanumeric.take(6).mkString
        val b = "k" + rnd.alphanumeric.take(6).mkString
        val bloom =
          if (rnd.nextBoolean()) scala.collection.immutable.ArraySeq.empty[Byte]
          else {
            val bits = new Array[Byte](KVLogFormat.BloomBytes)
            (0 until rnd.nextInt(50)).foreach(i =>
              KVLogFormat.bloomAdd(bits, s"k$i"))
            scala.collection.immutable.ArraySeq.unsafeWrapArray(bits)
          }
        BucketMeta(rnd.nextLong().abs % (1L << 40),
          rnd.nextLong().abs % (1L << 20) + 1,
          rnd.nextInt(100000).toLong + 1,
          if (a <= b) a else b, if (a <= b) b else a,
          Seq.empty, bloom)
      }
      val rows = rnd.nextLong().abs % (1L << 40)
      val buf = new ByteArrayOutputStream()
      val len = writeFooter(new DataOutputStream(buf), Footer(schema, rows, metas))
      assert(len === buf.size())
      val back = readFooter(buf.toByteArray)
      assert(back.schema === schema)
      assert(back.rows === rows)
      assert(back.buckets === metas)
    }
  }

  test("property: bucket pruning is sound and tight") {
    val rnd = new Random(13)
    for (_ <- 1 to 300) {
      val metas = Seq.fill(rnd.nextInt(30)) {
        val a = rnd.nextInt(1000); val b = rnd.nextInt(1000)
        BucketMeta(0, 1, 1,
          f"k${math.min(a, b)}%03d", f"k${math.max(a, b)}%03d")
      }
      def bound() = if (rnd.nextBoolean()) Some(f"k${rnd.nextInt(1000)}%03d") else None
      val r = KeyRange(bound(), bound())
      val kept = KVLogFormat.selectBuckets(metas, r)
      // sound: every dropped bucket really has no key in range
      metas.diff(kept).foreach { m =>
        assert(r.lower.exists(_ > m.maxKey) || r.upper.exists(_ < m.minKey))
      }
      // tight: every kept bucket overlaps the range
      kept.foreach(m => assert(r.overlaps(m)))
    }
  }
}
