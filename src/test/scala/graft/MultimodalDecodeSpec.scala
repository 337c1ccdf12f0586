package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

/** The real half of the multimodal decode seam: JDK-codec image bytes
  * (PNG/BMP/GIF) decode to their true dimensions and band-luminance
  * features through the same `decodeFeatures` pipeline the
  * `multimodal_decode` query runs; non-image bytes still take the
  * deterministic stub path (which the DuckDB oracle replicates).
  */
class MultimodalDecodeSpec extends SparkSpec {

  /** 32×64 vertical gradient: black at the top to white at the bottom,
    * so band luminance must be strictly increasing.
    */
  private def gradient(): BufferedImage = {
    val img = new BufferedImage(32, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 32) {
      val v = y * 255 / 63
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK cannot write $fmt")
    bos.toByteArray
  }

  test("PNG/BMP/GIF bytes decode to real dimensions and ordered band luminance") {
    import spark.implicits._
    val img = gradient()
    val blobs = Seq("png", "bmp", "gif").zipWithIndex.map { case (fmt, i) =>
      (i.toLong, encode(img, fmt))
    }
    val out = graft.ops.Multimodal
      .decodeFeatures(blobs.toDF("doc_id", "blob"))
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getInt(2) === 32 && r.getInt(3) === 64,
        s"real dimensions expected, got ${r.getInt(2)}x${r.getInt(3)}")
      val feats = r.getSeq[Float](4)
      assert(feats.length === 8)
      // vertical black→white gradient: every band brighter than the last
      assert(feats.sliding(2).forall { case Seq(a, b) => a < b },
        s"band luminance not increasing: $feats")
      assert(feats.head < 0.1f && feats.last > 0.9f)
    }
  }

  test("non-image bytes fall back to the stub (oracle-replicated) path") {
    import spark.implicits._
    val text = "just some utf-8 text, not an image".getBytes("UTF-8")
    val viaPipeline = graft.ops.Multimodal
      .decodeFeatures(Seq((7L, text)).toDF("doc_id", "blob")).collect().head
    // stub width/height derive from the first two bytes
    assert(viaPipeline.getInt(2) === 16 + (text(0) & 0xFF) % 64)
    assert(viaPipeline.getInt(3) === 16 + (text(1) & 0xFF) % 64)
  }

  test("synthesized WAV bytes decode through the JDK codec to true header metadata") {
    import spark.implicits._
    val out = graft.ops.Multimodal.decodeAudioFeatures(
        graft.ops.Multimodal.synthWavBlobs(
          Seq(3L, 17L, 199L).toDF("doc_id")))
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000, "sample rate from the parsed header")
      assert(r.getInt(2) === 1, "mono")
      assert(r.getLong(3) === 800 + id % 200, "frame count from the header")
      val rms = r.getSeq[Double](4)
      assert(rms.length === 8)
      // exact differential: recompute the sawtooth RMS directly from
      // the synthesis formula — the decoded bands must match to the
      // last bit (integer sums, one double division, one sqrt)
      val n = (800 + id % 200).toInt
      val step = 40 + id % 50
      val phase = (id * 7) % 65536
      val sumsq = new Array[Long](8)
      val cnts = new Array[Long](8)
      for (i <- 0 until n) {
        val v = ((phase + i * step) % 65536) - 32768
        val b = i * 8 / n
        sumsq(b) += v * v; cnts(b) += 1
      }
      val want = (0 until 8).map(b => math.sqrt(sumsq(b).toDouble / cnts(b)))
      assert(rms === want, s"decoded $rms vs synthesized $want")
    }
  }

  test("a hand-built constant-signal WAV decodes to the exact known RMS") {
    import spark.implicits._
    // patch the synthesized blob's data section to a constant 1000:
    // RMS of every band must be exactly 1000.0
    val blob = {
      val b = graft.ops.Multimodal.synthWavBlobs(Seq(0L).toDF("doc_id"))
        .collect().head.getAs[Array[Byte]]("blob")
      var i = 44
      while (i < b.length) { b(i) = (1000 & 0xFF).toByte; b(i + 1) = (1000 >> 8).toByte; i += 2 }
      b
    }
    val r = graft.ops.Multimodal.decodeAudioFeatures(
      Seq((1L, blob)).toDF("doc_id", "blob")).collect().head
    assert(r.getSeq[Double](4).forall(_ === 1000.0))
  }

  test("non-WAV and truncated WAV bytes fall back without crashing") {
    import spark.implicits._
    val wav = graft.ops.Multimodal.synthWavBlobs(Seq(5L).toDF("doc_id"))
      .collect().head.getAs[Array[Byte]]("blob")
    val rows = graft.ops.Multimodal.decodeAudioFeatures(
        Seq((1L, "not audio".getBytes("UTF-8")), (2L, wav.take(50)))
          .toDF("doc_id", "blob"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getInt(1) === 0 && r.getSeq[Double](4).isEmpty,
        "fallback path must zero the metadata")
    }
  }

  test("truncated image bytes do not crash the pipeline") {
    import spark.implicits._
    val broken = encode(gradient(), "png").take(20) // valid magic, cut body
    val row = graft.ops.Multimodal
      .decodeFeatures(Seq((9L, broken)).toDF("doc_id", "blob")).collect().head
    assert(row.getInt(1) === 20) // flowed through the stub fallback
  }
}
