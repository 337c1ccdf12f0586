package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media travels as an opaque `binary`
  * column; decode / feature-extract runs per partition so a real codec
  * (image decode, audio resample, frame sampling) drops in without
  * changing the plan shape. Image bytes decode for REAL via the JDK's
  * own codecs (javax.imageio: PNG/GIF/BMP/JPEG) and WAV audio decodes
  * for REAL via javax.sound.sampled — no external library either way;
  * bytes no JDK codec recognizes fall back to the clearly-marked
  * deterministic STUB, which remains the seam where video codecs
  * (absent from the JDK) would drop in. Everything around the seam
  * (schema, encoders, per-partition batching, null handling) is real
  * and tested either way.
  */
object Multimodal {

  /** Typed decode output: media metadata + a fixed-length feature
    * vector (stand-in for e.g. a thumbnail embedding or audio MFCCs).
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, features: Array[Float])

  val featuresSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Real image decode through the JDK's ImageIO (PNG/GIF/BMP/JPEG).
    * Features = mean luminance (0..1) of 8 horizontal bands —
    * deterministic for lossless formats. A cheap magic-byte probe
    * rejects non-image blobs before any reader spins up, so the
    * text-derived test corpus pays four byte comparisons, not an
    * ImageIO round trip. None → caller falls back to the stub seam.
    */
  private[ops] def decodeImage(blob: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    def sig(off: Int, bs: Int*) =
      blob.length > off + bs.length &&
        bs.zipWithIndex.forall { case (b, i) => (blob(off + i) & 0xFF) == b }
    val looksImage = sig(0, 0x89, 'P', 'N', 'G') || sig(0, 'G', 'I', 'F', '8') ||
      sig(0, 'B', 'M') || sig(0, 0xFF, 0xD8, 0xFF)
    if (!looksImage) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](8)
        val cnts = new Array[Long](8)
        var y = 0
        while (y < h) {
          val band = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sums(band) += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            cnts(band) += 1
            x += 1
          }
          y += 1
        }
        val feats = Array.tabulate(8)(i =>
          if (cnts(i) == 0) 0f
          else (sums(i).toDouble / (cnts(i) * 765.0)).toFloat)
        Some((w, h, feats))
      }
    } catch { case _: Exception => None } // truncated/corrupt image bytes
  }

  /** STUB media decode (the fallback half of the seam). A real
    * implementation would parse the codec header and decode
    * pixels/samples — images already do (decodeImage above); this
    * derives deterministic fake dimensions and features from the bytes
    * so audio/video-shaped blobs keep flowing and tests are stable.
    */
  private[ops] def decodeStub(blob: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = blob.length
    val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(blob(0)) % 64)
    val h = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(blob(1)) % 64)
    val feats = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc += java.lang.Byte.toUnsignedInt(blob(j)); j += 8 }
      (acc % 1000).toFloat / 1000f
    }
    (w, h, feats)
  }

  /** Typed audio decode output: real header metadata + 8-band RMS
    * loudness over the PCM frames (the audio analogue of the image
    * band-luminance features).
    */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, rms: Array[Double],
                           band_sumsq: Array[Long])

  /** Real WAV decode through the JDK's own codec
    * (javax.sound.sampled.AudioSystem — no external library): RIFF
    * magic probe, header parse, then one pass over the 16-bit PCM
    * frames accumulating per-band sum-of-squares in exact Long math;
    * band b of frame i is i*8/n (the same integer bucketing as the
    * frame sampler, so the SQL oracle reproduces it exactly).
    * RMS_b = sqrt(sumsq_b / cnt_b); the raw per-band sum-of-squares
    * rides along as EXACT Longs — that integer form is what the hash
    * oracle compares (a rounded double can land on a decimal-rounding
    * boundary where Spark's shortest-repr rounding and the oracle's
    * exact-binary rounding disagree by one ulp — observed once in
    * 1.2M band values at 30x). None → caller falls back to the stub
    * seam (truncated/corrupt/non-WAV bytes).
    */
  private[ops] def decodeAudio(blob: Array[Byte])
      : Option[(Int, Int, Long, Array[Double], Array[Long])] = {
    def sig(off: Int, s: String) =
      blob.length >= off + s.length &&
        s.zipWithIndex.forall { case (c, i) => blob(off + i) == c.toByte }
    if (!(sig(0, "RIFF") && sig(8, "WAVE"))) return None
    try {
      val ais = getWavStream(new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
        val channels = fmt.getChannels
        val frameSize = fmt.getFrameSize
        val n = ais.getFrameLength
        if (n <= 0) return None
        val bytes = ais.readAllBytes()
        if (bytes.length < n * frameSize) return None
        val sumsq = new Array[Long](8)
        val cnts = new Array[Long](8)
        var i = 0L
        while (i < n) {
          val band = (i * 8 / n).toInt
          // first channel of the frame, little-endian 16-bit signed
          val off = (i * frameSize).toInt
          val v = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toLong
          sumsq(band) += v * v
          cnts(band) += 1
          i += 1
        }
        val rms = Array.tabulate(8)(b =>
          if (cnts(b) == 0) 0.0
          else math.sqrt(sumsq(b).toDouble / cnts(b)))
        Some((fmt.getSampleRate.toInt, channels, n, rms, sumsq))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** The JDK's registered audio readers, resolved ONCE per JVM via
    * the public SPI: `AudioSystem.getAudioInputStream` re-walks the
    * provider registry (and pays an UnsupportedAudioFileException per
    * non-matching provider) on EVERY call — measurable at corpus
    * scale where the decode runs per row. The WAV-accepting reader is
    * tried first; the full AudioSystem path remains the fallback so
    * behavior is identical for any provider ordering.
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    // WAVE reader first: every blob this engine decodes is RIFF-probed
    b.result().sortBy(r => !r.getClass.getName.toLowerCase.contains("wave"))
  }

  private def getWavStream(in: java.io.ByteArrayInputStream)
      : javax.sound.sampled.AudioInputStream = {
    audioReaders.foreach { r =>
      try return r.getAudioInputStream(in)
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException =>
          in.reset()
      }
    }
    javax.sound.sampled.AudioSystem.getAudioInputStream(in)
  }

  /** Deterministic 16-bit mono PCM WAV synthesis from an id — the
    * test corpus has no real audio, so "audio" blobs are sawtooth
    * waves whose length/step/phase derive from the id in pure integer
    * math (sample i = ((phase + i·step) mod 65536) − 32768). The
    * bytes are a fully valid canonical 44-byte-header WAV that the
    * JDK codec parses for real; the integer waveform is what lets the
    * SQL oracle recompute the decoded RMS exactly.
    */
  private[ops] def synthWav(id: Long): Array[Byte] = {
    val n = (800 + id % 200).toInt
    val step = 40 + id % 50
    val phase = (id * 7) % 65536
    val sampleRate = 8000
    val data = new Array[Byte](44 + n * 2)
    def le32(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
      data(off + 2) = (v >> 16).toByte; data(off + 3) = (v >> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.zipWithIndex.foreach { case (c, i) => data(off + i) = c.toByte }
    tag(0, "RIFF"); le32(4, 36 + n * 2); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, sampleRate); le32(28, sampleRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, n * 2)
    var i = 0
    while (i < n) {
      val v = (((phase + i * step) % 65536) - 32768).toInt
      le16(44 + i * 2, v & 0xFFFF)
      i += 1
    }
    data
  }

  /** Gated variant of [[synthWav]]: the same sawtooth, but samples in
    * "silent" 100-sample windows are zeroed — window w of doc id is
    * silent iff (id*3 + w) mod 5 < 2 (40% silence, pattern varies per
    * doc). Pure integer math again, so the SQL oracle regenerates the
    * exact waveform the JDK codec must decode; the silence windows
    * give the VAD-style segmentation op something real to find.
    */
  private[ops] def synthGatedWav(id: Long): Array[Byte] = {
    val wav = synthWav(id)
    val n = (800 + id % 200).toInt
    var i = 0
    while (i < n) {
      if ((id * 3 + i / 100) % 5 < 2) {
        wav(44 + i * 2) = 0
        wav(44 + i * 2 + 1) = 0
      }
      i += 1
    }
    wav
  }

  def synthGatedWavBlobs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthGatedWav(id))))
      .toDF("doc_id", "blob")
  }

  /** Synthesized WAV blob column for an id frame — per-row, no
    * shuffle; stands in for reading real audio files at scale.
    */
  def synthWavBlobs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthWav(id))))
      .toDF("doc_id", "blob")
  }

  /** Per-partition audio decode (the real half of the audio seam).
    * Non-WAV bytes flow through with zeroed metadata and an empty
    * band list rather than failing the batch.
    */
  def decodeAudioFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioFeatures]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        // a heavier codec/model would initialize once per partition here
        it.map { case (id, blob) =>
          val bytes = if (blob == null) Array.empty[Byte] else blob
          decodeAudio(bytes) match {
            case Some((sr, ch, n, rms, sq)) =>
              AudioFeatures(id, sr, ch, n, rms, sq)
            case None =>
              AudioFeatures(id, 0, 0, bytes.length, Array.empty, Array.empty)
          }
        }
      }
      .toDF()
  }

  case class AudioWindow(doc_id: Long, w: Long, n_samples: Long,
                         sumsq: Long)

  /** Per-WINDOW energy over the decoded PCM (the real JDK codec path
    * of [[decodeAudio]], re-bucketed to fixed `win`-sample windows
    * instead of 8 relative bands): one row per window with its exact
    * Long sum-of-squares — the primitive a VAD/silence-trim stage
    * thresholds. One decode pass, flatMap fan-out, no shuffle; the
    * integer energies are what the hash oracle compares (the
    * multimodal_audio float discipline).
    */
  def decodeAudioWindows(df: DataFrame, win: Int): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioWindow]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .flatMap { case (id, blob) =>
        val bytes = if (blob == null) Array.empty[Byte] else blob
        decodeAudioPcm(bytes) match {
          case None => Iterator.empty
          case Some(pcm) =>
            val nw = (pcm.length + win - 1) / win
            Iterator.tabulate(nw) { w =>
              var sq = 0L
              var i = w * win
              val end = math.min(i + win, pcm.length)
              val cnt = end - i
              while (i < end) { sq += pcm(i).toLong * pcm(i); i += 1 }
              AudioWindow(id, w.toLong, cnt.toLong, sq)
            }
        }
      }
      .toDF()
  }

  /** First-channel 16-bit PCM samples through the JDK codec (shared
    * decode core for the feature and window paths).
    */
  private def decodeAudioPcm(blob: Array[Byte]): Option[Array[Short]] = {
    def sig(off: Int, s: String) =
      blob.length >= off + s.length &&
        s.zipWithIndex.forall { case (c, i) => blob(off + i) == c.toByte }
    if (!(sig(0, "RIFF") && sig(8, "WAVE"))) return None
    try {
      val ais = getWavStream(new java.io.ByteArrayInputStream(blob))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return None
        val frameSize = fmt.getFrameSize
        val n = ais.getFrameLength
        if (n <= 0) return None
        val bytes = ais.readAllBytes()
        if (bytes.length < n * frameSize) return None
        val out = new Array[Short](n.toInt)
        var i = 0
        while (i < n) {
          val off = i * frameSize
          out(i) = ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort
          i += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** One sampled "frame" of a media blob: the video-style one-to-many
    * fan-out (doc → k frames), each frame summarized by its byte span.
    */
  case class FrameSample(doc_id: Long, frame_no: Int, n_bytes: Int,
                         checksum: Long)

  /** STUB frame sampling: position p belongs to frame p*k/n (integer
    * math), mirroring what a real sampler's time-bucketing would do;
    * a real implementation would seek keyframes and decode. The
    * flatMap one-to-many shape, schema and partition-local batching
    * are the real parts.
    */
  def frameSample(df: DataFrame, k: Int): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[FrameSample]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .flatMap { case (id, blob) =>
        val bytes = if (blob == null) Array.empty[Byte] else blob
        val n = bytes.length
        if (n == 0) Iterator.empty
        else {
          val counts = Array.fill(k)(0)
          val sums = Array.fill(k)(0L)
          var p = 0
          while (p < n) {
            val f = (p.toLong * k / n).toInt
            counts(f) += 1
            sums(f) += java.lang.Byte.toUnsignedInt(bytes(p))
            p += 1
          }
          (0 until k).iterator.filter(counts(_) > 0)
            .map(f => FrameSample(id, f, counts(f), sums(f) % 1000))
        }
      }
      .toDF()
  }

  /** A "resized" media summary: stride-downsampled bytes standing in
    * for pixel resampling (real impl: decode, scale, re-encode).
    */
  case class Resized(doc_id: Long, out_w: Int, out_h: Int, n_sampled: Int,
                     checksum: Long)

  /** STUB resize: sample every k-th byte with k = ceil(n/64) (so at
    * most 64 samples — an "8x8 thumbnail"), summarize by count and
    * checksum. The per-partition batching and schema are the real
    * parts; a codec would replace the sampler.
    */
  def resize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[Resized]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.map { case (id, blob) =>
        val bytes = if (blob == null) Array.empty[Byte] else blob
        val n = bytes.length
        val k = math.max(1, (n + 63) / 64)
        var p = 0
        var cnt = 0
        var sum = 0L
        while (p < n) {
          cnt += 1
          sum += java.lang.Byte.toUnsignedInt(bytes(p))
          p += k
        }
        Resized(id, 8, 8, cnt, sum % 1000)
      })
      .toDF()
  }

  /** Per-partition decode: one pass over each partition's rows, no
    * shuffle; input columns (doc_id, blob). The partition boundary is
    * where a real decoder would amortize codec/model initialization.
    */
  /** (doc_id, sig) — 64-bit block-mean perceptual hash as a '0'/'1'
    * string: the blob is split into 64 positional buckets and bit b is
    * set iff bucket b's byte mean exceeds the whole-blob mean (the
    * pHash/blockhash family; a real implementation hashes decoded
    * pixel blocks — this hashes the canonical byte stream, same
    * plumbing). The mean comparison is cross-multiplied so the kernel
    * is pure integer math (sum_b·n > total·cnt_b) and the SQL oracle
    * reproduces it exactly. Empty blobs must be filtered upstream.
    */
  case class PHash(doc_id: Long, sig: String)

  def perceptualHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[PHash]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.map { case (id, blob) =>
        val bytes = if (blob == null) Array.empty[Byte] else blob
        val n = bytes.length
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var tot = 0L
        var p = 0
        while (p < n) {
          val b = (p.toLong * 64 / n).toInt
          val v = java.lang.Byte.toUnsignedInt(bytes(p))
          sums(b) += v; cnts(b) += 1; tot += v
          p += 1
        }
        val sb = new java.lang.StringBuilder(64)
        var b = 0
        while (b < 64) {
          sb.append(if (sums(b) * n > tot * cnts(b)) '1' else '0')
          b += 1
        }
        PHash(id, sb.toString)
      })
      .toDF()
  }

  def decodeFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    df.select("doc_id", "blob").as(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        // heavier codecs/models would initialize once per partition here
        it.map { case (id, blob) =>
          val bytes = if (blob == null) Array.empty[Byte] else blob
          val (w, h, f) = decodeImage(bytes).getOrElse(decodeStub(bytes))
          MediaFeatures(id, bytes.length, w, h, f)
        }
      }
      .toDF()
  }
}
