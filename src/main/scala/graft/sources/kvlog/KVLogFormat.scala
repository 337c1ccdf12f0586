package graft.sources.kvlog

import org.apache.spark.sql.types._

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

/** On-disk codec for the graft KV log — the Spark-native re-design of
  * the reference's sorted key-value store (utils/store.py:113-127: an
  * offset header, zlib-pickled key buckets, and a trailing
  * (key, offset) index loaded before access; range reads walk only the
  * buckets the index points at).
  *
  * Differences are deliberate Spark-first choices, not omissions:
  *  - records are typed rows under a DDL schema written into the
  *    footer (pickle is single-language and schema-less);
  *  - the footer sits at the END (parquet-style: data, footer, footer
  *    length, magic) so writers stream append-only — no seek-back
  *    header patch, which object stores and HDFS output streams
  *    disallow;
  *  - one file per write task, so a directory of part files carries
  *    the cluster-wide sort (the reference merges worker temp files
  *    into one file on one machine — the single-node bottleneck this
  *    design removes).
  *
  * File layout:
  * {{{
  *   MAGIC(4) | bucket* | footer | footerLen(4) | MAGIC(4)
  *   bucket  := gzip( record* )
  *   record  := field*                  (schema order)
  *   footer  := schemaDDL, rowCount, bucketMeta*
  * }}}
  * Buckets hold `bucketSize` consecutive records of the task's
  * key-sorted stream; the footer records each bucket's byte range and
  * [minKey, maxKey], which is what makes key-range scans skip whole
  * buckets without decompressing them.
  */
object KVLogFormat {

  // GKV2 added the per-bucket key bloom to the footer layout; bumping
  // the magic makes a pre-bloom file fail loudly at open ("bad magic")
  // instead of the footer parser silently misaligning on the missing
  // field. The empty-bloom never-prunes path stays for writers that
  // legitimately skip blooms.
  val Magic: Array[Byte] = "GKV2".getBytes(StandardCharsets.US_ASCII)

  /** Min/max of one non-key field inside one bucket, nulls excluded;
    * (null, null) means every value in the bucket was null (or stats
    * were not collected) — such a stat never prunes.
    */
  final case class ColStat(min: Any, max: Any) {
    def defined: Boolean = min != null && max != null
  }

  /** (offset, length, rows, minKey, maxKey) of one gzip bucket, plus
    * optional per-non-key-field [min, max] stats (schema order,
    * fields 1..n-1) so NON-key predicates can prune buckets too —
    * the same role parquet column chunk statistics play — and an
    * optional key bloom filter (empty = absent) so a point lookup for
    * a key inside a bucket's range but not in the bucket skips the
    * gzip decompression entirely.
    */
  final case class BucketMeta(offset: Long, length: Long, rows: Long,
                              minKey: String, maxKey: String,
                              colStats: Seq[ColStat] = Seq.empty,
                              bloom: scala.collection.immutable.ArraySeq[Byte] =
                                scala.collection.immutable.ArraySeq.empty)

  // ---- per-bucket key bloom filter ---------------------------------

  /** 2048-bit bloom, 3 probes via md5 double hashing: with the default
    * 4096-row buckets the false-positive rate is ~7% — a negative
    * point lookup skips the bucket >90% of the time, and a false
    * positive only costs the decompression the reader did before
    * blooms existed. Conservative like every other pruning structure
    * here: an absent bloom never prunes.
    */
  val BloomBytes = 256
  val BloomProbes = 3

  private def bloomProbe(key: String): Array[Int] = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    def int(o: Int) =
      ((d(o) & 0xff) << 24) | ((d(o + 1) & 0xff) << 16) |
        ((d(o + 2) & 0xff) << 8) | (d(o + 3) & 0xff)
    val a = int(0)
    val b = int(4) | 1 // odd step so probes cycle the whole table
    Array.tabulate(BloomProbes)(i =>
      math.floorMod(a + i * b, BloomBytes * 8))
  }

  def bloomAdd(bits: Array[Byte], key: String): Unit =
    bloomProbe(key).foreach { p =>
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
    }

  def bloomMayContain(b: BucketMeta, key: String): Boolean =
    mayContainProbes(b, bloomProbe(key))

  private def mayContainProbes(b: BucketMeta, probes: Array[Int]): Boolean =
    // a bloom of any length other than BloomBytes (absent, truncated by
    // corruption, or written by a different layout) never prunes —
    // probe positions assume the fixed 2048-bit table, so indexing a
    // shorter array would throw instead of degrading conservatively
    b.bloom.length != BloomBytes || probes.forall { p =>
      (b.bloom(p >>> 3) & (1 << (p & 7))) != 0
    }

  final case class Footer(schema: StructType, rows: Long,
                          buckets: Seq[BucketMeta])

  /** Supported field types — enough for the warehouse's KV payloads;
    * nested values travel as JSON strings (the reference pickles
    * nested dicts; a typed engine keeps nesting explicit).
    */
  def checkSchema(schema: StructType): Unit = {
    require(schema.nonEmpty && schema.head.dataType == StringType,
      s"first field must be the STRING sort key, got ${schema.headOption}")
    schema.fields.foreach { f =>
      f.dataType match {
        case StringType | LongType | IntegerType | DoubleType | BooleanType => ()
        case dt => throw new IllegalArgumentException(
          s"unsupported kvlog field type ${dt.sql} for ${f.name}")
      }
    }
  }

  // ---- record codec -------------------------------------------------
  // Per field: 1 null byte, then a fixed-width value or varlen string.
  // Decode can SKIP a field without materializing it — column pruning
  // costs a seek, not an allocation.

  def writeRecord(out: DataOutputStream, schema: StructType,
                  get: Int => Any): Unit = {
    var i = 0
    while (i < schema.length) {
      val v = get(i)
      if (v == null) out.writeByte(0)
      else {
        out.writeByte(1)
        schema(i).dataType match {
          case StringType =>
            val b = v.toString.getBytes(StandardCharsets.UTF_8)
            out.writeInt(b.length); out.write(b)
          case LongType    => out.writeLong(v.asInstanceOf[Long])
          case IntegerType => out.writeInt(v.asInstanceOf[Int])
          case DoubleType  => out.writeDouble(v.asInstanceOf[Double])
          case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
          case dt => throw new IllegalStateException(dt.sql)
        }
      }
      i += 1
    }
  }

  /** Decode one record into `dest(fieldIndex)` for wanted fields only;
    * returns false at clean EOF (bucket exhausted).
    */
  def readRecord(in: DataInputStream, schema: StructType,
                 wanted: Array[Boolean], dest: Array[Any]): Boolean = {
    val first =
      try in.read()
      catch { case _: EOFException => -1 }
    if (first < 0) return false
    var i = 0
    while (i < schema.length) {
      val present = if (i == 0) first else in.readByte().toInt
      if (present == 0) { if (wanted(i)) dest(i) = null }
      else schema(i).dataType match {
        case StringType =>
          val len = in.readInt()
          if (wanted(i)) {
            val b = new Array[Byte](len); in.readFully(b)
            dest(i) = new String(b, StandardCharsets.UTF_8)
          } else in.skipNBytes(len.toLong)
        case LongType =>
          if (wanted(i)) dest(i) = in.readLong() else in.skipNBytes(8)
        case IntegerType =>
          if (wanted(i)) dest(i) = in.readInt() else in.skipNBytes(4)
        case DoubleType =>
          if (wanted(i)) dest(i) = in.readDouble() else in.skipNBytes(8)
        case BooleanType =>
          if (wanted(i)) dest(i) = in.readBoolean() else in.skipNBytes(1)
        case dt => throw new IllegalStateException(dt.sql)
      }
      i += 1
    }
    true
  }

  // ---- footer codec -------------------------------------------------

  private def writeTyped(d: DataOutputStream, dt: DataType, v: Any): Unit =
    dt match {
      case StringType =>
        val b = v.toString.getBytes(StandardCharsets.UTF_8)
        d.writeInt(b.length); d.write(b)
      case LongType    => d.writeLong(v.asInstanceOf[Long])
      case IntegerType => d.writeInt(v.asInstanceOf[Int])
      case DoubleType  => d.writeDouble(v.asInstanceOf[Double])
      case BooleanType => d.writeBoolean(v.asInstanceOf[Boolean])
      case other       => throw new IllegalStateException(other.sql)
    }

  private def readTyped(in: DataInputStream, dt: DataType): Any = dt match {
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    case LongType    => in.readLong()
    case IntegerType => in.readInt()
    case DoubleType  => in.readDouble()
    case BooleanType => in.readBoolean()
    case other       => throw new IllegalStateException(other.sql)
  }

  def writeFooter(out: DataOutputStream, f: Footer): Int = {
    val buf = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(buf)
    val ddl = f.schema.toDDL.getBytes(StandardCharsets.UTF_8)
    d.writeInt(ddl.length); d.write(ddl)
    d.writeLong(f.rows)
    d.writeInt(f.buckets.length)
    f.buckets.foreach { b =>
      d.writeLong(b.offset); d.writeLong(b.length); d.writeLong(b.rows)
      val mn = b.minKey.getBytes(StandardCharsets.UTF_8)
      val mx = b.maxKey.getBytes(StandardCharsets.UTF_8)
      d.writeInt(mn.length); d.write(mn)
      d.writeInt(mx.length); d.write(mx)
      // column stats: count, then per stat a presence byte + typed
      // min/max; stat i describes schema field i+1 (the non-key tail)
      d.writeInt(b.colStats.length)
      b.colStats.zipWithIndex.foreach { case (cs, i) =>
        if (!cs.defined) d.writeByte(0)
        else {
          d.writeByte(1)
          val dt = f.schema(i + 1).dataType
          writeTyped(d, dt, cs.min)
          writeTyped(d, dt, cs.max)
        }
      }
      d.writeInt(b.bloom.length); d.write(b.bloom.toArray)
    }
    d.flush()
    out.write(buf.toByteArray)
    buf.size()
  }

  def readFooter(bytes: Array[Byte]): Footer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    def str(): String = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      new String(b, StandardCharsets.UTF_8)
    }
    val schema = StructType.fromDDL(str())
    val rows = in.readLong()
    val buckets = Seq.fill(in.readInt()) {
      val (off, len, n) = (in.readLong(), in.readLong(), in.readLong())
      val (mn, mx) = (str(), str())
      val stats = Seq.tabulate(in.readInt()) { i =>
        if (in.readByte() == 0) ColStat(null, null)
        else {
          val dt = schema(i + 1).dataType
          ColStat(readTyped(in, dt), readTyped(in, dt))
        }
      }
      val bloom = new Array[Byte](in.readInt())
      in.readFully(bloom)
      BucketMeta(off, len, n, mn, mx, stats,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bloom))
    }
    Footer(schema, rows, buckets)
  }

  // ---- key-range bucket pruning ------------------------------------

  /** UTF-8 binary string comparison — the order Spark's UTF8String
    * uses to evaluate string predicates. Pruning decisions MUST use
    * the engine's own collation: Java's UTF-16 `<` disagrees for
    * supplementary characters (a surrogate pair sorts above U+E000 in
    * UTF-8 bytes but below it in UTF-16 code units), and a pruned
    * bucket is never decompressed, so a collation mismatch silently
    * loses rows. Identical to Java order for pure-ASCII keys.
    */
  def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
  def utf8Lt(a: String, b: String): Boolean = utf8Cmp(a, b) < 0

  /** Inclusive-bound key range; None = unbounded. UTF-8 order. */
  final case class KeyRange(lower: Option[String], upper: Option[String]) {
    def overlaps(b: BucketMeta): Boolean =
      lower.forall(utf8Cmp(_, b.maxKey) <= 0) &&
        upper.forall(utf8Cmp(_, b.minKey) >= 0)
    def contains(k: String): Boolean =
      lower.forall(utf8Cmp(_, k) <= 0) && upper.forall(utf8Cmp(_, k) >= 0)
  }
  val FullRange: KeyRange = KeyRange(None, None)

  /** The buckets a key-range scan must decompress — the v2 reader's
    * pruning decision, kept pure so the spec can test it directly
    * (mirrors KVStore.range's bisect over the index,
    * utils/store.py:173-211).
    */
  def selectBuckets(buckets: Seq[BucketMeta], r: KeyRange): Seq[BucketMeta] = {
    // a point lookup (lower == upper) additionally consults the key
    // bloom: inside-range-but-absent keys skip the bucket entirely.
    // Probe positions are digested ONCE, not per bucket.
    val probes = r.lower.filter(l => r.upper.contains(l)).map(bloomProbe)
    buckets.filter(b =>
      r.overlaps(b) && probes.forall(mayContainProbes(b, _)))
  }

  // ---- non-key column-stat pruning ---------------------------------

  /** One pushed comparison on a NON-key field; `op` is one of
    * eq/gt/ge/lt/le. Values are the plain JVM forms of the supported
    * field types, so the case class serializes into the input
    * partition as-is.
    */
  final case class ColPred(field: String, op: String, value: Any)

  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType  => utf8Cmp(a.toString, b.toString)
    case LongType    =>
      java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue())
    case IntegerType =>
      java.lang.Integer.compare(a.asInstanceOf[Number].intValue(),
        b.asInstanceOf[Number].intValue())
    case DoubleType  =>
      java.lang.Double.compare(a.asInstanceOf[Number].doubleValue(),
        b.asInstanceOf[Number].doubleValue())
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean],
        b.asInstanceOf[Boolean])
    case other => throw new IllegalStateException(other.sql)
  }

  /** Can any row of `b` satisfy `p`? Conservative: missing stats (old
    * or all-null bucket, unknown field) never prune. Like key-range
    * pruning this is a performance contract only — every pushed filter
    * is also a residual Spark re-evaluates exactly.
    */
  def mayContain(schema: StructType, b: BucketMeta, p: ColPred): Boolean = {
    val idx = schema.fieldNames.indexOf(p.field)
    if (idx <= 0 || idx - 1 >= b.colStats.length) return true
    val cs = b.colStats(idx - 1)
    if (!cs.defined) return true
    val dt = schema(idx).dataType
    p.op match {
      case "eq" => cmp(dt, cs.min, p.value) <= 0 && cmp(dt, cs.max, p.value) >= 0
      case "gt" => cmp(dt, cs.max, p.value) > 0
      case "ge" => cmp(dt, cs.max, p.value) >= 0
      case "lt" => cmp(dt, cs.min, p.value) < 0
      case "le" => cmp(dt, cs.min, p.value) <= 0
      case _    => true
    }
  }

  def selectBuckets(buckets: Seq[BucketMeta], r: KeyRange,
                    schema: StructType,
                    preds: Seq[ColPred]): Seq[BucketMeta] =
    selectBuckets(buckets, r)
      .filter(b => preds.forall(mayContain(schema, b, _)))

  def readAllBytes(in: InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    buf.toByteArray
  }
}
