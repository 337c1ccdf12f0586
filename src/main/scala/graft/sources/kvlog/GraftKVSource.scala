package graft.sources.kvlog

import KVLogFormat._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.UUID
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import scala.jdk.CollectionConverters._

/** DataSource V2 connector for the graft KV log (S6/S7 deepened): the
  * reference's KVStore (utils/store.py:113-241) re-expressed as a real
  * Spark source/sink instead of a driver-side library.
  *
  *  - `spark.read.format("graftkv").load(dir)` plans one input
  *    partition per part file; key-range predicates prune whole gzip
  *    buckets via the footer index (the reference's `range()` bisect,
  *    store.py:173-211), and column pruning skips decode of unwanted
  *    fields (SupportsPushDownFilters / SupportsPushDownRequiredColumns).
  *  - `df.write.format("graftkv").save(dir)` declares
  *    `RequiresDistributionAndOrdering` — clustered + sorted on the
  *    key column — so CATALYST plans the cluster-wide shuffle+sort the
  *    reference implements by hand with worker temp files and a
  *    single-node merge (store.py:262-341). Each task then streams
  *    sorted buckets append-only.
  *
  * Filters are reported as pushed for key-range pruning but also
  * returned as residuals, so Spark re-evaluates them exactly —
  * bucket pruning is a performance contract, not a correctness one.
  */
class GraftKVSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftkv"
  override def supportsExternalMetadata(): Boolean = true

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graftkv requires a path (load(dir)/save(dir))")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKVUtil.readAnyFooter(path(options))
      .map(_.schema)
      .getOrElse(throw new IllegalArgumentException(
        s"no graftkv part files under ${path(options)} — pass .schema(...) to create"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftKVTable(schema, properties.get("path"))
}

/** Test access to the runtime-filter engagement counter. */
object GraftKVScanRuntime {
  val engaged = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Test access to the footer-count engagement counter. */
object GraftKVCountScanAccess {
  def reset(): Unit = GraftKVCountScan.planned.set(0)
  def planned: Int = GraftKVCountScan.planned.get()
}

/** Diagnostic/test access to a part file's footer index. */
object GraftKVUtilAccess {
  def footerOf(file: String): Footer = {
    val (f, _) = GraftKVUtil.fs(file)
    GraftKVUtil.readFooterOf(f, new Path(file))
  }
}

private[kvlog] object GraftKVUtil {
  // on executors (no active session) this falls back to the default
  // Hadoop Configuration — core-site.xml on the executor classpath
  // still resolves hdfs/s3a; only session-level overrides are absent
  def fs(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
    (p.getFileSystem(conf), p)
  }

  def partFiles(dir: String): Seq[Path] = {
    val (f, p) = fs(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".gkv")).sortBy(_.getName)
  }

  def readFooterOf(f: FileSystem, file: Path): Footer = {
    val len = f.getFileStatus(file).getLen
    val in = f.open(file)
    try {
      in.seek(len - 8)
      val tail = new Array[Byte](8)
      in.readFully(tail)
      val d = new DataInputStream(new java.io.ByteArrayInputStream(tail))
      val footerLen = d.readInt()
      val magic = new Array[Byte](4); d.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"$file is not a graftkv file (bad magic)")
      in.seek(len - 8 - footerLen)
      val fb = new Array[Byte](footerLen)
      in.readFully(fb)
      readFooter(fb)
    } finally in.close()
  }

  def readAnyFooter(dir: String): Option[Footer] = {
    val files = partFiles(dir)
    files.headOption.map { h => readFooterOf(fs(dir)._1, h) }
  }
}

private[kvlog] class GraftKVTable(tableSchema: StructType, dir: String)
    extends Table with SupportsRead with SupportsWrite {
  checkSchema(tableSchema)
  override def name(): String = s"graftkv.`$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftKVScanBuilder(tableSchema, dir)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftKVWriteBuilder(info.schema(), dir,
      Option(info.options.get("bucketsize")).map(_.toInt).getOrElse(4096))
}

// ---------------------------------------------------------------- read

private[kvlog] class GraftKVScanBuilder(full: StructType, dir: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val keyName = full.head.name
  private var required: StructType = full
  private var range: KeyRange = FullRange
  private var colPreds: Seq[ColPred] = Seq.empty
  private var pushed: Array[Filter] = Array.empty
  private var countFromFooter = false

  /** COUNT(*) with no grouping and no predicates is answered from the
    * footer's bucket row counts — zero buckets decompressed, zero
    * records decoded (partial-pushdown contract: one partial-count row
    * per file, Spark sums them).
    */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = pushed.isEmpty && range == FullRange &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
    if (ok) countFromFooter = true
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def tighten(r: KeyRange, f: Filter): Option[KeyRange] = f match {
      case EqualTo(`keyName`, v: String) =>
        Some(KeyRange(maxLower(r.lower, v), minUpper(r.upper, v)))
      case GreaterThan(`keyName`, v: String) =>          // inclusive proxy:
        Some(r.copy(lower = maxLower(r.lower, v)))       // exact > applied
      case GreaterThanOrEqual(`keyName`, v: String) =>   // by the residual
        Some(r.copy(lower = maxLower(r.lower, v)))
      case LessThan(`keyName`, v: String) =>
        Some(r.copy(upper = minUpper(r.upper, v)))
      case LessThanOrEqual(`keyName`, v: String) =>
        Some(r.copy(upper = minUpper(r.upper, v)))
      case _ => None
    }
    // non-key comparisons prune via the footer's per-bucket column
    // stats (parquet-style); only supported scalar types participate
    def colPred(f: Filter): Option[ColPred] = {
      def ok(name: String, v: Any): Boolean =
        name != keyName && full.fieldNames.contains(name) && (v match {
          case _: String | _: java.lang.Number | _: java.lang.Boolean => true
          case _ => false
        })
      f match {
        case EqualTo(n, v) if ok(n, v)            => Some(ColPred(n, "eq", v))
        case GreaterThan(n, v) if ok(n, v)        => Some(ColPred(n, "gt", v))
        case GreaterThanOrEqual(n, v) if ok(n, v) => Some(ColPred(n, "ge", v))
        case LessThan(n, v) if ok(n, v)           => Some(ColPred(n, "lt", v))
        case LessThanOrEqual(n, v) if ok(n, v)    => Some(ColPred(n, "le", v))
        case _ => None
      }
    }
    colPreds = filters.flatMap(colPred(_)).toSeq
    pushed = filters.filter(f =>
      tighten(FullRange, f).isDefined || colPred(f).isDefined)
    range = pushed.foldLeft(FullRange)((r, f) => tighten(r, f).getOrElse(r))
    filters // all residual: Spark evaluates every predicate exactly
  }
  private def maxLower(a: Option[String], b: String) =
    Some(a.filter(KVLogFormat.utf8Lt(b, _)).getOrElse(b))
  private def minUpper(a: Option[String], b: String) =
    Some(a.filter(KVLogFormat.utf8Lt(_, b)).getOrElse(b))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (countFromFooter) new GraftKVCountScan(dir)
    else new GraftKVScan(full, required, range, colPreds, dir)
}

/** Footer-only COUNT(*): one partial-count row per part file. */
private[kvlog] class GraftKVCountScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(org.apache.spark.sql.types.StructField("count",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graftkv $dir agg=count-from-footer"

  override def planInputPartitions(): Array[InputPartition] = {
    GraftKVCountScan.planned.incrementAndGet() // spec hook: proves engagement
    GraftKVUtil.partFiles(dir)
      .map(p => GraftKVInputPartition(p.toString, None, None)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val file = p.asInstanceOf[GraftKVInputPartition].file
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = {
            val (f, _) = GraftKVUtil.fs(file)
            val footer = GraftKVUtil.readFooterOf(f, new Path(file))
            new GenericInternalRow(Array[Any](footer.rows))
          }
          override def close(): Unit = ()
        }
    }
}

private[kvlog] object GraftKVCountScan {
  /** Test-visible engagement counter (no SQL-UI metric store to assert
    * against in a local harness).
    */
  val planned = new java.util.concurrent.atomic.AtomicInteger(0)
}

private[kvlog] class GraftKVScan(full: StructType, required: StructType,
                                 range: KeyRange, colPreds: Seq[ColPred],
                                 dir: String)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftkv $dir range=$range colPreds=${colPreds.mkString(";")} " +
      s"columns=${required.fieldNames.mkString(",")}"

  // Runtime filtering (the DSv2 analog of dynamic partition pruning):
  // when this scan sits under a join whose other side is small, Spark
  // hands the materialized join-key set here at EXECUTION time; the
  // [min, max] envelope of that set tightens the key range used for
  // bucket selection. Best-effort by contract — the join re-checks
  // every row — so collapsing the IN-set to its envelope is safe.
  @volatile private var runtimeRange: KeyRange = FullRange
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column(full.head.name))
  override def filter(filters: Array[Filter]): Unit = {
    val keyName = full.head.name
    filters.foreach {
      case In(`keyName`, values) if values.nonEmpty =>
        val strs = values.collect { case s: String => s }
        if (strs.length == values.length) {
          val ord = Ordering.comparatorToOrdering(
            new java.util.Comparator[String] {
              def compare(a: String, b: String) = KVLogFormat.utf8Cmp(a, b)
            })
          runtimeRange = KeyRange(Some(strs.min(ord)), Some(strs.max(ord)))
          GraftKVScanRuntime.engaged.incrementAndGet()
        }
      case _ => ()
    }
  }
  private def effectiveRange: KeyRange = {
    val ord = Ordering.comparatorToOrdering(
      new java.util.Comparator[String] {
        def compare(a: String, b: String) = KVLogFormat.utf8Cmp(a, b)
      })
    KeyRange(
      Seq(range.lower, runtimeRange.lower).flatten.maxOption(ord),
      Seq(range.upper, runtimeRange.upper).flatten.minOption(ord))
  }

  /** Footer-exact stats over the buckets this scan will actually read
    * — post-key-range, so a narrow range reports a small size and CBO
    * can pick a broadcast join it would refuse on raw file size.
    */
  override def estimateStatistics(): Statistics = {
    val (f, _) = GraftKVUtil.fs(dir)
    val kept = GraftKVUtil.partFiles(dir)
      .flatMap(p => selectBuckets(GraftKVUtil.readFooterOf(f, p).buckets,
        range, full, colPreds))
    val rows = kept.map(_.rows).sum
    val bytes = math.max(kept.map(_.length).sum, 1L)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val r = effectiveRange
    GraftKVUtil.partFiles(dir)
      .map(p => GraftKVInputPartition(p.toString, r.lower, r.upper, colPreds))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKVReaderFactory(full.toDDL, required.fieldNames)
}

case class GraftKVInputPartition(file: String,
                                 lower: Option[String],
                                 upper: Option[String],
                                 colPreds: Seq[ColPred] = Seq.empty)
    extends InputPartition

private[kvlog] class GraftKVReaderFactory(fullDDL: String,
                                          requiredNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftKVInputPartition]
    val full = StructType.fromDDL(fullDDL)
    // a COUNT(*) prunes every column: required may be empty, which
    // DDL round-tripping can't express — carry field names instead
    val required = StructType(requiredNames.map(n => full(full.fieldIndex(n))))
    new GraftKVPartitionReader(gp.file, KeyRange(gp.lower, gp.upper),
      gp.colPreds, full, required)
  }
}

/** Test-visible pruning counters (cumulative per JVM). */
object GraftKVScanCounters {
  val bucketsRead = new java.util.concurrent.atomic.AtomicLong(0)
  val bucketsSkipped = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = { bucketsRead.set(0); bucketsSkipped.set(0) }
}

private[kvlog] class GraftKVPartitionReader(file: String, range: KeyRange,
                                            colPreds: Seq[ColPred],
                                            full: StructType,
                                            required: StructType)
    extends PartitionReader[InternalRow] {

  private val (hfs, _) = GraftKVUtil.fs(file)
  private val hpath = new Path(file)
  private val footer = GraftKVUtil.readFooterOf(hfs, hpath)
  // the pruning decision: only buckets whose key range overlaps the
  // pushed range AND whose column stats admit every pushed non-key
  // comparison are ever read or decompressed
  private val kept = selectBuckets(footer.buckets, range, full, colPreds)
  GraftKVScanCounters.bucketsRead.addAndGet(kept.size.toLong)
  GraftKVScanCounters.bucketsSkipped.addAndGet(
    (footer.buckets.size - kept.size).toLong)
  private val buckets = kept.iterator
  private val in = hfs.open(hpath)

  private val rangeSet = range != FullRange
  // decode wanted = required columns, plus the key when a range must
  // be re-checked per record (the key might itself be pruned away)
  private val wanted = full.fields.map(f => required.fieldNames.contains(f.name))
  if (rangeSet) wanted(0) = true
  private val outIdx = required.fieldNames.map(n => full.fieldIndex(n))

  private var bucketIn: DataInputStream = null
  private val dest = new Array[Any](full.length)
  private var row: InternalRow = null

  override def next(): Boolean = {
    while (true) {
      if (bucketIn == null) {
        if (!buckets.hasNext) return false
        val b = buckets.next()
        in.seek(b.offset)
        val raw = new Array[Byte](b.length.toInt)
        in.readFully(raw)
        bucketIn = new DataInputStream(new GZIPInputStream(
          new java.io.ByteArrayInputStream(raw)))
      }
      if (!readRecord(bucketIn, full, wanted, dest)) {
        bucketIn.close(); bucketIn = null
      } else if (!rangeSet || range.contains(dest(0).asInstanceOf[String])) {
        val vals = outIdx.map { i =>
          dest(i) match {
            case s: String => UTF8String.fromString(s)
            case other => other
          }
        }
        row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = {
    if (bucketIn != null) bucketIn.close()
    in.close()
  }
}

// --------------------------------------------------------------- write

private[kvlog] class GraftKVWriteBuilder(schema: StructType, dir: String,
                                         bucketSize: Int)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write =
    new GraftKVWrite(schema, dir, bucketSize, doTruncate)
}

private[kvlog] class GraftKVWrite(schema: StructType, dir: String,
                                  bucketSize: Int, truncate: Boolean)
    extends Write with RequiresDistributionAndOrdering {
  checkSchema(schema)
  // appending a different row layout would corrupt the directory for
  // every reader (each file carries its own footer schema, but the
  // table contract is one schema per directory) — fail at plan time,
  // not at first read
  if (!truncate) {
    GraftKVUtil.readAnyFooter(dir).foreach { existing =>
      require(existing.schema == schema,
        s"graftkv append schema mismatch at $dir: existing " +
          s"${existing.schema.toDDL} vs incoming ${schema.toDDL}")
    }
  }
  private val key = schema.head.name

  // Catalyst plans the shuffle + sort the reference hand-rolls: rows
  // cluster by key (co-located buckets) and arrive key-sorted per task
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity(key)))
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.column(key), SortDirection.ASCENDING))

  override def toBatch: BatchWrite =
    new GraftKVBatchWrite(schema.toDDL, dir, bucketSize, truncate)

  /** Streaming sink: each micro-batch appends epoch-stamped part
    * files — the streaming form of the reference's export-then-index
    * sentinel handoff (a tailer sees whole files only after epoch
    * commit). Epoch-unique names make replayed epochs overwrite their
    * own files, keeping the at-least-once file set idempotent.
    */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftKVStreamingWrite(schema.toDDL, dir, bucketSize)
}

private[kvlog] class GraftKVStreamingWrite(schemaDDL: String, dir: String,
                                           bucketSize: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftKVStreamingWriterFactory(schemaDDL, dir, bucketSize)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (f, p) = GraftKVUtil.fs(dir)
    if (!f.exists(p)) f.mkdirs(p)
    f.create(new Path(p, "_SUCCESS"), true).close()
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (f, _) = GraftKVUtil.fs(dir)
    messages.filter(_ != null).foreach {
      case GraftKVCommit(file) if file.nonEmpty => f.delete(new Path(file), false)
      case _ => ()
    }
  }
}

private[kvlog] case class GraftKVCommit(file: String) extends WriterCommitMessage

private[kvlog] class GraftKVBatchWrite(schemaDDL: String, dir: String,
                                       bucketSize: Int, truncate: Boolean)
    extends BatchWrite {
  private val jobId = UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftKVWriterFactory(schemaDDL, dir, bucketSize, jobId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (f, p) = GraftKVUtil.fs(dir)
    if (truncate) {
      val keep = messages.map(_.asInstanceOf[GraftKVCommit].file).toSet
      GraftKVUtil.partFiles(dir)
        .filterNot(pf => keep.contains(pf.toString))
        .foreach(pf => f.delete(pf, false))
    }
    if (!f.exists(p)) f.mkdirs(p)
    f.create(new Path(p, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (f, _) = GraftKVUtil.fs(dir)
    messages.filter(_ != null).foreach {
      case GraftKVCommit(file) if file.nonEmpty => f.delete(new Path(file), false)
      case _ => ()
    }
  }
}

private[kvlog] case class GraftKVStreamingWriterFactory(schemaDDL: String,
                                                        dir: String,
                                                        bucketSize: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftKVDataWriter(StructType.fromDDL(schemaDDL), dir, bucketSize,
      f"part-$partitionId%05d-epoch$epochId.gkv")
}

private[kvlog] class GraftKVWriterFactory(schemaDDL: String, dir: String,
                                          bucketSize: Int, jobId: String)
    extends DataWriterFactory {
  // taskId in the name: a speculative or retried attempt writes its
  // OWN file (never racing the other attempt on one path); the losing
  // attempt's task-level abort() deletes its file, and truncate-commit
  // keeps only files named in the committed messages
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftKVDataWriter(StructType.fromDDL(schemaDDL), dir, bucketSize,
      f"part-$partitionId%05d-$taskId-$jobId.gkv")
}

/** Streams key-sorted rows into gzip buckets of `bucketSize` records;
  * min/max per bucket come free from the sort (first/last row). The
  * file is created lazily so empty partitions emit nothing.
  */
private[kvlog] class GraftKVDataWriter(schema: StructType, dir: String,
                                       bucketSize: Int, fileName: String)
    extends DataWriter[InternalRow] {

  private var out: org.apache.hadoop.fs.FSDataOutputStream = null
  private var filePath: Path = null
  private var offset = 0L
  private var rows = 0L
  private val metas = scala.collection.mutable.ArrayBuffer.empty[BucketMeta]

  private var buf: ByteArrayOutputStream = null
  private var gz: DataOutputStream = null
  private var bucketRows = 0L
  private var minKey: String = null
  private var maxKey: String = null
  // per-bucket [min, max] of each non-key field (nulls excluded) —
  // the footer stats non-key predicates prune on
  private val statMin = new Array[Any](math.max(schema.length - 1, 0))
  private val statMax = new Array[Any](statMin.length)
  // a double column that saw NaN gets NO stats for the bucket: NaN
  // never orders into min/max ('<' is always false against it), and
  // Spark treats NaN as larger than every double — any min/max pair
  // that ignored a present NaN could prune a bucket whose NaN rows
  // the engine would have matched (pruned buckets are never read, so
  // that is silent row loss, not a missed optimization)
  private val statPoisoned = new Array[Boolean](statMin.length)
  private var bloom: Array[Byte] = null

  private def ltTyped(i: Int, a: Any, b: Any): Boolean =
    schema(i + 1).dataType match {
      case org.apache.spark.sql.types.StringType =>
        // UTF-8 binary order — must match the engine's predicate
        // collation, see KVLogFormat.utf8Cmp
        KVLogFormat.utf8Lt(a.toString, b.toString)
      case org.apache.spark.sql.types.LongType =>
        a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case org.apache.spark.sql.types.IntegerType =>
        a.asInstanceOf[Int] < b.asInstanceOf[Int]
      case org.apache.spark.sql.types.DoubleType =>
        a.asInstanceOf[Double] < b.asInstanceOf[Double]
      case org.apache.spark.sql.types.BooleanType =>
        !a.asInstanceOf[Boolean] && b.asInstanceOf[Boolean]
      case dt => throw new IllegalStateException(dt.sql)
    }

  private def ensureOpen(): Unit = if (out == null) {
    val (f, p) = GraftKVUtil.fs(dir)
    if (!f.exists(p)) f.mkdirs(p)
    // fully qualify so commit-time truncation compares like with like
    // (listStatus returns scheme-qualified paths)
    filePath = f.makeQualified(new Path(p, fileName))
    out = f.create(filePath, true)
    out.write(Magic)
    offset = Magic.length.toLong
  }

  private def flushBucket(): Unit = if (bucketRows > 0) {
    gz.flush()
    gz.close() // finishes the gzip stream
    val bytes = buf.toByteArray
    out.write(bytes)
    val stats = Seq.tabulate(statMin.length)(i =>
      if (statPoisoned(i)) ColStat(null, null)
      else ColStat(statMin(i), statMax(i)))
    metas += BucketMeta(offset, bytes.length.toLong, bucketRows, minKey,
      maxKey, stats,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bloom))
    offset += bytes.length
    rows += bucketRows
    buf = null; gz = null; bucketRows = 0; minKey = null; maxKey = null
    bloom = null
    java.util.Arrays.fill(statMin.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(statMax.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(statPoisoned, false)
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    if (gz == null) {
      buf = new ByteArrayOutputStream()
      gz = new DataOutputStream(new GZIPOutputStream(buf))
    }
    require(!row.isNullAt(0), "graftkv key column must be non-null")
    val key = row.getUTF8String(0).toString
    // tracked by comparison, not first/last: batch writes arrive
    // key-sorted (RequiresDistributionAndOrdering), but the footer
    // index must stay correct for any producer order
    if (minKey == null || KVLogFormat.utf8Lt(key, minKey)) minKey = key
    if (maxKey == null || KVLogFormat.utf8Lt(maxKey, key)) maxKey = key
    if (bloom == null) bloom = new Array[Byte](KVLogFormat.BloomBytes)
    KVLogFormat.bloomAdd(bloom, key)
    val vals = Array.tabulate[Any](schema.length) { i =>
      if (row.isNullAt(i)) null
      else schema(i).dataType match {
        case org.apache.spark.sql.types.StringType => row.getUTF8String(i).toString
        case org.apache.spark.sql.types.LongType => row.getLong(i)
        case org.apache.spark.sql.types.IntegerType => row.getInt(i)
        case org.apache.spark.sql.types.DoubleType => row.getDouble(i)
        case org.apache.spark.sql.types.BooleanType => row.getBoolean(i)
        case dt => throw new IllegalStateException(dt.sql)
      }
    }
    var i = 0
    while (i < statMin.length) {
      val v = vals(i + 1)
      if (v != null) {
        v match {
          case d: Double if d.isNaN => statPoisoned(i) = true
          case _ =>
            if (statMin(i) == null || ltTyped(i, v, statMin(i))) statMin(i) = v
            if (statMax(i) == null || ltTyped(i, statMax(i), v)) statMax(i) = v
        }
      }
      i += 1
    }
    writeRecord(gz, schema, vals(_))
    bucketRows += 1
    if (bucketRows >= bucketSize) flushBucket()
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) return GraftKVCommit("")
    flushBucket()
    val d = new DataOutputStream(out)
    val fl = writeFooter(d, Footer(schema, rows, metas.toSeq))
    d.writeInt(fl)
    d.write(Magic)
    d.flush()
    out.close(); out = null
    GraftKVCommit(filePath.toString)
  }

  override def abort(): Unit = {
    close()
    if (filePath != null) GraftKVUtil.fs(dir)._1.delete(filePath, false)
  }
  override def close(): Unit = if (out != null) { out.close(); out = null }
}
