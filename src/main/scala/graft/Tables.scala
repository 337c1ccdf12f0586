package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (see TESTDATA.md / FIXTURES.md §A).
  *
  * Each table is a single parquet file per scale-factor directory. All
  * queries go through these so that scans stay column-prunable and
  * filter-pushdown-friendly (never cache here; let each query's plan
  * prune its own columns).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in several physical encodings: parquet
    * TIMESTAMP(NANOS) (no Spark type — read nanos as long via
    * `spark.sql.legacy.parquet.nanosAsLong`, then truncate to µs, the
    * same truncation DuckDB applies casting ns to its µs TIMESTAMP)
    * and plain µs TIMESTAMP with or without the UTC annotation.
    * Branch on the LOADED schema, not an assumed encoding: with
    * nanosAsLong set, ns columns surface as LongType, µs columns as
    * TimestampType/TimestampNTZType. The loader contract is a single
    * logical type downstream — `ts: TimestampType` in µs (sessions run
    * UTC, so the NTZ cast is the identity wall-clock mapping DuckDB
    * applies to the same naive values). Integer `div` (not double /):
    * ns-since-epoch exceeds 2^53.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => raw // already a (µs) timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Widen a narrow scan to the session's parallelism. A single
    * parquet file with one row group plans as ONE partition, which
    * serializes per-row interpreted work (higher-order-function
    * token/shingle/trigram transforms) onto one core before the first
    * shuffle; at warehouse scale the same scan has thousands of splits
    * and this is a no-op. The guard keeps the repartition off any
    * input that is already parallel — it never reshuffles a corpus
    * that arrives wide.
    */
  def widened(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
