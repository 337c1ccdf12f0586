package graft

import graft.sources.Jdbc
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** Live JDBC round-trips (S3/S9/S11) against embedded Derby — a real
  * JDBC engine in this JVM, no egress. The same Jdbc.* calls take a
  * MySQL/Oracle URL unchanged; what the suite proves is the Spark
  * side: range-chunked parallel reads (one cursor per partition),
  * predicate pushdown into the range queries, batched writes, and the
  * key-sorted executemany bulk load.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  // Derby's dialect maps StringType to CLOB (not comparable/indexable);
  // pin VARCHAR for the created table instead.
  private val varchar = Map("createTableColumnTypes" -> "name VARCHAR(64)")

  private def seedFrame = {
    import spark.implicits._
    spark.range(0, 1000).select(
      col("id"),
      concat(lit("sup-"), col("id").cast("string")).as("name"),
      (col("id") % 97).cast("double").as("score"))
  }

  test("S9: batched jdbc write round-trips") {
    Jdbc.writeBatch(seedFrame, url, "graft_seed", batchSize = 128,
      options = varchar)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_seed").load()
    assert(back.count() === 1000)
    assert(back.agg(sum("id")).head.getLong(0) === (0L until 1000L).sum)
  }

  test("S3: partitioned read opens one range cursor per partition") {
    Jdbc.writeBatch(seedFrame, url, "graft_part", batchSize = 256,
      options = varchar)
    val df = Jdbc.readPartitioned(spark, url, "graft_part", "id",
      lower = 0, upper = 1000, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    // every range chunk is non-empty and the union is exact
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.length === 4 && perPart.forall(_ > 0))
    assert(df.count() === 1000)
    assert(df.select(sum("id")).head.getLong(0) === (0L until 1000L).sum)
  }

  test("S3: filters push down into the range queries") {
    val df = Jdbc.readPartitioned(spark, url, "graft_part", "id",
      lower = 0, upper = 1000, numPartitions = 4)
      .filter(col("id") < 100)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") && plan.contains("LessThan"),
      s"expected pushed JDBC filter in plan:\n$plan")
    assert(df.count() === 100)
  }

  test("S11: key-sorted executemany bulk load") {
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE graft_kv ("k" BIGINT, "name" VARCHAR(64))""")
    } finally conn.close()

    // deliberately unsorted input; bulkLoadSorted must deliver rows in
    // key order per connection (bulk loads append rather than split)
    val shuffled = seedFrame.select(col("id").as("k"), col("name"))
      .orderBy(rand(seed = 7)).repartition(3)
    Jdbc.bulkLoadSorted(shuffled, Seq("k"), url, "graft_kv", batchSize = 100)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_kv").load()
    assert(back.count() === 1000)
    assert(back.select(countDistinct("k")).head.getLong(0) === 1000)
    assert(back.filter(col("name") =!= concat(lit("sup-"), col("k").cast("string")))
      .count() === 0)
  }

  test("S12: md5-prefix-sharded parallel bulk load") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE graft_md5 ("id" BIGINT, "name" VARCHAR(64),
          |"score" DOUBLE, "md5_prefix" CHAR(3))""".stripMargin.replace("\n", " "))
      // the production target is LIST-partitioned by the shard key
      // (each shard's delete touches only its own partition); Derby
      // has no list partitioning, so without an index its per-key
      // DELETE table-scans across the other shards' uncommitted
      // inserts and deadlocks — the index restores the disjointness
      st.executeUpdate("""CREATE INDEX graft_md5_pfx ON graft_md5 ("md5_prefix")""")
      st.close()
    } finally conn.close()

    Jdbc.bulkLoadHashSharded(seedFrame, "id", url, "graft_md5",
      prefixLen = 3, shards = 8, batchSize = 64)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_md5").load()
    assert(back.count() === 1000)
    assert(back.select(countDistinct("id")).head.getLong(0) === 1000)
    // the stored prefix is the md5 prefix Spark computes — the shard
    // key and the target LIST partition key agree
    assert(back.filter(
      col("md5_prefix") =!= upper(substring(md5(col("id").cast("string")), 1, 3)))
      .count() === 0)
    // shards hold disjoint prefix ranges: every prefix maps to exactly
    // one loader partition by construction of repartition(shards, key)
    val parts = seedFrame.withColumn("p",
        upper(substring(md5(col("id").cast("string")), 1, 3)))
      .repartition(8, col("p"))
      .select(col("p"), spark_partition_id().as("pid"))
      .groupBy("p").agg(countDistinct("pid").as("n"))
    assert(parts.filter(col("n") > 1).count() === 0)
  }

  test("bulk loads are replay-idempotent (post-commit task re-run)") {
    // A task re-executed AFTER its transaction committed (cluster
    // stage retry on a fetch failure) re-runs the same deterministic
    // partition. The delete-first transaction must converge on one
    // copy per row; the plain append path doubles — which is why the
    // sharded loader always passes its shard key as the delete key.
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE graft_replay ("id" BIGINT, "name" VARCHAR(64),
          |"score" DOUBLE, "md5_prefix" CHAR(3))""".stripMargin.replace("\n", " "))
      // see S12: the index stands in for the target's LIST partitioning
      st.executeUpdate(
        """CREATE INDEX graft_replay_pfx ON graft_replay ("md5_prefix")""")
      st.executeUpdate(
        """CREATE TABLE graft_replay_plain ("k" BIGINT, "name" VARCHAR(64))""")
      st.executeUpdate(
        """CREATE INDEX graft_replay_plain_k ON graft_replay_plain ("k")""")
      st.close()
    } finally conn.close()

    def loadSharded(): Unit = Jdbc.bulkLoadHashSharded(seedFrame, "id",
      url, "graft_replay", prefixLen = 3, shards = 8, batchSize = 64)
    loadSharded(); loadSharded() // second pass = every shard task replayed
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_replay").load()
    assert(back.count() === 1000, "replayed sharded load must not duplicate")
    assert(back.select(countDistinct("id")).head.getLong(0) === 1000)

    // the sorted loader: idempotent exactly when a delete key is given
    val kv = seedFrame.select(col("id").as("k"), col("name")).repartition(3)
    Jdbc.bulkLoadSorted(kv, Seq("k"), url, "graft_replay_plain",
      batchSize = 100, deleteKeyCol = Some("k"))
    Jdbc.bulkLoadSorted(kv, Seq("k"), url, "graft_replay_plain",
      batchSize = 100, deleteKeyCol = Some("k"))
    val kvBack = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_replay_plain").load()
    assert(kvBack.count() === 1000)
    // and without one, the second pass appends: the honest default
    Jdbc.bulkLoadSorted(kv, Seq("k"), url, "graft_replay_plain",
      batchSize = 100)
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_replay_plain").load()
      .count() === 2000)
  }

  test("delete-first load keeps NON-UNIQUE keys spread across input " +
      "partitions (and purges null-keyed groups on replay)") {
    // The r16 advisor's data-loss shape: keys NOT partition-exclusive
    // in the caller's frame — before the repartition-by-key fix, one
    // partition's DELETE for a key group erased other partitions'
    // already-committed rows for the same key even on a CLEAN first
    // load. 99 keys x 10 rows plus a 10-row NULL-key group, scattered
    // by VALUE over 8 partitions so every key spans many partitions.
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE graft_replay_multi ("k" BIGINT, "v" BIGINT)""")
      st.close()
    } finally conn.close()
    val df = spark.range(0, 1000).select(
      when(col("id") < 990, col("id") % 99).as("k"), col("id").as("v"))
      .repartition(8, col("v"))
    def load(): Unit = Jdbc.bulkLoadSorted(df, Seq("k"), url,
      "graft_replay_multi", batchSize = 37, deleteKeyCol = Some("k"))
    load()
    def back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_replay_multi").load()
    assert(back.count() === 1000,
      "a clean first load must keep every row of every key group")
    // replay converges on one copy — including the null-keyed group,
    // which a `WHERE k = ?` bind (= NULL matches nothing) would double
    load()
    assert(back.count() === 1000, "replay must not duplicate any group")
    assert(back.filter(col("k").isNull).count() === 10,
      "the null-key group must purge via IS NULL and stay at one copy")
    assert(back.agg(sum(col("v"))).head.getLong(0) === (0L until 1000L).sum)
  }

  test("frozen-state update mirrors pronto.py (partial SETs, no-op on empty)") {
    // the reference's release-control UPDATE (interpro/oracle/
    // pronto.py:5-33): SET list built only from the provided values,
    // keyed WHERE NAME='FROZEN', early-exit when nothing to set
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE pronto_states
                    (name VARCHAR(32), active VARCHAR(1),
                     active_from TIMESTAMP)""")
      st.execute("""INSERT INTO pronto_states VALUES
                    ('FROZEN', 'N', NULL), ('OTHER', 'N', NULL)""")
      st.close()
    } finally conn.close()

    // no values given -> no-op, zero rows touched
    assert(Jdbc.updateFrozenState(url, "pronto_states", None, None) === 0)

    // only the flag
    assert(Jdbc.updateFrozenState(url, "pronto_states",
      Some(true), None) === 1)
    val t0 = java.sql.Timestamp.valueOf("2026-08-13 00:00:00")
    // both columns
    assert(Jdbc.updateFrozenState(url, "pronto_states",
      Some(false), Some(t0)) === 1)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "pronto_states").load()
    val frozen = back.filter(col("name") === "FROZEN").head
    assert(frozen.getAs[String]("ACTIVE") === "N")
    assert(frozen.getAs[java.sql.Timestamp]("ACTIVE_FROM") === t0)
    // the other row is untouched — the WHERE key holds
    val other = back.filter(col("name") === "OTHER").head
    assert(other.getAs[String]("ACTIVE") === "N")
    assert(other.getAs[java.sql.Timestamp]("ACTIVE_FROM") === null)
  }
}
