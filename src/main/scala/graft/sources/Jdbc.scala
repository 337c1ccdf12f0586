package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.sql.DriverManager

/** Live JDBC surface (SURVEY.md §2.1 S3/S9/S11).
  *
  * The reference streams ~10^9-row tables out of Oracle with
  * range-chunked cursors (interpro/oracle/uniparc.py:156-177) and
  * loads MySQL with executemany batches over sorted keys
  * (interpro/mysql/entries.py:241-295). Spark-first equivalents:
  *
  *  - S3 read: `spark.read.jdbc` with partitionColumn/lower/upper/
  *    numPartitions — each executor opens its own cursor over one key
  *    range, so the scan parallelism is the partition count, not 1.
  *    Filters still push down into each range query (PushedFilters).
  *  - S9 write: `df.write.jdbc` with `batchsize` — Spark's JDBC sink
  *    batches PreparedStatement inserts per partition (the
  *    executemany pattern), one connection per partition.
  *  - S11 bulk load: sort within partitions by the target's clustered
  *    key, then a foreachPartition batch-insert loop — rows arrive in
  *    key order per connection, which is what makes bulk loads append
  *    to the right of the B-tree instead of splitting pages.
  *
  * Exercised live against embedded Derby (in-JVM, zero egress) by
  * JdbcRoundTripSpec; the same calls take any JDBC URL at scale.
  */
object Jdbc {

  /** S3: range-chunked parallel scan. One executor cursor per range
    * chunk of `partCol` in [lower, upper].
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()

  /** S9: batched RDBMS sink — one connection per partition,
    * PreparedStatement batches of `batchSize`.
    */
  def writeBatch(df: DataFrame, url: String, table: String,
                 batchSize: Int, mode: SaveMode = SaveMode.Overwrite,
                 options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .options(options)
      .mode(mode)
      .save()

  /** S11: key-sorted executemany bulk load into an EXISTING table.
    * Sorts within partitions on `sortCols` (the target's clustered
    * key), then per partition drives one INSERT PreparedStatement in
    * `batchSize` batches — the reference's
    * `cur.executemany(query, rows[i:i+1000])` loop
    * (interpro/mysql/entries.py:241-295), distributed.
    *
    * `deleteKeyCol`: retry/replay idempotence. A partition's
    * transaction rolls back if the task dies mid-write, but a task
    * re-run AFTER its commit (stage retry on a cluster fetch failure)
    * would re-insert every row. When `deleteKeyCol` is set (it must
    * lead `sortCols`, so its groups arrive contiguously), the writer
    * issues `DELETE ... WHERE key = ?` the first time each key group
    * appears — inside the same transaction as the inserts — so a
    * replayed task first removes its own previous attempt's rows.
    * Exactly-once then holds under any sequential re-execution;
    * CONCURRENT duplicate attempts (speculation) are still unsafe on
    * a sink with no commit coordinator — disable speculation for JDBC
    * sink stages, as Spark's own JDBC writer requires.
    *
    * Delete-first is only safe when EVERY row of a key group lives in
    * the partition issuing the group's DELETE — with non-unique keys
    * spread across partitions, one partition's DELETE would erase
    * another partition's already-committed rows for the same key,
    * silently losing data even on a clean first load. So when
    * `deleteKeyCol` is set the frame is REPARTITIONED BY THE KEY
    * first (hash partitioning makes each key's rows partition-
    * exclusive, exactly like bulkLoadHashSharded's prefix
    * repartition); without a delete key the caller's partitioning is
    * kept (pure append, order-free).
    */
  def bulkLoadSorted(df: DataFrame, sortCols: Seq[String], url: String,
                     table: String, batchSize: Int = 1000,
                     deleteKeyCol: Option[String] = None): Unit = {
    require(deleteKeyCol.forall(sortCols.headOption.contains),
      s"deleteKeyCol $deleteKeyCol must lead sortCols $sortCols")
    val placed = deleteKeyCol match {
      case Some(k) => df.repartition(df(k))
      case None => df
    }
    loadPartitions(placed.sortWithinPartitions(sortCols.map(df(_)): _*),
      url, table, batchSize, deleteKeyCol)
  }

  /** S12: hash-sharded parallel bulk load — the reference's Oracle
    * LOOKUP_MATCH sink list-partitions the table by a 3-char MD5
    * prefix and drives N insert workers over disjoint shards
    * (interpro/oracle/lookup.py:110-146,347-358). Spark-first: derive
    * the prefix, `repartition(shards, prefix)` so each task owns a
    * disjoint hash range (rows land in their target LIST partition
    * with no cross-partition contention), sort within the shard on the
    * hash, and run the same executemany loop — one connection per
    * shard, all shards concurrent.
    *
    * Replay-idempotent by construction: hash partitioning is
    * deterministic, so a retried shard task owns exactly the same
    * md5_prefix groups — each group's rows are deleted (same
    * transaction) before being re-inserted, making a post-commit
    * stage retry converge on one copy per row instead of two.
    */
  def bulkLoadHashSharded(df: DataFrame, hashCol: String, url: String,
                          table: String, prefixLen: Int = 3,
                          shards: Int = 16, batchSize: Int = 1000): Unit = {
    import org.apache.spark.sql.functions.{col, md5, substring, upper}
    val withPrefix = df.withColumn("md5_prefix",
      upper(substring(md5(col(hashCol).cast("string")), 1, prefixLen)))
    loadPartitions(
      withPrefix.repartition(shards, col("md5_prefix"))
        .sortWithinPartitions(col("md5_prefix"), col(hashCol)),
      url, table, batchSize, deleteKeyCol = Some("md5_prefix"))
  }

  /** Driver-side parameterized DML (UPDATE/DELETE/DDL) — the
    * reference's one-off release-control statements are single-row
    * updates with no dataflow, so they run on the driver connection,
    * never through an executor. Returns the update count.
    */
  def execUpdate(url: String, sql: String, params: Seq[Any] = Nil): Int = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(sql)
      try {
        params.zipWithIndex.foreach { case (p, i) => ps.setObject(i + 1, p) }
        ps.executeUpdate()
      } finally ps.close()
    } finally conn.close()
  }

  /** The reference's pronto freeze switch
    * (interpro/oracle/pronto.py:5-33): update the 'FROZEN' row of the
    * release-state table, setting only the columns whose values were
    * given — a no-op (no connection at all) when both are None, like
    * the reference's empty-columns early exit. Returns rows updated
    * (0 when nothing to do).
    */
  def updateFrozenState(url: String, table: String,
                        isFrozen: Option[Boolean],
                        freezeOn: Option[java.sql.Timestamp]): Int = {
    val sets = isFrozen.map(_ => "ACTIVE = ?").toSeq ++
      freezeOn.map(_ => "ACTIVE_FROM = ?").toSeq
    if (sets.isEmpty) 0
    else execUpdate(url,
      s"UPDATE $table SET ${sets.mkString(", ")} WHERE NAME = 'FROZEN'",
      isFrozen.map(f => if (f) "Y" else "N").toSeq ++ freezeOn.toSeq)
  }

  private def loadPartitions(df: DataFrame, url: String,
                             table: String, batchSize: Int,
                             deleteKeyCol: Option[String] = None): Unit = {
    val cols = df.schema.fieldNames.toSeq
    val delIdx = deleteKeyCol.map(cols.indexOf).filter(_ >= 0)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            // quote identifiers with the TARGET engine's quote string
            // (MySQL default sql_mode rejects ANSI double quotes as
            // identifier quoting; Derby/Postgres use '"'; MySQL '`')
            val q = Option(conn.getMetaData.getIdentifierQuoteString)
              .map(_.trim).filter(_.nonEmpty).getOrElse("")
            val insert = s"""INSERT INTO $table (${cols.map(c => s"$q$c$q").mkString(", ")})
                             VALUES (${cols.map(_ => "?").mkString(", ")})"""
            val ps = conn.prepareStatement(insert)
            // replay idempotence: rows arrive sorted by the delete key,
            // so each key group is purged ONCE, just before its first
            // insert, in the same transaction — a re-run of a committed
            // task deletes its own previous rows instead of doubling.
            // A null key binds `= NULL` which matches NOTHING in SQL —
            // the null-keyed group would never purge and would double
            // on replay — so nulls take the IS NULL statement instead.
            val del = delIdx.map(_ => conn.prepareStatement(
              s"DELETE FROM $table WHERE $q${deleteKeyCol.get}$q = ?"))
            val delNull = delIdx.map(_ => conn.prepareStatement(
              s"DELETE FROM $table WHERE $q${deleteKeyCol.get}$q IS NULL"))
            try {
              var inBatch = 0
              var lastKey: Any = null
              var keySeen = false
              rows.foreach { r =>
                delIdx.foreach { di =>
                  val k = r.get(di)
                  if (!keySeen || k != lastKey) {
                    // flush pending inserts so delete/insert order is
                    // preserved inside the transaction
                    if (inBatch > 0) { ps.executeBatch(); inBatch = 0 }
                    if (k == null) delNull.get.executeUpdate()
                    else {
                      del.get.setObject(1, k)
                      del.get.executeUpdate()
                    }
                    lastKey = k
                    keySeen = true
                  }
                }
                (0 until cols.length).foreach(i => ps.setObject(i + 1, r.get(i)))
                ps.addBatch()
                inBatch += 1
                if (inBatch == batchSize) { ps.executeBatch(); inBatch = 0 }
              }
              if (inBatch > 0) ps.executeBatch()
              conn.commit()
            } finally {
              del.foreach(_.close()); delNull.foreach(_.close()); ps.close()
            }
          } finally conn.close()
        }
      }
  }
}
