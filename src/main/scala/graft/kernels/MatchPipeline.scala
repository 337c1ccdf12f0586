package graft.kernels

import graft.kernels.MatchMerge.{MergedMatch, RawMatch}
import org.apache.spark.sql.Dataset

/** Dataset wrapper for the K1/K2 kernels: one shuffle on protein_acc,
  * then the pure-Scala merge runs per group inside executors — the
  * Spark replacement for the reference's KVStoreBuilder spill/merge +
  * mp.Pool reduce (interpro/oracle/matches.py:235-284).
  */
object MatchPipeline {

  def mergeMatches(raw: Dataset[RawMatch]): Dataset[MergedMatch] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.groupByKey(_.proteinAcc)
      .flatMapGroups((acc, it) => MatchMerge.mergeProtein(acc, it.toSeq).iterator)
  }
}
