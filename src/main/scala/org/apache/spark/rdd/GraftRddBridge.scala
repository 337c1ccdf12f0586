package org.apache.spark.rdd

/** Accessor for `RDD.isLocallyCheckpointed` (`private[rdd]`): the
  * bench harness sweeps loop-checkpoint blocks between queries, and
  * must distinguish them from cached-DataFrame blocks (both report
  * the same StorageLevel, so the checkpoint flag is the only
  * discriminator).
  */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
