package graft.plans

import graft.functions.{ArrayDot, ArrayDotInt, CharNgramsDistinct, GzipCodec, HammingBits, NfcNormalize, OrderedPairsGen, ShingleHash52}
import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the engine's custom Catalyst surface —
  * registered with `.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")` (or `withExtensions`) so both
  * `spark.sql` and `call_function` resolve the native expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(ArrayDot.descriptor)
    ext.injectFunction(ArrayDotInt.descriptor)
    ext.injectFunction(GzipCodec.compressDescriptor)
    ext.injectFunction(GzipCodec.decompressDescriptor)
    ext.injectFunction(HammingBits.descriptor)
    ext.injectFunction(ShingleHash52.descriptor)
    ext.injectFunction(CharNgramsDistinct.descriptor)
    ext.injectFunction(OrderedPairsGen.descriptor)
    ext.injectFunction(NfcNormalize.descriptor)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
