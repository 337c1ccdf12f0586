package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All word-n-gram shingle ids of a token array in ONE pass:
  * `shingle_hash52(toks, n)` = array of 52-bit ids, one per window,
  * value-identical to the HOF formulation
  * `transform(sequence(...), i -> conv(substr(md5(concat_ws(' ',
  * slice(toks, i, n))), 1, 13), 16, 10))` used by the dedup family's
  * shingle frame (Broder's hashed shingles; 13 hex nibbles = 52 bits).
  *
  * The HOF route is the hottest one-time corpus pass of the whole
  * dedup family and pays, per window: an interpreted lambda, a joined
  * shingle String allocation, a fresh MessageDigest (Spark's md5 →
  * commons-codec allocates one per call), a hex rendering, and a
  * string→decimal conv. This expression digests token bytes directly
  * (single-space separators — byte-identical input to the md5),
  * reuses a thread-local digest, and folds the first 13 nibbles
  * arithmetically.
  *
  * Callers must pre-filter `size(toks) >= n` (the shingle-frame
  * contract): for shorter inputs this returns an EMPTY array, whereas
  * the raw HOF form inherits `sequence(1, 0)`'s descending surprise.
  */
case class ShingleHash52(tokens: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = width

  override def checkInputDataTypes(): TypeCheckResult = {
    val tOk = tokens.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!tOk) TypeCheckResult.TypeCheckFailure(
      s"shingle_hash52 requires array<string> tokens, got ${tokens.dataType.catalogString}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure("shingle_hash52 requires a literal int width")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash52"

  override def nullSafeEval(t: Any, w: Any): Any =
    ShingleHash52.hashWindows(t.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.ShingleHash52.hashWindows($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHash52 =
    copy(tokens = newLeft, width = newRight)
}

object ShingleHash52 {

  private val localMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Space = Array[Byte](' ')

  /** Shared kernel for interpreted eval and codegen (the generated
    * code calls straight into this — the per-window loop is the work;
    * crossing the codegen boundary once per ROW costs nothing).
    */
  def hashWindows(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (n <= 0 || len < n) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    val digest = localMd5.get()
    var w = 0
    while (w < out.length) {
      digest.reset()
      var first = true
      var j = 0
      while (j < n) {
        val b = bytes(w + j)
        if (b != null) { // concat_ws skips null elements, no separator
          if (!first) digest.update(Space, 0, 1)
          digest.update(b)
          first = false
        }
        j += 1
      }
      val d = digest.digest()
      // value of the first 13 hex digits of the md5 rendering:
      // nibble-fold over the first 6.5 bytes (most significant first)
      var v = 0L
      var k = 0
      while (k < 13) {
        val byte = d(k >> 1) & 0xFF
        val nib = if ((k & 1) == 0) byte >>> 4 else byte & 0xF
        v = (v << 4) | nib
        k += 1
      }
      out(w) = v
      w += 1
    }
    new GenericArrayData(out)
  }

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_hash52"),
    new ExpressionInfo(classOf[ShingleHash52].getName, "shingle_hash52"),
    (children: Seq[Expression]) => ShingleHash52(children(0), children(1))
  )
}
