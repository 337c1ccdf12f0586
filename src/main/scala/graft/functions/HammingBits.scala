package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-character Hamming distance over two string columns.
  *
  * The verification kernel of SimHash hamming-radius search
  * (dedup_simhash_hamming): the composed form — 64 substring
  * comparisons summed per candidate pair — evaluates 64 separate
  * Substring+If expression trees per row; this expression is one
  * tight byte loop inside whole-stage codegen. Positions beyond the
  * shorter string count as mismatches, so the value is total on any
  * inputs; over equal-length '0'/'1' signatures it equals the summed
  * CASE formulation bit for bit (the DuckDB oracle keeps that
  * formulation, which is the cross-engine check of this kernel).
  * Byte-wise comparison is exact for the ASCII signatures it serves
  * and still a correct byte-Hamming for general UTF-8.
  */
case class HammingBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_bits requires string inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_bits"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    val n = math.min(a.length, b.length)
    var acc = math.abs(a.length - b.length).toLong
    var i = 0
    while (i < n) {
      if (a(i) != b(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $ab = $a.getBytes();
         |byte[] $bb = $b.getBytes();
         |int $n = java.lang.Math.min($ab.length, $bb.length);
         |long $acc = java.lang.Math.abs($ab.length - $bb.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ab[$i] != $bb[$i]) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBits =
    copy(left = newLeft, right = newRight)
}

object HammingBits {
  /** (identifier, info, builder) for SparkSessionExtensions.injectFunction. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("hamming_bits"),
    new ExpressionInfo(classOf[HammingBits].getName, "hamming_bits"),
    (children: Seq[Expression]) => HammingBits(children(0), children(1))
  )
}
