package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native INTEGER dot product over two array<int> columns, summing in
  * Long — the ranking kernel of the int8 quantized-search family
  * (`ann_int8_topk`, `ann_int8_ivf_topk`, VectorIndex.search).
  *
  * The HOF form `aggregate(zip_with(a, b, (x,y) -> bigint(x*y)), 0L, +)`
  * computes the same exact value but materializes an intermediate
  * long array and evaluates two lambdas per element outside
  * whole-stage codegen; this expression is one fused scalar loop. The
  * arithmetic is identical (int multiply — int8 codes are <= 127 in
  * magnitude, so the product can't overflow int — widened to long
  * before the running sum), so results are bit-equal to the HOF and
  * to the oracle's list_dot_product-cast-BIGINT.
  *
  * Null semantics mirror [[ArrayDot]]: length mismatch or a null
  * element anywhere yields NULL.
  */
case class ArrayDotInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot_int requires array<int> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "array_dot_int"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += (a.getInt(i) * b.getInt(i)).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) ($a.getInt($i) * $b.getInt($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotInt =
    copy(left = newLeft, right = newRight)
}

object ArrayDotInt {
  /** (identifier, info, builder) triple for SparkSessionExtensions.injectFunction. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot_int"),
    new ExpressionInfo(classOf[ArrayDotInt].getName, "array_dot_int"),
    (children: Seq[Expression]) => ArrayDotInt(
      Cast(children(0), ArrayType(IntegerType)),
      Cast(children(1), ArrayType(IntegerType)))
  )
}
