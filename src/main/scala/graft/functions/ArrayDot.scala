package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The hot loop of every similarity operator (ANN top-k, embedding
  * near-dup). A higher-order `aggregate(zip_with(a, b, *), 0.0, +)`
  * computes the same value but allocates an intermediate array and
  * evaluates lambdas per element outside whole-stage codegen; this
  * expression generates a tight scalar loop instead. The evaluation
  * order (ascending index, single accumulator) is identical to the
  * fold, so results are bit-identical to the HOF formulation and to
  * DuckDB's list_* kernels used by the oracle.
  *
  * Null semantics mirror the HOF exactly (so the optimizer rewrite in
  * RewriteHofDotProduct is transparent): a length mismatch or a null
  * element anywhere yields NULL — zip_with pads the shorter side with
  * nulls and a null product nulls the whole running sum.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // null on length mismatch or null element, even with non-null inputs
  override def nullable: Boolean = true

  override def prettyName: String = "array_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
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
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** (identifier, info, builder) triple for SparkSessionExtensions.injectFunction. */
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    // numeric arrays of any element type are welcome: the builder
    // inserts the float→double cast so callers don't have to
    (children: Seq[Expression]) => ArrayDot(
      Cast(children(0), ArrayType(DoubleType)),
      Cast(children(1), ArrayType(DoubleType)))
  )
}
