package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Generator emitting every ordered element pair (i < j) of an array
  * as (pa, pb) rows — the pair-expansion kernel of the similarity /
  * clan-graph family (reference semantics: the nested per-key loops of
  * interpro7dw/interpro/xrefs/entries.py's Jaccard pass).
  *
  * The HOF formulation
  * `explode(flatten(transform(a, (x,i) => transform(slice(a, i+2, n),
  * y => struct(x, y)))))` materializes every inner pair array AND the
  * flattened n·(n-1)/2-element copy before the explode iterates it —
  * for a 256-element set that is two transient ~32k-struct arrays per
  * input row, and the census showed the pair queries GC-bound. This
  * generator streams pairs straight off the source array: no nested
  * array, no flatten copy, one small row object per pair. It opts out
  * of whole-stage codegen (CodegenFallback), a deliberate trade: the
  * codegen'd HOF still allocates both intermediates inside the
  * generated code, and allocation — not iteration — is the measured
  * cost.
  *
  * Null semantics: a NULL array yields no rows (explode-compatible);
  * null elements pair like values.
  */
case class OrderedPairsGen(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs requires an array input, got ${other.catalogString}")
  }

  private lazy val elType = child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elNullable =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def elementSchema: StructType = StructType(Seq(
    StructField("pa", elType, nullable = elNullable),
    StructField("pb", elType, nullable = elNullable)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else new Iterator[InternalRow] {
      private val n = arr.numElements()
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        // fresh row per pair: downstream operators may buffer rows
        // (join builds, sort), so the row object cannot be reused
        val row = InternalRow(arr.get(i, elType), arr.get(j, elType))
        j += 1
        if (j == n) { i += 1; j = i + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairsGen =
    copy(child = newChild)

  override def prettyName: String = "ordered_pairs"
}

object OrderedPairsGen {
  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("ordered_pairs"),
    new ExpressionInfo(classOf[OrderedPairsGen].getName, "ordered_pairs"),
    (children: Seq[Expression]) => OrderedPairsGen(children.head)
  )
}
