package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string in ONE pass, first
  * occurrence order: `char_ngrams_distinct(text, n)` ==
  * `array_distinct(transform(sequence(1, length(text) - n + 1),
  * i -> substr(text, i, n)))` for `length(text) >= n` — the language
  * -id trigram profile/scoring input, whose HOF form pays an
  * interpreted lambda plus a substring allocation per POSITION and a
  * second pass for the distinct.
  *
  * For `length(text) < n` this returns an EMPTY array — the oracle's
  * (`range`-comprehension) semantics. The raw HOF inherits
  * `sequence(1, 0)`'s descending surprise there and disagrees with
  * the oracle on sub-n-length strings, so the native form is the
  * strictly more correct one; corpora simply never exercised it.
  */
case class CharNgramsDistinct(text: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = width

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams_distinct requires a string, got ${text.dataType.catalogString}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure("char_ngrams_distinct requires a literal int width")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams_distinct"

  override def nullSafeEval(t: Any, w: Any): Any =
    CharNgramsDistinct.windows(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.CharNgramsDistinct.windows($t, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramsDistinct =
    copy(text = newLeft, width = newRight)
}

object CharNgramsDistinct {

  /** Shared kernel for interpreted eval and codegen. substringSQL is
    * the same character-based slice the substr expression performs,
    * so values (including multi-byte text) cannot drift from the HOF.
    */
  def windows(s: UTF8String, n: Int): GenericArrayData = {
    val len = s.numChars()
    if (n <= 0 || len < n)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    val last = len - n + 1
    while (i <= last) {
      seen.add(s.substringSQL(i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  val descriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
                   ExpressionInfo,
                   Seq[Expression] => Expression) = (
    new org.apache.spark.sql.catalyst.FunctionIdentifier("char_ngrams_distinct"),
    new ExpressionInfo(classOf[CharNgramsDistinct].getName, "char_ngrams_distinct"),
    (children: Seq[Expression]) => CharNgramsDistinct(children(0), children(1))
  )
}
