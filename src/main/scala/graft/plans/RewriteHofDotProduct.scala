package graft.plans

import graft.functions.ArrayDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: canonicalize the portable higher-order-function
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen expression [[graft.functions.ArrayDot]].
  * The HOF form allocates an intermediate array and evaluates two
  * lambdas per element outside whole-stage codegen; ArrayDot is a
  * tight scalar loop with the same ascending-index accumulation order,
  * so results are bit-identical. Registered through
  * `SparkSessionExtensions.injectOptimizerRule` — user code (or SQL)
  * written portably still gets the fast path.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** ArrayDot replicates the HOF's null semantics (null on length
    * mismatch or null element), so any double-array qualifies.
    */
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      body.exprId == a.exprId
    case _ => true // default finish (identity) when not a lambda
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(left, right, mergeFn),
            Literal(zero, DoubleType),
            reduceFn, finishFn)
          if zero == 0.0 && isMultiplyLambda(mergeFn) &&
            isSumLambda(reduceFn) && isIdentityFinish(finishFn) &&
            isDoubleArray(left) && isDoubleArray(right) &&
            agg.dataType == DoubleType =>
        ArrayDot(left, right)
    }
}
