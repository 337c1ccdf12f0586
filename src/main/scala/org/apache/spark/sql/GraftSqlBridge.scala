package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.{caseInsensitiveResolution, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` constructors needed to expose a
  * custom LogicalPlan (graft.plans.LocalTopKPerGroup) as a DataFrame.
  * Only public Spark APIs are used beyond the accessors below.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Convert a Column to a Catalyst expression with its attribute
    * references resolved against `child`'s output — custom logical
    * nodes receive fully-resolved expressions, so the analyzer doesn't
    * need special handling for them.
    */
  def resolvedExpr(c: Column, child: LogicalPlan): Expression =
    classic.ColumnNodeToExpressionConverter(c.node).transformUp {
      case u: UnresolvedAttribute =>
        child.resolve(u.nameParts, caseInsensitiveResolution).getOrElse(
          throw new IllegalArgumentException(
            s"cannot resolve ${u.name} against ${child.output.map(_.name)}"))
    }
}
