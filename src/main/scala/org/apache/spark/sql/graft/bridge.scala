package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x moved `Column` onto `ColumnNode` (SPARK-44111 unification);
  * the classic-session converters live in `org.apache.spark.sql.classic`
  * with `private[sql]` access, so this shim sits inside the `sql` package
  * — the standard pattern for third-party Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER catalyst conversion. `expression` returns a lazy
    * `ColumnNodeExpression` wrapper whose children are ColumnNodes, so
    * tree analysis (e.g. stats-pruning conjunct extraction) sees
    * nothing; this runs the real converter, yielding an analyzable
    * catalyst tree (comparisons surface as UnresolvedFunction("<", …)
    * until the analyzer resolves them). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
