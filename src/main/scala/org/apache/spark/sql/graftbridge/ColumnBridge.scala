package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Visibility bridge: `classic.ExpressionUtils.column` (the canonical
  * Expression→Column wrapper in Spark 4) is `private[sql]`, so library
  * code outside `org.apache.spark.sql` cannot construct a Column from
  * a custom Catalyst expression that carries NON-child state (e.g. a
  * Broadcast handle — [[graft.functions.ConstDoubleArray]]), which the
  * function-registry path (name + child expressions only) cannot
  * express. This object lives in the `org.apache.spark.sql` namespace
  * solely to re-expose that one constructor; no Spark internals are
  * modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
