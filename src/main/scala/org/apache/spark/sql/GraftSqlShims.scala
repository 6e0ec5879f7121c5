package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 unified Column around ColumnNode (SPARK-49025), hiding the
  * classic `.expr` behind `private[sql]` converters. Extension libraries
  * bridge from inside the `org.apache.spark.sql` package — the same
  * technique Spark's own modules and third-party connectors use; only
  * public Spark classes are touched.
  */
object GraftSqlShims {
  /** Catalyst expression backing a (classic) Column. */
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression as a public Column (for custom expressions). */
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
}
