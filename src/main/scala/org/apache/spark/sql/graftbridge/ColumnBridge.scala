package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 made `Column` backed by opaque `ColumnNode`s; the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so a library defining its own native expressions (graft.functions.*)
  * needs this one-file shim inside the `org.apache.spark.sql` package
  * tree — the established pattern for Spark-native extension libraries
  * (the alternative, registering every expression as a SQL function and
  * round-tripping through the parser, would tie the Column API to a
  * session-specific FunctionRegistry).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
