package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column ↔ Expression converters, which Spark 4
  * scopes `private[sql]`. Libraries that define custom Catalyst
  * expressions with non-literal constructor state (e.g. broadcast-sized
  * lookup arrays — see `graft.operators.RangeIndexOf`) cannot route
  * them through the SQL function registry, so this is the standard
  * extension-library shim (same approach as Sedona/Glow et al.). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
