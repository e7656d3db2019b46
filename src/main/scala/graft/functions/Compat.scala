package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge

/** Spark 4 moved `Column` onto `ColumnNode`s; these helpers bridge to raw
  * Catalyst [[Expression]]s for our native expressions (classic, non-Connect).
  */
object Compat {
  def column(e: Expression): Column = ColumnBridge.column(e)
  def expression(c: Column): Expression = ColumnBridge.expression(c)
}
