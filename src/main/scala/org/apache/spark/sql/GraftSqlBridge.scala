package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's sql package for lifting raw Catalyst `Expression`s
  * into user-facing `Column`s and back — the constructors are
  * package-private in Spark 4's unified Column API. Standard technique for
  * libraries that ship custom expressions without requiring every session
  * to be built with `SparkSessionExtensions` (queries here may run on
  * sessions the harness constructs, so registration-free is the safe path).
  */
object GraftSqlBridge {

  /** Wrap a Catalyst expression as a Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
