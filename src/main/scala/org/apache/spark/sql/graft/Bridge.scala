package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4's Column wraps a ColumnNode and the conversion helpers
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are private[sql], so
  * custom native expressions (graft.expressions.*) need this one-file
  * shim living under the org.apache.spark.sql package namespace — the
  * same access pattern third-party Spark extensions use. No Spark
  * internals are modified or shadowed here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
