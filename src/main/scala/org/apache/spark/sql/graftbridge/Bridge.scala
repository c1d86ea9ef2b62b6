package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Expression↔Column converters
  * (Spark 4 removed the public `new Column(expr)` constructor in the
  * Connect refactor). Lives inside the org.apache.spark.sql package tree
  * solely to satisfy the access modifier; nothing else belongs here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test hook: apply a SparkSessionExtensions' injected functions to a
    * registry (`registerFunctions` is private[sql]).
    */
  def applyFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
                     reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}
