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

  /** Release the storage blocks behind a `localCheckpoint()`ed Dataset.
    *
    * `Dataset.unpersist` only talks to the CacheManager; a local
    * checkpoint's blocks belong to the underlying RDD (reachable through
    * the plan's `LogicalRDD`, which is `private[sql]` — hence this lives
    * in the bridge). Driver-iterated loops (connected components, BPE
    * rounds) replace their checkpoint every round; without this the
    * superseded rounds' blocks stay pinned until the session boundary —
    * old-gen ballast whose eventual collection lands inside somebody
    * else's timing window (SURVEY §6.2, r15).
    *
    * Caller contract: the Dataset must be SUPERSEDED — a localCheckpoint
    * has truncated lineage, so its rows are unrecoverable after this.
    * No-op for plans that are not a materialized checkpoint/RDD scan.
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.logical match {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
      case _ => ()
    }
}
