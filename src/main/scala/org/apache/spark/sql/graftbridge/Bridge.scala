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
    * Caller contract — this is a DESTRUCTIVE narrow-purpose helper, not
    * a general cleanup: it unpersists whatever persisted RDD backs the
    * plan's root RDD scan. The Dataset must be one the CALLER created
    * via `localCheckpoint()` and has fully superseded (a checkpoint's
    * lineage is truncated, so its rows are UNRECOVERABLE after this —
    * unpersisting someone else's RDD-backed frame loses their data,
    * not just a cache). No-op for plans that are not an RDD scan or
    * whose RDD is not persisted.
    */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.logical match {
          case l: org.apache.spark.sql.execution.LogicalRDD
              if l.rdd.getStorageLevel !=
                org.apache.spark.storage.StorageLevel.NONE =>
            l.rdd.unpersist(blocking = false)
          case _ => ()
        }
      case _ => ()
    }
}
