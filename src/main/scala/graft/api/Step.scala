package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A pure bundle→bundle transformation (≙ cherry's `StepKind` dispatch,
  * `src/cherry_etl/pipeline.py:38-75`: every step receives and returns the
  * whole `Dict[str, pa.Table]`). DataFrames are lazy plans, so a step is
  * plan composition — Catalyst sees through the whole chain and optimizes
  * globally (filter pushdown through N steps, column pruning end-to-end).
  */
trait Step {
  def apply(spark: SparkSession, tables: Map[String, DataFrame]): Map[String, DataFrame]
}
