package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series operators: fixed-interval resampling with gap fill — the
  * densification step feature pipelines run before windowed training-data
  * extraction (every key gets a row per interval even where no events
  * landed, carrying the last observed value forward).
  */
object TimeOps {

  /** Resample to fixed buckets of `intervalMicros` and forward-fill gaps.
    * Per key: one row per bucket from its first to its last observed
    * bucket; bucket value = max(value) of the bucket's events (max: order-
    * insensitive, so bit-deterministic on doubles), gaps carry the last
    * non-null value forward.
    *
    * Scale shape: one partial-agg shuffle on (key, bucket); the bucket
    * range densifies via a narrow post-agg `sequence` explode (output size
    * = span/interval per key, independent of event count); the fill is one
    * running window per key. No self-joins, no range join.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, intervalMicros: Long): DataFrame = {
    require(intervalMicros > 0, "intervalMicros must be positive")
    val bucket = floor(unix_micros(col(tsCol)) / intervalMicros).cast(LongType)
    val e = df.groupBy(col(keyCol), bucket.as("b"))
      .agg(max(col(valueCol)).as("v"))
    val r = e.groupBy(col(keyCol)).agg(min("b").as("mn"), max("b").as("mx"))
    val g = r.select(col(keyCol), explode(sequence(col("mn"), col("mx"))).as("b"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(e, Seq(keyCol, "b"), "left")
      .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("b"), col("fv"))
  }

  /** Gap-based sessionization: events of one key belong to the same session
    * while consecutive gaps stay ≤ `gapMicros`; a larger gap opens a new
    * session. Emits `session_idx` (1-based per key, in time order) — the
    * classic lag-flag + running-sum plan.
    *
    * Scale shape: a single shuffle on the key; both windows share the same
    * (key, order) partitioning so Spark plans ONE Exchange + ONE Sort and
    * evaluates lag and the running sum in the same window stage. Gaps are
    * compared in epoch MICROSECONDS (`unix_micros`) — integer math that is
    * engine-portable (nanosecond timestamps truncate identically).
    *
    * Ordering ties on ts break by `idCol` so the running sum is
    * deterministic under any partitioning.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val order = Seq(col(tsCol), col(idCol))
    val wLag = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(wLag)
    val newSession = when(prev.isNull || us - prev > gapMicros, 1L)
      .otherwise(0L)
    df.withColumn("session_idx", sum(newSession).over(wRun))
  }
}
