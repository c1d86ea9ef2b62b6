package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE's runtime skew-join split, demonstrated live — the engine's third
  * skew lever next to deterministic salting (DedupOps) and broadcast
  * (small dims): a join whose shuffle lands one hot key in one oversized
  * partition is re-planned AT RUNTIME into split sub-partitions
  * (`skew=true` on the sort-merge join), with no code change at the
  * query site. This is what "AQE handles moderate shuffle skew
  * adaptively at zero cost" (the nearDupPairs salting scaladoc) rests
  * on, proven rather than asserted.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("a hot-key join is re-planned with skew=true and stays correct") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds lowered so the test's ~MB-scale hot partition counts
      // as skewed (production defaults are 256MB-scale)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // capture via getAll MEMBERSHIP, not getOption: getOption returns the
    // built-in default for never-set confs, so the unset-restore branch
    // below would be dead and the shared session would leave all nine
    // confs explicitly pinned to today's defaults
    val setConfs = spark.conf.getAll
    val prev = confs.map { case (k, _) =>
      k -> (if (setConfs.contains(k)) Some(setConfs(k)) else None) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE hot key vs 10 rows each on 99 others; the right
      // side is uniform — classic fact-skew shape
      val left = spark.range(0, 50990).select(
        when(col("id") < 50000L, 0L).otherwise((col("id") % 99L) + 1L)
          .as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = spark.range(0, 100).select(col("id").as("k"),
        col("id").cast("string").as("w"))
      val joined = left.join(right, "k")
      // execute THIS dataset (count() would plan a different
      // QueryExecution whose adaptive plan never finalizes here)
      val n = joined.collect().length
      assert(n == 50990, s"join lost rows under skew split: $n")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
