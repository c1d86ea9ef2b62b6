package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Distributed order statistics and dataset profiling.
  *
  * The exact-quantile plan is the 100 TB answer to "what is the p99": a
  * histogram pass that needs only map-side-combinable counts, a driver-side
  * bucket search over BOUNDED metadata (one count per populated bucket), and
  * a selection pass that sorts only the rows of the target buckets — never
  * a full per-group sort of the corpus (a window/row_number plan ships every
  * row of a group through one task's sort; fine for small groups, fatal for
  * "percentile over the whole corpus").
  */
object StatOps {

  /** Exact per-group quantiles by two-pass histogram selection.
    *
    * Quantile spec: (name, num, den) picks the value at 1-based rank
    * `ceil(num·n/den)` — p50 = (\"p50\", 1, 2), p99 = (\"p99\", 99, 100) —
    * the same exact-integer position contract as rank-selection SQL, so
    * results are reproducible bit-for-bit across engines.
    *
    * Plan: (1) per-group min/max (tiny agg); (2) per-(group, bucket) counts
    * over `buckets` linear bins (map-side combine; driver receives ≤
    * groups×buckets longs — bounded metadata, not data); (3) rows of the
    * target buckets only are ranked with a window and the target ranks
    * picked. Skewed value distributions degrade gracefully: a hot bucket
    * means pass 3 sorts more rows, never wrong answers. NaNs are not
    * supported (they have no place on the quantile axis); nulls are ignored.
    *
    * Returns one row per group: groupCol, then one DoubleType column per
    * quantile name.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     quantiles: Seq[(String, Long, Long)],
                     buckets: Int = 8192): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, num, den) =>
      num > 0 && den > 0 && num <= den }, "quantiles must be in (0, 1]")
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    import spark.implicits._

    val v = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)

    // Pass 1: per-group bounds (one row per group).
    val bounds = v.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n"))
    val boundRows = bounds.collect().map { r =>
      r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))
    }.toMap

    // Bucket id of a value, given group bounds (clamped; degenerate
    // lo == hi collapses to bucket 0). Must be IDENTICAL in pass 2 and 3.
    def bucketCol(lo: Column, hi: Column): Column =
      least(greatest(
        floor((col("v") - lo) / (hi - lo + lit(Double.MinPositiveValue))
          * buckets).cast(LongType), lit(0L)), lit(buckets - 1L))

    val boundsDf = broadcast(
      boundRows.toSeq.map { case (g, (lo, hi, _)) => (g, lo, hi) }
        .toDF("g", "lo", "hi"))

    // Pass 2: histogram — counts per (group, bucket), map-side combined.
    val hist = v.join(boundsDf, "g")
      .groupBy(col("g"), bucketCol(col("lo"), col("hi")).as("b"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

    // Driver-side bucket search: for each group and quantile, walk the
    // cumulative histogram to the bucket holding the target rank.
    val targets: Seq[(String, Long, String, Long)] = // (g, bucket, qname, rankInBucket)
      boundRows.toSeq.flatMap { case (g, (_, _, n)) =>
        quantiles.map { case (qname, num, den) =>
          val rank = (num * n + den - 1) / den // ceil(num·n/den), ≥ 1
          var cum = 0L
          var b = 0L
          var found = -1L
          while (found < 0 && b < buckets) {
            val c = hist.getOrElse((g, b), 0L)
            if (cum + c >= rank) found = b else { cum += c; b += 1 }
          }
          require(found >= 0, s"rank $rank not found for group $g (histogram inconsistent)")
          (g, found, qname, rank - cum)
        }
      }
    val targetDf = broadcast(targets.toDF("tg", "tb", "qname", "rk"))

    // Pass 3: rank only the target buckets' rows; pick the target ranks.
    val w = Window.partitionBy(col("g"), col("b")).orderBy(col("v"))
    val picked = v.join(boundsDf, "g")
      .withColumn("b", bucketCol(col("lo"), col("hi")))
      .join(targetDf.select(col("tg").as("g"), col("tb").as("b")).distinct(),
        Seq("g", "b"), "left_semi")
      .withColumn("rn", row_number().over(w))
      .join(targetDf, col("rn") === col("rk") &&
        col("g") === col("tg") && col("b") === col("tb"))
      .select(col("g"), col("qname"), col("v"))

    val agg = quantiles.map { case (qname, _, _) =>
      min(when(col("qname") === qname, col("v"))).as(qname)
    }
    picked.groupBy(col("g").as(groupCol))
      .agg(agg.head, agg.tail: _*)
  }

  /** Single-pass numeric column profiling: one output row per column with
    * count / null count / exact distinct / min / max. The ANALYZE-style
    * dataset fingerprint a pipeline records before training runs. One scan;
    * all aggregates map-side combinable except the exact distincts (each an
    * expand-shuffle — the price of exactness; x33's HLL sketches are the
    * approximate path).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        count(lit(1)).as(s"__t_$c"),
        count_distinct(col(c)).as(s"__d_$c"),
        min(col(c)).cast(DoubleType).as(s"__mn_$c"),
        max(col(c)).cast(DoubleType).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col(s"__t_$c") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_v"),
        col(s"__mx_$c").as("max_v"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
