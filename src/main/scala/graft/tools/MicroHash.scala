package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.GraftSession

/** Microbench: fused Hash60 kernel vs the md5/conv spelling, in a plain
  * projection (codegen) and inside a transform() lambda (interpreted —
  * the winnowFingerprints/removeSpans usage). Optimization-round
  * instrumentation only.
  */
object MicroHash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"[micro] $tag ${math.min(t1 - t0, System.nanoTime() - t1) / 1e9}%.3f s")
    }
    val df = spark.range(n).select(
      concat(lit("w"), col("id"), lit(" tok "), col("id") * 7).as("s"))
    val oldH = conv(substring(md5(col("s")), 1, 15), 16, 10).cast(LongType)
    val newH = graft.ops.TextOps.hash60(col("s"))
    time("projection old")(df.select(sum(oldH % 1000000)).collect())
    time("projection new")(df.select(sum(newH % 1000000)).collect())
    // lambda form: hash each element of a small array per row
    val arr = spark.range(n / 10).select(
      transform(sequence(lit(0), lit(9)),
        k => concat(lit("w"), col("id"), lit(" t "), k.cast("string")))
        .as("a"))
    def lamOld = arr.select(sum(aggregate(
      transform(col("a"), s => conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)),
      lit(0L), (acc, x) => acc + x % 1000000))).collect()
    def lamNew = arr.select(sum(aggregate(
      transform(col("a"), s => graft.ops.TextOps.hash60(s)),
      lit(0L), (acc, x) => acc + x % 1000000))).collect()
    time("lambda old")(lamOld)
    time("lambda new")(lamNew)
    spark.stop()
  }
}
