package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.BpeOps

/** Measurement main for the batched-BPE driver-loop claim (SURVEY §2.10
  * X66b): train `merges` rules on a documents fixture at each batch size
  * and print rounds + wall-time, for both the strict (sequence-identical)
  * and loose (classic fast-trainer) acceptance rules. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/repo/tmp/sf1w \
  *     sbt "runMain graft.tools.BpeScale 1000 1,8,32"
  *
  * Measurement tooling only — results land in SURVEY §6.3/§2.10; the
  * oracle-gated x70 entry stays on batch=1 strict.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(1000)
    val batches = args.drop(1).headOption.getOrElse("1,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1w")
    val spark = graft.GraftSession.getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (strict <- Seq(true, false); b <- batches) {
      // batch=1 is identical under both rules — measure it once
      if (strict || b > 1) {
        val t0 = System.nanoTime()
        val (rules, _, rounds) =
          BpeOps.trainMergesDetailed(docs, merges, batch = b, strict = strict)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[bpescale] strict=$strict%-5s batch=$b%-3d rules=${rules.size}%-5d rounds=$rounds%-5d sec=$sec%.1f")
      }
    }
    spark.stop()
  }
}
