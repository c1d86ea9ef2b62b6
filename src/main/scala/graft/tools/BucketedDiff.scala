package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.StatOps
import graft.sinks.BucketedCatalogSink

/** Measurement main for the bucketed-layout claim (SURVEY §6.3): persist
  * the two x114 corpus snapshots through [[BucketedCatalogSink]] (and,
  * as the control, plain unbucketed tables), then time the x114
  * snapshot-diff full-outer join over each layout. The write is the
  * one-time layout cost; the diff is what every refresh pays — the trade
  * the sink exists for. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.BucketedDiff"
  *
  * Measurement tooling only — the oracle-gated x114 entry stays on the
  * in-memory snapshots (the correctness gate has no warehouse), and the
  * plan gate lives in BucketedJoinSpec.
  */
object BucketedDiff {
  private def time[T](reps: Int)(f: => T): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.getOrCreate()
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    // the x114 synthesis — the ONE shared definition the query uses
    val nw = graft.sql.ExtensionQueries.refreshSnapshot(d)

    def drop(names: String*): Unit =
      names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    drop("bdiff_old_b", "bdiff_new_b", "bdiff_old_u", "bdiff_new_u",
      "bdiff_warm")
    // warm the catalog/committer path before timing either layout: the
    // session's FIRST saveAsTable pays warehouse init + codec/classload
    // costs that would otherwise be charged to whichever write ran first
    d.limit(1).write.mode("overwrite").saveAsTable("bdiff_warm")
    drop("bdiff_warm")
    val wPlain = time(1) {
      d.write.mode("overwrite").saveAsTable("bdiff_old_u")
      nw.write.mode("overwrite").saveAsTable("bdiff_new_u")
    }
    val wBucketed = time(1) {
      BucketedCatalogSink(Map(
          "bdiff_old_b" -> ("doc_id", 32), "bdiff_new_b" -> ("doc_id", 32)))
        .push(Map("bdiff_old_b" -> d, "bdiff_new_b" -> nw))
    }

    def diff(o: String, n: String): DataFrame =
      StatOps.snapshotDiff(spark.table(o), spark.table(n), "doc_id", "text")
    def run(o: String, n: String): Double = time(reps) {
      diff(o, n).write.mode("overwrite").format("noop").save()
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val tB = run("bdiff_old_b", "bdiff_new_b")
      val tU = run("bdiff_old_u", "bdiff_new_u")
      val pB = diff("bdiff_old_b", "bdiff_new_b")
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(pB).length
      println(f"""{"metric":"bucketed_x114","diff_bucketed_sec":$tB%.3f,""" +
        f""""diff_unbucketed_sec":$tU%.3f,"write_bucketed_sec":$wBucketed%.3f,""" +
        f""""write_plain_sec":$wPlain%.3f,"bucketed_plan_exchanges":$exchanges,""" +
        s""""reps":$reps,"sf":"$dir"}""")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      drop("bdiff_old_b", "bdiff_new_b", "bdiff_old_u", "bdiff_new_u")
      spark.stop()
    }
  }
}
