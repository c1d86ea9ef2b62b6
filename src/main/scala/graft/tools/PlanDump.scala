package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Optimization-round instrumentation: dump `.explain("formatted")` for
  * named declared queries to files — the before/after plan evidence the
  * round log cites (`plans/r<round>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(sfDir, outDir, tag, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.getOrCreate()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
