package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}
import scala.collection.mutable

/** Optimization-round instrumentation: run named declared queries once
  * (warm) + once timed through the noop sink with a SparkListener
  * attached, and print a per-job / per-stage time table — the substitute
  * for the Spark UI (disabled in this harness) that tells us WHICH
  * stage of a 20-job composite owns the wall-clock.
  *
  * Usage: runMain graft.tools.ProfileRun <sfDir> <q1,q2,...> [reps]
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileRun <sfDir> <q1,q2,...> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.getOrCreate()

    case class JobRow(id: Int, desc: String, ms: Long, stages: Int)
    val jobs = mutable.ArrayBuffer[JobRow]()
    val jobStart = mutable.Map[Int, (Long, String, Int)]()
    val stageMs = mutable.ArrayBuffer[(Int, String, Long, Int)]()
    var collect = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (collect) jobStart(js.jobId) = (System.nanoTime(),
          Option(js.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse(""),
          js.stageInfos.size)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (collect) jobStart.remove(je.jobId).foreach { case (t0, d, n) =>
          jobs += JobRow(je.jobId, d, (System.nanoTime() - t0) / 1000000, n)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collect) {
          val si = sc.stageInfo
          val ms = (for (a <- si.completionTime; b <- si.submissionTime)
            yield a - b).getOrElse(-1L)
          // first graft frame in the callsite stack, so a stage maps to
          // the operator that created it; executorRunTime distinguishes
          // "one slow task" from "lots of total CPU"
          val where = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("tools.Profile"))
            .getOrElse(si.name.takeWhile(_ != '\n')).trim.take(110)
          val cpuMs = si.taskMetrics.executorRunTime
          stageMs += ((si.stageId, s"cpu=${cpuMs}ms $where", ms, si.numTasks))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm (codegen/JIT) — uncollected
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (1 to reps).foreach { r =>
        jobs.clear(); stageMs.clear(); collect = true
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val total = (System.nanoTime() - t0) / 1e9
        collect = false
        // listener events are async; give the bus a moment
        Thread.sleep(500)
        println(f"\n== $name rep $r total ${total}%.2f s — jobs ==")
        jobs.sortBy(-_.ms).take(30).foreach { j =>
          println(f"  job ${j.id}%4d ${j.ms}%7d ms stages=${j.stages}%3d ${j.desc.take(80)}")
        }
        println(s"== $name rep $r — slowest stages ==")
        stageMs.sortBy(-_._3).take(25).foreach { case (id, nm, ms, nt) =>
          println(f"  stage $id%5d ${ms}%7d ms tasks=$nt%4d  $nm")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
