package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Job/stage/task census for one registered query — the measurement that
  * attributes a small-SF query's wall time to scheduling floor vs compute:
  * runMain graft.tools.ProfileQ <sfDir> <name> [reps]
  *
  * Prints, per rep: wall seconds, #jobs, #stages, #tasks, summed task
  * runtime, summed executor CPU, JVM GC — plus a per-job table (wall,
  * stages, tasks) for the final rep. A query whose wall >> summed task
  * runtime / cores is paying job-launch / barrier overhead, not compute;
  * that is the signal to collapse actions (lazy checkpoints, fewer
  * materialization barriers), not to tune operators.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Engine.localSession(cpus, "graft-profileq")
    val sc = spark.sparkContext

    final class Census extends SparkListener {
      val jobStart = mutable.Map[Int, Long]()
      val jobWall = mutable.LinkedHashMap[Int, Double]()
      val jobStages = mutable.Map[Int, Int]()
      var stages = 0
      var tasks = 0
      var taskRuntimeMs = 0L
      var taskCpuNs = 0L
      var gcMs = 0L
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobStart(e.jobId) = System.nanoTime()
        jobStages(e.jobId) = e.stageInfos.size
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobStart.get(e.jobId).foreach { t0 =>
          jobWall(e.jobId) = (System.nanoTime() - t0) / 1e9 }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = e.taskMetrics
        if (m != null) {
          taskRuntimeMs += m.executorRunTime
          taskCpuNs += m.executorCpuTime
          gcMs += m.jvmGCTime
        }
      }
    }

    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      graft.operators.Checkpoints.releaseQueryScoped(spark)
      val census = new Census
      sc.addSparkListener(census)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain so the census is complete
      org.apache.spark.sql.graft.shim.waitListenerBusEmpty(sc, 10000L)
      sc.removeSparkListener(census)
      println(f"[profileq] $name rep$i: wall=$wall%.3f s rows=$n " +
        f"jobs=${census.jobWall.size} stages=${census.stages} " +
        f"tasks=${census.tasks} taskRuntime=${census.taskRuntimeMs / 1e3}%.3f s " +
        f"taskCpu=${census.taskCpuNs / 1e9}%.3f s gc=${census.gcMs} ms")
      if (i == reps) {
        census.jobWall.foreach { case (id, w) =>
          println(f"[profileq]   job $id%4d wall=$w%.3f s stages=${census.jobStages.getOrElse(id, -1)}")
        }
      }
    }
    spark.stop()
  }
}
