package graft

import graft.etl.{Pipeline, Report, Sinks}

/** CLI entry point (SURVEY §7.1): run the EduFlow batch pipeline against a
  * data directory and materialize the warehouse + run report.
  *
  * Usage: runMain graft.Main <inputDir> <outDir> [asOfDate]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val inputDir = args.headOption.getOrElse("/root/reference/input_data")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-out"
    val asOf = if (args.length > 2) args(2) else "2024-06-01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

    val spark = Engine.localSession(cpus, "graft-pipeline")
    val pipe = Pipeline(spark, inputDir, asOf)

    Seq(
      "dim_date" -> pipe.dimDate,
      "dim_students" -> pipe.dimStudents,
      "dim_courses" -> pipe.dimCourses,
      "fact_support_tickets" -> pipe.factTickets,
      "fact_enrollments" -> pipe.factEnrollments,
      "analytics_student360" -> pipe.student360,
      "analytics_course_performance" -> pipe.coursePerformance,
      "analytics_ai_insights" -> pipe.aiInsights,
    ).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    // facts with a date key are partitioned for read-side pruning
    Sinks.writePartitionedFact(pipe.factProgress, s"$outDir/fact_student_progress")
    Sinks.writePartitionedFact(pipe.factDailyMetrics, s"$outDir/fact_daily_metrics")

    Report.write(s"$outDir/summary_report.md", Report.pipelineSummary(pipe))
    println(s"[graft] warehouse + report written to $outDir")
    spark.stop()
  }
}
