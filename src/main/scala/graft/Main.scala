package graft

import graft.etl.{Metadata, Pipeline, Report, Sinks}

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
    val startTime = new java.sql.Timestamp(System.currentTimeMillis())
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

    // metadata/audit layer (reference init_schema.sql:541-592)
    val runId = java.util.UUID.randomUUID().toString
    val endTime = new java.sql.Timestamp(System.currentTimeMillis())
    val read = pipe.rawStudents.count() + pipe.rawProgress.count() + pipe.rawTickets.count()
    val written = pipe.stagedStudents.count() + pipe.stagedProgress.count() +
      pipe.stagedTickets.count()
    Metadata.runLog(spark, runId, "eduflow_batch", "graft.Main",
        startTime, endTime, "SUCCESS", read, written, read - written, inputDir)
      .write.mode("append").parquet(s"$outDir/metadata_pipeline_runs")
    Metadata.qualityLog(runId, "stg_students", pipe.stagedStudents, pipe.ruleStats)
      .write.mode("append").parquet(s"$outDir/metadata_data_quality_summary")
    Metadata.aiLog(spark, runId, "student_risk_scorer", pipe.dimStudents.count(),
        (endTime.getTime - startTime.getTime) / 1000.0, tokensUsed = 0L, "SUCCESS")
      .write.mode("append").parquet(s"$outDir/metadata_ai_processing_log")

    println(s"[graft] warehouse + report + metadata written to $outDir")
    spark.stop()
  }
}
