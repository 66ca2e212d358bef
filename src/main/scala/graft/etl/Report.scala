package graft.etl

import org.apache.spark.sql.DataFrame

/** O-11: run-summary report sink (reference
  * data_transformation_pipeline.py:230-236 writes output/summary_report.md).
  * Deliberately driver-side: a report is a human artifact of bounded size —
  * every input here is an aggregate or a dimension count, never raw data,
  * so the collect() is O(report lines), not O(dataset). */
object Report {

  /** Render table names -> counts plus arbitrary key/value sections. */
  def summaryMarkdown(title: String, counts: Seq[(String, Long)],
                      sections: Seq[(String, DataFrame)] = Nil): String = {
    val sb = new StringBuilder(s"# $title\n\n## Row counts\n\n")
    sb.append("| table | rows |\n|---|---|\n")
    counts.foreach { case (n, c) => sb.append(s"| $n | $c |\n") }
    sections.foreach { case (name, df) =>
      sb.append(s"\n## $name\n\n")
      val cols = df.columns
      sb.append(cols.mkString("| ", " | ", " |\n"))
      sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
      df.collect().foreach { r =>
        sb.append(cols.indices.map(i => String.valueOf(r.get(i)))
          .mkString("| ", " | ", " |\n"))
      }
    }
    sb.toString
  }

  def write(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
  }

  /** The reference's end-of-run report for a pipeline instance. */
  def pipelineSummary(pipe: Pipeline): String =
    summaryMarkdown("EduFlow run summary",
      Seq(
        "raw_students" -> pipe.rawStudents.count(),
        "raw_progress" -> pipe.rawProgress.count(),
        "raw_courses" -> pipe.rawCourses.count(),
        "raw_tickets" -> pipe.rawTickets.count(),
        "stg_students" -> pipe.stagedStudents.count(),
        "stg_progress" -> pipe.stagedProgress.count(),
        "stg_tickets" -> pipe.stagedTickets.count(),
        "dim_students" -> pipe.dimStudents.count(),
        "dim_courses" -> pipe.dimCourses.count(),
        "dim_date" -> pipe.dimDate.count(),
        "fact_student_progress" -> pipe.factProgress.count(),
        "fact_enrollments" -> pipe.factEnrollments.count(),
        "fact_support_tickets" -> pipe.factTickets.count()),
      Seq(
        "Quality summary" -> Transform.qualitySummary(pipe.stagedStudents),
        "Quality analysis" -> Transform.qualityAnalysis(pipe.ruleStats),
        "AI insights" -> pipe.aiInsights,
        "Insights" -> Transform.insightReport(pipe.stagedStudents)))
}
