package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The analytics layer: the reference's 4 views (init_schema.sql:445-534)
  * as DataFrame builders. The correlated scalar subqueries of v_student_360
  * become one pre-aggregation + broadcast-able left join (J-5 decorrelated
  * by hand — one shuffle over tickets instead of a per-row subquery). */
object Views {

  /** Q-student-360. */
  def student360(dimStudents: DataFrame, factTickets: DataFrame): DataFrame = {
    val tix = factTickets.groupBy(col("student_sk").as("t_sk"))
      .agg(
        count(lit(1)).as("total_tickets"),
        count(when(col("status") === "Open", 1)).as("open_tickets"))
    dimStudents
      .join(tix, col("student_sk") === col("t_sk"), "left")
      .select(
        col("student_id"), col("full_name"), col("email"), col("phone"),
        col("age"), col("age_group"), col("city"), col("state"),
        col("enrollment_date"), col("enrollment_status"), col("payment_status"),
        col("fee_paid"), col("total_courses_enrolled"),
        col("total_time_spent_hours"), col("avg_score"),
        col("last_activity_date"), col("days_since_last_activity"),
        col("ai_risk_score"), col("ai_risk_category"), col("quality_score"),
        coalesce(col("total_tickets"), lit(0L)).as("total_tickets"),
        coalesce(col("open_tickets"), lit(0L)).as("open_tickets"))
  }

  /** Q-course-performance. */
  def coursePerformance(dimCourses: DataFrame, factEnrollments: DataFrame): DataFrame =
    dimCourses
      .join(factEnrollments, Seq("course_sk"), "left")
      .groupBy(col("course_sk"), col("course_id"), col("course_name"),
        col("category"), col("difficulty"), col("price"))
      .agg(
        countDistinct(col("student_sk")).as("total_enrollments"),
        sum(col("fee_paid")).as("total_revenue"),
        avg(col("max_completion_pct")).as("avg_completion_rate"),
        avg(col("avg_score")).as("avg_student_score"),
        (sum(col("total_minutes")) / 60.0).as("total_hours_spent"))
      .drop("course_sk")

  /** Q-daily-dashboard (newest first). */
  def dailyDashboard(factDailyMetrics: DataFrame, dimDate: DataFrame): DataFrame =
    factDailyMetrics
      .join(dimDate, Seq("date_key"))
      .select(
        col("full_date"), col("day_name"), col("month_name"), col("year"),
        col("active_students"), col("total_events"), col("total_hours"),
        col("tickets_created"), col("avg_quality_score"))
      .orderBy(col("full_date").desc)

  /** Q-ai-insights: three labelled global counts UNION ALL. */
  def aiInsights(dimStudents: DataFrame, factTickets: DataFrame): DataFrame = {
    def metric(df: DataFrame, name: String, description: String): DataFrame =
      df.agg(count(lit(1)).as("metric_value"))
        .select(lit(name).as("metric_name"), col("metric_value"),
          lit(description).as("description"))
    metric(dimStudents.filter(col("ai_risk_score") > 70),
        "High Risk Students", "Students with risk score > 70")
      .unionByName(metric(
        factTickets.filter(col("ai_sentiment").isin("Negative", "Very Negative")),
        "Negative Sentiment Tickets", "Tickets with negative sentiment"))
      .unionByName(metric(dimStudents.filter(col("quality_score") < 60),
        "Low Quality Records", "Student records with quality score < 60"))
  }
}
