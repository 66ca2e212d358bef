package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch pipeline: the three reference DAGs composed as one
  * lazy Spark lineage (ingest -> clean -> staging -> warehouse -> views).
  * Where the reference crosses process/DB boundaries between every task
  * (XCom + psycopg2), this is a single Catalyst plan per output — stage
  * boundaries replace task boundaries (SURVEY §3.1-3.3).
  *
  * @param asOfDate frozen "today" (the reference calls wall-clock at 6
  *                 sites; a pinned clock makes runs reproducible)
  */
final case class Pipeline(spark: SparkSession, inputDir: String, asOfDate: String) {

  private val asOf: Column = to_date(lit(asOfDate))
  private val asOfTs: Column = to_timestamp(lit(asOfDate + " 23:59:59"))

  def csv(name: String): String = s"$inputDir/$name.csv"

  // entry point 1: ingestion (raw layer with lineage)
  lazy val rawStudents: DataFrame = Ingest.ingest(spark, csv("students_enrollment"),
    Schemas.students, Schemas.requiredColumns("students_enrollment"), "batch-1")
  lazy val rawProgress: DataFrame = Ingest.ingest(spark, csv("student_progress"),
    Schemas.progress, Schemas.requiredColumns("student_progress"), "batch-1")
  lazy val rawCourses: DataFrame = Ingest.ingest(spark, csv("course_catalog"),
    Schemas.courses, Schemas.requiredColumns("course_catalog"), "batch-1")
  lazy val rawTickets: DataFrame = Ingest.ingest(spark, csv("support_tickets"),
    Schemas.tickets, Schemas.requiredColumns("support_tickets"), "batch-1")
  lazy val cityMaster: DataFrame =
    Ingest.readCsv(spark, csv("city_master"), Schemas.cityMaster)

  // entry point 2: cleaning -> staging (idempotent upsert semantics).
  // Staging and dims are persisted: every fact/view downstream re-reads
  // them, and in production they'd be materialized tables anyway.
  lazy val stagedStudents: DataFrame = Clean.toStaging(
    Clean.students(rawStudents, cityMaster, asOf), "c_student_id", "file_row_number")
    .persist()
  lazy val stagedProgress: DataFrame = Clean.toStaging(
    Clean.progress(rawProgress, asOfTs), "event_id", "file_row_number")
    .persist()
  lazy val stagedTickets: DataFrame = Clean.toStaging(
    Clean.tickets(rawTickets, asOf), "ticket_id", "file_row_number")
    .persist()

  /** Per-rule invalid counters over staged students (the rule_stats JSONB
    * shape, reference init_schema.sql:573). */
  lazy val ruleStats: DataFrame = Transform.ruleStats(stagedStudents, Seq(
    "is_student_id_valid", "is_name_valid", "is_email_valid",
    "is_phone_valid", "is_dob_valid", "is_gender_valid", "is_city_valid",
    "is_state_valid", "is_enrollment_date_valid", "is_fee_valid"))

  // entry point 3: transformation -> warehouse
  lazy val progressSummary: DataFrame =
    Transform.studentProgressSummary(stagedProgress, asOfTs)
  lazy val dimDate: DataFrame = Warehouse.dimDate(spark)
  lazy val dimStudents: DataFrame =
    Warehouse.dimStudents(stagedStudents, progressSummary, asOf).persist()
  lazy val dimCourses: DataFrame = Warehouse.dimCourses(rawCourses).persist()
  lazy val factProgress: DataFrame =
    Warehouse.factProgress(stagedProgress, dimStudents, dimCourses).persist()
  lazy val factEnrollments: DataFrame =
    Warehouse.factEnrollments(factProgress, dimCourses)
  lazy val factTickets: DataFrame =
    Warehouse.factTickets(stagedTickets, dimStudents)
  lazy val factDailyMetrics: DataFrame =
    Warehouse.factDailyMetrics(factProgress, factTickets)

  // analytics layer
  lazy val student360: DataFrame = Views.student360(dimStudents, factTickets)
  lazy val coursePerformance: DataFrame =
    Views.coursePerformance(dimCourses, factEnrollments)
  lazy val dailyDashboard: DataFrame =
    Views.dailyDashboard(factDailyMetrics, dimDate)
  lazy val aiInsights: DataFrame = Views.aiInsights(dimStudents, factTickets)
}
