package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Enrichment
import graft.operators.DateDim

/** Star-schema warehouse build (data_transformation_pipeline.py +
  * init_schema.sql:236-437): dim_date, dim_students, dim_courses and the
  * three fact tables.
  *
  * Surrogate keys are xxhash64 of the natural key — stable across runs and
  * partitionings (required for idempotent upserts; the reference's SERIAL
  * keys are only stable because Postgres is a single node), and computed
  * map-side with no global sort or driver round-trip, unlike
  * monotonically_increasing_id / row_number-over-everything which either
  * break run-to-run stability or serialize on one partition at 100 TB.
  */
object Warehouse {

  def sk(natural: Column): Column = xxhash64(natural)

  /** dim_date 2020-01-01..2026-12-31 (init_schema.sql:612 — 2557 days). */
  def dimDate(spark: SparkSession): DataFrame =
    DateDim.fromRange(spark, java.sql.Date.valueOf("2020-01-01"),
      java.sql.Date.valueOf("2026-12-31"))

  def dateKey(d: Column): Column =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("int")

  /** dim_students: staged students + derived age/enrollment/status fields +
    * deterministic risk enrichment (quirk Q-5 fixed: real flags propagate;
    * the reference's 42.0 stub is replaced by the langgraph scorer run as a
    * Column expression). `progressSummary` supplies real last_activity
    * (quirk Q-4 fixed). */
  def dimStudents(staged: DataFrame, progressSummary: DataFrame, asOf: Column): DataFrame = {
    val age = Transform.deriveAge(col("c_dob"), asOf)
    val payment = Transform.mapPaymentStatus(col("payment_status"))
    val joined = staged
      .join(progressSummary.select(
          col("student_id").as("ps_id"), col("last_activity_date"),
          col("avg_score").as("ps_avg_score"),
          col("total_courses_enrolled"), col("total_modules_completed"),
          col("total_time_spent_hours")),
        col("c_student_id") === col("ps_id"), "left")
    val completionRate = round(coalesce(col("ps_avg_score"), lit(0.0)), 2)
    val risk = Enrichment.riskScore(
      datediff(asOf, col("last_activity_date")), completionRate, initcap(payment))
    joined.select(
      Seq(
        sk(col("c_student_id")).as("student_sk"),
        col("c_student_id").as("student_id"),
        col("c_first_name").as("first_name"),
        col("c_last_name").as("last_name"),
        col("c_full_name").as("full_name"),
        col("c_email").as("email"),
        col("c_phone").as("phone"),
        col("c_dob").as("dob"),
        age.as("age"),
        Transform.ageGroup(age).as("age_group"),
        col("c_gender").as("gender"),
        col("c_city").as("city"),
        col("c_state").as("state"),
        col("c_enrollment_date").as("enrollment_date")) ++
      Transform.enrollmentFields(col("c_enrollment_date")) ++
      Seq(
        col("c_program_id").as("program_id"),
        payment.as("payment_status"),
        col("c_fee_paid").as("fee_paid"),
        coalesce(col("total_courses_enrolled"), lit(0L)).as("total_courses_enrolled"),
        coalesce(col("total_modules_completed"), lit(0L)).as("total_modules_completed"),
        coalesce(col("total_time_spent_hours"), lit(0.0)).as("total_time_spent_hours"),
        col("ps_avg_score").as("avg_score"),
        col("last_activity_date"),
        datediff(asOf, col("last_activity_date")).as("days_since_last_activity"),
        Transform.enrollmentStatus(payment, col("last_activity_date"), asOf)
          .as("enrollment_status"),
        risk.cast("double").as("ai_risk_score"),
        Enrichment.riskCategory(risk).as("ai_risk_category"),
        col("quality_score"),
        col("is_email_valid"),
        col("is_duplicate")): _*)
  }

  /** dim_courses straight from the catalog (data_transformation_pipeline.py:114-129). */
  def dimCourses(catalog: DataFrame): DataFrame =
    catalog.select(
      sk(col("course_id")).as("course_sk"),
      upper(col("course_id")).as("course_id"),
      col("course_name"),
      col("category"),
      col("difficulty"),
      col("duration_hours").cast("int").as("duration_hours"),
      col("price").cast("decimal(15,2)").as("price"),
      col("instructor_name"),
      (upper(coalesce(col("is_active"), lit("TRUE"))) === "TRUE").as("is_active"))

  /** fact_student_progress: cleaned events + dim SKs (broadcast left joins,
    * J-1) + date_key (data_transformation_pipeline.py:142-181). */
  def factProgress(progress: DataFrame, dimStudents: DataFrame,
                   dimCourses: DataFrame): DataFrame =
    progress
      .join(broadcast(dimStudents.select(col("student_sk"), col("student_id").as("__ds_id"))),
        progress("c_student_id") === col("__ds_id"), "left")
      .join(broadcast(dimCourses.select(col("course_sk"), col("course_id").as("__dc_id"))),
        progress("c_course_id") === col("__dc_id"), "left")
      .select(
        col("event_id"),
        col("student_sk"), col("course_sk"),
        dateKey(to_date(col("c_event_timestamp"))).as("date_key"),
        col("event_type"),
        col("c_event_timestamp").as("event_timestamp"),
        col("c_duration_seconds").as("duration_seconds"),
        col("c_score").as("score"),
        col("module_id"),
        col("c_completion_percentage").as("completion_percentage"),
        col("quality_score"))

  /** fact_enrollments derived per (student, course) from progress events —
    * fixing quirk Q-3 (the reference writes a single NULL-keyed row). */
  def factEnrollments(factProgress: DataFrame, dimCourses: DataFrame): DataFrame =
    factProgress
      .filter(col("student_sk").isNotNull && col("course_sk").isNotNull)
      .groupBy(col("student_sk"), col("course_sk"))
      .agg(
        min(to_date(col("event_timestamp"))).as("enrolled_date"),
        count(lit(1)).as("n_events"),
        max(col("completion_percentage")).as("max_completion_pct"),
        avg(col("score")).as("avg_score"),
        (sum(coalesce(col("duration_seconds"), lit(0))) / 60.0).as("total_minutes"))
      .join(broadcast(dimCourses.select(col("course_sk"), col("price"))), Seq("course_sk"), "left")
      .withColumn("fee_paid", col("price")).drop("price")

  /** fact_support_tickets (data_transformation_pipeline.py:184-227). */
  def factTickets(tickets: DataFrame, dimStudents: DataFrame): DataFrame = {
    val (sentLabel, sentScore) = Enrichment.sentiment(
      concat_ws(" ", col("subject"), col("description")))
    tickets
      .join(broadcast(dimStudents.select(col("student_sk"), col("student_id").as("__ds_id"))),
        tickets("c_student_id") === col("__ds_id"), "left")
      .select(
        col("ticket_id"),
        col("student_sk"),
        dateKey(col("c_created_date")).as("created_date_key"),
        col("subject"), col("description"),
        col("priority"), col("status"), col("category"),
        col("c_created_date").as("created_date"),
        col("c_resolved_date").as("resolved_date"),
        datediff(col("c_resolved_date"), col("c_created_date")).as("resolution_days"),
        sentLabel.as("ai_sentiment"),
        sentScore.as("ai_sentiment_score"),
        col("quality_score"))
  }

  /** A-8: fact_daily_metrics rollup (init_schema.sql:409-437 — declared but
    * never populated by the reference; derived here from the facts). */
  def factDailyMetrics(factProgress: DataFrame, factTickets: DataFrame): DataFrame = {
    val p = factProgress.groupBy(col("date_key"))
      .agg(
        countDistinct(col("student_sk")).as("active_students"),
        count(lit(1)).as("total_events"),
        (sum(coalesce(col("duration_seconds"), lit(0))) / 3600.0).as("total_hours"),
        avg(col("quality_score")).as("avg_quality_score"))
    val t = factTickets.groupBy(col("created_date_key").as("date_key"))
      .agg(count(lit(1)).as("tickets_created"))
    p.join(t, Seq("date_key"), "full_outer")
      .na.fill(0, Seq("active_students", "total_events", "tickets_created"))
      .na.fill(0.0, Seq("total_hours"))
  }
}
