package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's 4 declared transformations (dags/utils/transformations.py)
  * as Column expressions + the A-1/A-2 aggregations in their per-group form
  * (quirk Q-2 resolved to the spec's per-student/per-course intent; the
  * reference's global call is the degenerate no-group case).
  */
object Transform {

  /** Age in completed years at `asOf` (transformations.py:9-14).
    * floor(months_between/12) reproduces the (month, day) comparison. */
  def deriveAge(dob: Column, asOf: Column): Column =
    when(dob.isNotNull, greatest(floor(months_between(asOf, dob) / 12).cast("int"), lit(0)))

  /** Buckets 18-22 / 23-27 / 28-35 / 35+ (transformations.py:17-26). */
  def ageGroup(age: Column): Column =
    when(age.isNull, null)
      .when(age <= 22, "18-22")
      .when(age <= 27, "23-27")
      .when(age <= 35, "28-35")
      .otherwise("35+")

  /** Enrollment month/year/quarter (transformations.py:29-40). */
  def enrollmentFields(d: Column): Seq[Column] = Seq(
    month(d).as("enrollment_month"),
    year(d).as("enrollment_year"),
    quarter(d).as("enrollment_quarter"))

  /** PAYMENT_STATUS_MAP (cleaning_rules.py:32-39): lowercase key -> code. */
  def mapPaymentStatus(raw: Column): Column = {
    val m = map(
      lit("paid"), lit("COMPLETED"), lit("pending"), lit("PENDING"),
      lit("partial"), lit("PARTIAL"), lit("refunded"), lit("REFUNDED"),
      lit("failed"), lit("FAILED"), lit(""), lit("UNKNOWN"))
    coalesce(element_at(m, lower(trim(coalesce(raw, lit(""))))), lit("UNKNOWN"))
  }

  /** ACTIVE/PENDING/INACTIVE/CHURNED (transformations.py:45-57), with
    * last_activity wired from real data (fixing quirk Q-4) and `asOf`
    * replacing utcnow. has_recent_activity := activity within 30 days. */
  def enrollmentStatus(paymentStatus: Column, lastActivity: Column, asOf: Column): Column = {
    val days = datediff(asOf, lastActivity)
    val recent = lastActivity.isNotNull && days < 30
    when(paymentStatus === "COMPLETED" && recent, "ACTIVE")
      .when(lastActivity.isNull,
        when(paymentStatus =!= "COMPLETED", "PENDING").otherwise("INACTIVE"))
      .when(days >= 90, "CHURNED")
      .when(days >= 30, "INACTIVE")
      .when(paymentStatus =!= "COMPLETED", "PENDING")
      .otherwise("ACTIVE")
  }

  /** A-1: per-student progress summary (transformations.py:60-100).
    * Expects cleaned progress columns (c_*). One hash aggregation. */
  def studentProgressSummary(progress: DataFrame, asOf: Column): DataFrame =
    progress.groupBy(col("c_student_id").as("student_id"))
      .agg(
        countDistinct(col("c_course_id")).as("total_courses_enrolled"),
        count(when(coalesce(col("c_completion_percentage"), lit(0.0)) >= 100, 1))
          .as("total_modules_completed"),
        avg(col("c_score")).as("avg_score"),
        (sum(coalesce(col("c_duration_seconds"), lit(0))) / 3600.0)
          .as("total_time_spent_hours"),
        max(to_date(col("c_event_timestamp"))).as("last_activity_date"),
        count(when(datediff(asOf, col("c_event_timestamp")) < 7, 1))
          .as("activity_count_7_days"),
        count(when(datediff(asOf, col("c_event_timestamp")) < 30, 1))
          .as("activity_count_30_days"))

  /** A-2: per-course summary (transformations.py:103-126). */
  def courseSummary(progress: DataFrame): DataFrame =
    progress.groupBy(col("c_course_id").as("course_id"))
      .agg(
        countDistinct(col("c_student_id")).as("total_enrollments"),
        avg(coalesce(col("c_completion_percentage"), lit(0.0))).as("avg_completion_rate"),
        avg(col("c_score")).as("avg_score"))

  /** A-3: quality summary (data_cleaning_pipeline.py:28-37). */
  def qualitySummary(cleaned: DataFrame): DataFrame =
    cleaned.agg(
      count(when(col("quality_score") < 100, 1)).as("flagged_records"),
      count(lit(1)).as("total_records"))

  /** Rule-level invalid counters (the staging rule_stats JSONB shape,
    * init_schema.sql:573): one row of `<rule>_invalid` counts. */
  def ruleStats(cleaned: DataFrame, flagCols: Seq[String]): DataFrame =
    cleaned.agg(
      count(when(!col(flagCols.head), 1)).as(flagCols.head.stripPrefix("is_") + "_invalid"),
      flagCols.tail.map(f =>
        count(when(!col(f), 1)).as(f.stripPrefix("is_") + "_invalid")): _*)

  /** quality_analyzer agent over the rule-stats row
    * (langgraph_workflow.py:34-36): argmax invalid counter -> summary +
    * fixed recommendation. Ties break on field name for determinism. */
  def qualityAnalysis(ruleStats: DataFrame): DataFrame = {
    val entries = ruleStats.columns.flatMap(c =>
      Seq(lit(c.stripSuffix("_invalid").stripSuffix("_valid")), col(c)))
    ruleStats.select(explode(map(entries.toIndexedSeq: _*)).as(Seq("field", "n")))
      .orderBy(col("n").desc, col("field").asc).limit(1)
      .select(
        graft.expr.Enrichment.qualityAnalysis(col("field")).as("summary"),
        lit(graft.expr.Enrichment.qualityRecommendation).as("recommendation"))
  }

  /** insight_generator agent (langgraph_workflow.py:39-44) as a one-row
    * frame, joined-friendly for the run report. */
  def insightReport(anyDf: DataFrame): DataFrame = {
    val (summary, actions) = graft.expr.Enrichment.insights()
    anyDf.sparkSession.range(1).select(
      concat_ws("; ", summary).as("executive_summary"),
      concat_ws("; ", actions).as("actions"))
  }

  /** A-5: duplicate-rate gauge (operators/data_cleaning.py:65-67). */
  def duplicateRate(marked: DataFrame, flag: String = "is_duplicate"): DataFrame =
    marked.agg(
      sum(when(col(flag), 1).otherwise(0)).as("duplicates"),
      count(lit(1)).as("total"),
      // unrounded count ratio (r8 tie audit, docs/NOTES.md): one double
      // division of engine-identical integer operands
      (sum(when(col(flag), 1).otherwise(0)) / count(lit(1))).as("duplicate_rate"))
}
