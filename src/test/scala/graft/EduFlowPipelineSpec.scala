package graft

import org.apache.spark.sql.functions._
import graft.etl._

/** Golden end-to-end test on the reference's own fixtures
  * (/root/reference/input_data, read-only): replicates the published run
  * counts (README.md:164-179 / output/summary_report.md) and spot-checks
  * cleaned values the reference documents, e.g. stu-002 -> STU002 with
  * normalized phone/date. */
class EduFlowPipelineSpec extends SparkSpec {

  private lazy val pipe =
    Pipeline(spark, "/root/reference/input_data", asOfDate = "2024-06-01")

  test("raw layer: fixture row counts with lineage columns") {
    assert(pipe.rawStudents.count() == 31)
    assert(pipe.rawProgress.count() == 51)
    assert(pipe.rawCourses.count() == 10)
    assert(pipe.rawTickets.count() == 15)
    assert(pipe.rawStudents.columns.contains("file_row_number"))
    assert(pipe.rawStudents.select(max("file_row_number")).head().getInt(0) == 31)
  }

  test("staging: golden counts 30/50/15 (duplicates collapsed)") {
    assert(pipe.stagedStudents.count() == 30)
    assert(pipe.stagedProgress.count() == 50)
    assert(pipe.stagedTickets.count() == 15)
  }

  test("stu-002 cleaned exactly as the reference documents") {
    val r = pipe.stagedStudents.filter(col("student_id") === "stu-002")
      .select("c_student_id", "c_full_name", "c_phone", "c_dob", "c_city",
        "c_program_id", "c_payment_status", "c_fee_paid")
      .head()
    assert(r.getString(0) == "STU002")
    assert(r.getString(1) == "Jane Smith")
    assert(r.getString(2) == "+91-9876543211")
    assert(r.getDate(3).toString == "1999-05-15")
    assert(r.getString(4) == "Mumbai")
    assert(r.getString(5) == "PROG001")
    assert(r.getString(6) == "Paid")
    assert(r.getDouble(7) == 50000.0)
  }

  test("city fuzzy tier fixes Mumabi and flags junk") {
    val methods = pipe.stagedStudents
      .groupBy("c_city_method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(methods.getOrElse("exact", 0L) > 20L)
    assert(pipe.stagedStudents.filter(col("c_city") === "Mumbai").count() >= 3)
  }

  test("warehouse: dims and facts match the published run") {
    assert(pipe.dimStudents.count() == 30)
    assert(pipe.dimCourses.count() == 10)
    assert(pipe.factProgress.count() == 50)
    assert(pipe.factTickets.count() == 15)
    assert(pipe.dimDate.count() == 2557) // 2020-01-01..2026-12-31
    // Q-3 fixed: real per-(student, course) enrollments, not 1 NULL row
    assert(pipe.factEnrollments.count() > 1)
    assert(pipe.factEnrollments.filter(col("course_sk").isNull).count() == 0)
  }

  test("surrogate keys are stable across runs and joinable") {
    val a = pipe.dimStudents.select("student_sk", "student_id").collect().toSet
    val b = Pipeline(spark, "/root/reference/input_data", "2024-06-01")
      .dimStudents.select("student_sk", "student_id").collect().toSet
    assert(a == b)
    // exactly one fixture event (evt-016, STU999) has no matching student —
    // the J-1 left-join miss keeps it with a NULL SK like the reference
    val orphans = pipe.factProgress.filter(col("student_sk").isNull)
    assert(orphans.count() == 1)
    assert(orphans.head().getAs[String]("event_id") == "evt-016")
  }

  test("views: student360 carries ticket counts; aiInsights has 3 metrics") {
    val s360 = pipe.student360
    assert(s360.count() == 30)
    val stu1 = s360.filter(col("student_id") === "STU001").head()
    assert(stu1.getAs[Long]("total_tickets") >= 1L)
    val insights = pipe.aiInsights.collect()
    assert(insights.length == 3)
    assert(insights.map(_.getString(0)).toSet ==
      Set("High Risk Students", "Negative Sentiment Tickets", "Low Quality Records"))
  }

  test("daily dashboard is newest-first and joined to the calendar") {
    val dates = pipe.dailyDashboard.select("full_date").collect().map(_.getDate(0))
    assert(dates.length > 0)
    assert(dates.sameElements(dates.sortBy((d: java.sql.Date) => -d.getTime)))
  }

  test("idempotence: re-upserting staging leaves counts stable (quirk Q-6)") {
    import graft.operators.Upsert
    val once = pipe.stagedStudents
    val again = Upsert.upsert(once, once, Seq("c_student_id"), "file_row_number")
    assert(again.count() == once.count())
  }

  test("file validation rejects missing columns") {
    intercept[Ingest.ValidationError] {
      Ingest.validateFile(spark, "/root/reference/input_data/city_master.csv",
        Seq("student_id"))
    }
  }

  test("file validation rejects oversized files (size cap)") {
    intercept[Ingest.ValidationError] {
      Ingest.validateFile(spark, "/root/reference/input_data/students_enrollment.csv",
        Seq("student_id"), maxSizeMb = 0)
    }
  }

  test("csv header split respects RFC-4180 quoting") {
    assert(Ingest.splitCsvLine("id,\"city, state\",name") ==
      Seq("id", "city, state", "name"))
    assert(Ingest.splitCsvLine("a,\"he said \"\"hi\"\"\",b") ==
      Seq("a", "he said \"hi\"", "b"))
    assert(Ingest.splitCsvLine("plain") == Seq("plain"))
  }

  test("metadata logs: run/quality/ai frames carry the declared fields") {
    val run = Metadata.runLog(spark, "run-1", "eduflow_batch", "graft.Main",
      java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-06-01 00:01:00"),
      "SUCCESS", recordsRead = 97L, recordsWritten = 95L, recordsFailed = 2L,
      inputFile = "/root/reference/input_data").head()
    assert(run.getString(run.fieldIndex("run_id")) == "run-1")
    assert(run.getLong(run.fieldIndex("records_written")) == 95L)
    assert(run.isNullAt(run.fieldIndex("error_message")))

    val q = Metadata.qualityLog("run-1", "stg_students",
      pipe.stagedStudents, pipe.ruleStats).head()
    assert(q.getString(q.fieldIndex("table_name")) == "stg_students")
    assert(q.getLong(q.fieldIndex("total_records")) == 30L)
    assert(q.getLong(q.fieldIndex("valid_records")) +
      q.getLong(q.fieldIndex("invalid_records")) == 30L)
    assert(q.getLong(q.fieldIndex("duplicate_records")) == 1L)
    assert(q.getString(q.fieldIndex("rule_stats")).contains("\"email_valid_invalid\":8"))

    val ai = Metadata.aiLog(spark, "run-1", "student_risk_scorer",
      recordsProcessed = 30L, processingTimeSeconds = 1.234, tokensUsed = 0L,
      status = "SUCCESS").head()
    assert(ai.getString(ai.fieldIndex("agent_name")) == "student_risk_scorer")
    assert(ai.getDecimal(ai.fieldIndex("processing_time_seconds")).toString == "1.23")
  }
}
