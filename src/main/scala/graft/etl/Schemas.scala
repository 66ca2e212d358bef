package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the EduFlow source files — schema-on-read raw layer
  * keeps every column a string exactly like the reference's all-VARCHAR raw
  * DDL (init_schema.sql:26-101); typing happens in the cleaning layer.
  * Reference column lists: dags/file_ingestion_pipeline.py:66-94.
  */
object Schemas {

  private def allString(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  val students: StructType = allString(
    "student_id", "full_name", "email", "phone", "dob", "gender",
    "city", "state", "enrollment_date", "program_id", "fee_paid",
    "payment_status")

  val progress: StructType = allString(
    "event_id", "student_id", "course_id", "event_type", "event_timestamp",
    "duration_seconds", "score", "module_id", "completion_percentage")

  val courses: StructType = allString(
    "course_id", "course_name", "category", "difficulty", "duration_hours",
    "price", "instructor_name", "is_active")

  val tickets: StructType = allString(
    "ticket_id", "student_id", "subject", "description", "priority",
    "status", "category", "created_date", "resolved_date")

  val cityMaster: StructType = allString(
    "city_name", "state_name", "state_code", "common_misspellings")

  /** Required headers per file (O-2 validation, file_validation.py:29-35). */
  val requiredColumns: Map[String, Seq[String]] = Map(
    "students_enrollment" -> Seq("student_id", "full_name", "email"),
    "student_progress" -> Seq("event_id", "student_id", "course_id"),
    "course_catalog" -> Seq("course_id", "course_name"),
    "support_tickets" -> Seq("ticket_id", "student_id", "status"))
}
