package graft

import org.apache.spark.sql.functions._
import graft.etl.Transform

/** Mirrors the reference's transformation pytest cases
  * (tests/test_transformations.py:6-22) plus the derived-age and
  * enrollment-status branches. */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  test("age groups: 18-22 / 23-27 / 28-35 / 35+ (reference test_age_group)") {
    val df = Seq(20, 24, 33, 40).toDF("age")
    val got = df.select(Transform.ageGroup(col("age"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("18-22", "23-27", "28-35", "35+"))
  }

  test("enrollment fields: month 5 -> quarter 2 (reference test_enrollment_fields)") {
    val df = Seq(java.sql.Date.valueOf("2023-05-10")).toDF("d")
    val r = df.select(Transform.enrollmentFields(col("d")): _*).head()
    assert(r.getAs[Int]("enrollment_month") == 5)
    assert(r.getAs[Int]("enrollment_year") == 2023)
    assert(r.getAs[Int]("enrollment_quarter") == 2)
  }

  test("payment status map: paid -> COMPLETED, unknown -> UNKNOWN (reference test_map_payment_status)") {
    val df = Seq("paid", "unknown", "  Pending ", null).toDF("s")
    val got = df.select(Transform.mapPaymentStatus(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("COMPLETED", "UNKNOWN", "PENDING", "UNKNOWN"))
  }

  test("derived age counts completed years with month/day comparison") {
    val asOf = to_date(lit("2024-05-14"))
    val df = Seq("1999-05-15", "1999-05-14", "2030-01-01").toDF("dob")
    val got = df.select(Transform.deriveAge(to_date(col("dob")), asOf)).collect()
    assert(got(0).getInt(0) == 24) // birthday tomorrow -> still 24
    assert(got(1).getInt(0) == 25) // birthday today -> 25
    assert(got(2).getInt(0) == 0)  // future dob floors at 0
  }

  test("enrollment status: ACTIVE/PENDING/INACTIVE/CHURNED branches") {
    val asOf = to_date(lit("2024-06-01"))
    val df = Seq(
      ("COMPLETED", "2024-05-20"), // recent + completed -> ACTIVE
      ("PENDING", "2024-05-20"),   // recent but unpaid -> PENDING
      ("COMPLETED", "2024-04-15"), // 47 days -> INACTIVE
      ("COMPLETED", "2024-01-01"), // 152 days -> CHURNED
      ("PENDING", null),           // never active, unpaid -> PENDING
      ("COMPLETED", null))         // never active, paid -> INACTIVE
      .toDF("status", "last")
    val got = df.select(Transform.enrollmentStatus(
      col("status"), to_date(col("last")), asOf)).collect().map(_.getString(0))
    assert(got.toSeq == Seq("ACTIVE", "PENDING", "INACTIVE", "CHURNED", "PENDING", "INACTIVE"))
  }
}
