package graft

import org.apache.spark.sql.functions._
import graft.expr.CleaningRules._

/** Mirrors the reference's pytest cases (tests/test_cleaning_rules.py:6-30)
  * plus the null/invalid branches of every rule. */
class CleaningRulesSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, rule: org.apache.spark.sql.Column => graft.expr.Rule) = {
    val r = rule(col("v"))
    Seq(in).toDF("v").select(r.value.as("value"), r.isValid.as("valid")).head()
  }

  test("standardize_student_id: stu-002 -> STU002") {
    val r = one("stu-002", standardizeStudentId)
    assert(r.getString(0) == "STU002" && r.getBoolean(1))
  }
  test("standardize_student_id: no digits -> null invalid") {
    val r = one("ABC", standardizeStudentId)
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }
  test("standardize_student_id: long ids not truncated (zfill semantics)") {
    assert(one("stu-12345", standardizeStudentId).getString(0) == "STU12345")
  }

  test("clean_name: collapse, strip digits, title case, split") {
    val df = Seq("  john   SMITH3 ").toDF("v")
    val r = cleanName(col("v"))
    val row = df.select(r.value, r.isValid).head()
    assert(row.getString(0) == "John Smith" && row.getBoolean(1))
    val (f, l) = splitName(r.value)
    val fr = df.select(f, l).head()
    assert(fr.getString(0) == "John" && fr.getString(1) == "Smith")
  }
  test("clean_name: digits-only -> null invalid") {
    val r = one("1234", cleanName)
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }

  test("validate_email: valid lowercased") {
    val r = one(" John.Doe@Example.COM ", validateEmail)
    assert(r.getString(0) == "john.doe@example.com" && r.getBoolean(1))
  }
  test("validate_email: invalid -> null") {
    val r = one("not-an-email", validateEmail)
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }

  test("standardize_phone: 10 digits formatted") {
    assert(one("98765 43211", standardizePhone).getString(0) == "+91-9876543211")
  }
  test("standardize_phone: 12 digits with country code") {
    assert(one("919876543211", standardizePhone).getString(0) == "+91-9876543211")
  }
  test("standardize_phone: wrong length -> null invalid") {
    val r = one("12345", standardizePhone)
    assert(r.isNullAt(0) && !r.getBoolean(1))
  }

  test("parse_date: 15/05/1999 (reference pytest case)") {
    val asOf = to_date(lit("2026-01-01"))
    val r = Seq("15/05/1999").toDF("v")
      .select(parseDate(col("v"), asOf).value).head()
    assert(r.getDate(0).toString == "1999-05-15")
  }
  test("parse_date: unsupported format 2024/01/16 rejected") {
    val asOf = to_date(lit("2026-01-01"))
    val r = Seq("2024/01/16").toDF("v")
      .select(parseDate(col("v"), asOf).value).head()
    assert(r.isNullAt(0))
  }
  test("parse_date: year<1950 and future rejected") {
    val asOf = to_date(lit("2026-01-01"))
    val df = Seq("1949-12-31", "2030-01-01", "January 5, 2020", "05-Mar-21").toDF("v")
    val got = df.select(parseDate(col("v"), asOf).value.cast("string")).collect().map(_.getString(0))
    assert(got(0) == null && got(1) == null && got(2) == "2020-01-05" && got(3) == "2021-03-05")
  }

  test("standardize_gender mapping and flags") {
    val df = Seq("m", "FEMALE", "x", "").toDF("v")
    val r = standardizeGender(col("v"))
    val got = df.select(r.value, r.isValid).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("Male", "Female", "Other", "Other"))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, true, false, false))
  }

  test("clean_numeric: currency stripped, abs flagged, empty -> 0.0, junk -> null") {
    val df = Seq("₹1,234.50", "-42", "", "abc").toDF("v")
    val r = cleanNumeric(col("v"))
    val got = df.select(r.value, r.isValid).collect()
    assert(got(0).getDouble(0) == 1234.50 && got(0).getBoolean(1))
    assert(got(1).getDouble(0) == 42.0 && !got(1).getBoolean(1))
    assert(got(2).getDouble(0) == 0.0 && !got(2).getBoolean(1))
    assert(got(3).isNullAt(0) && !got(3).getBoolean(1))
  }

  test("validate_score: caps flagged, round 2dp, missing -> null") {
    val df = Seq("150", "-5", "87.656", "x").toDF("v")
    val r = validateScore(col("v"))
    val got = df.select(r.value, r.isValid).collect()
    assert(got(0).getDouble(0) == 100.0 && !got(0).getBoolean(1))
    assert(got(1).getDouble(0) == 0.0 && !got(1).getBoolean(1))
    assert(got(2).getDouble(0) == 87.66 && got(2).getBoolean(1))
    assert(got(3).isNullAt(0) && !got(3).getBoolean(1))
  }

  test("quality score: 100 - 10 per invalid flag, floored at 0") {
    val df = Seq((true, false, false)).toDF("a", "b", "c")
    assert(df.select(qualityScore(col("a"), col("b"), col("c"))).head().getInt(0) == 80)
    val many = (1 to 12).map(_ => lit(false))
    assert(df.select(qualityScore(many: _*)).head().getInt(0) == 0)
  }
}
