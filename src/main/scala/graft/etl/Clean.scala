package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.CleaningRules._
import graft.operators.{FuzzyJoin, Upsert}

/** C-1: per-dataset cleaning compositions (reference dags/utils/cleaners.py)
  * as single declarative transforms — one whole-stage-codegen'd projection
  * per dataset instead of the reference's per-record Python loops, plus the
  * D-1 duplicate marking and F-1 hard filter from the cleaning DAG.
  *
  * Every function takes `asOf` (frozen clock) instead of calling wall-clock
  * like the reference does (SURVEY §4.3 determinism note).
  */
object Clean {

  /** Title-case normalization used by city/state (NO digit strip — that is
    * specific to names; reference clean_city/clean_state re.sub + .title()). */
  private def titleCase(c: Column): Column =
    initcap(regexp_replace(trim(coalesce(c, lit(""))), "\\s+", " "))

  /** Students: 10 rules -> cleaned columns + per-rule validity flags +
    * quality score (cleaners.py:8-53). City goes through the tiered
    * corrections -> alias -> exact -> fuzzy match (R-8, fixing quirk Q-1:
    * the master is read with a proper header and the misspellings column
    * becomes an exact alias map instead of being ignored).
    */
  def students(raw: DataFrame, cityMaster: DataFrame, asOf: Column): DataFrame = {
    val sid = standardizeStudentId(col("student_id"))
    val nm = cleanName(col("full_name"))
    val (first, last) = splitName(nm.value)
    val email = validateEmail(col("email"))
    val phone = standardizePhone(col("phone"))
    val dob = parseDate(col("dob"), asOf)
    val gender = standardizeGender(col("gender"))
    // R-9: null -> (null, invalid); otherwise always valid (cleaning_rules.py:170-174)
    val state = graft.expr.Rule(
      when(col("state").isNotNull, titleCase(col("state"))), col("state").isNotNull)
    val enroll = parseDate(col("enrollment_date"), asOf)
    val fee = cleanNumeric(col("fee_paid"))

    // corrections: hardcoded reference map + the master's alias column
    val corrections = Map("Mumabi" -> "Mumbai", "Banglore" -> "Bangalore")
    // one row PER ALIAS: several raw misspellings ("mumbai", "MUMBAI")
    // collapse to one title-cased alias, and an alias listed under two
    // cities must still map to exactly one (min city name, deterministic) —
    // any multiplicity here duplicates student rows in the left join below
    // and turns the keep-first duplicate flag into a window-tie coin flip
    val aliases = cityMaster
      .select(col("city_name"), explode(split(coalesce(col("common_misspellings"), lit("")), ",")).as("alias"))
      .select(titleCase(col("alias")).as("alias"), col("city_name"))
      .filter(col("alias") =!= "")
      .groupBy(col("alias")).agg(min(col("city_name")).as("city_name"))

    val pre = raw.select(
      col("*"),
      sid.value.as("c_student_id"), sid.isValid.as("is_student_id_valid"),
      when(nm.isValid, nm.value).as("c_full_name"),
      when(nm.isValid, first).as("c_first_name"),
      when(nm.isValid, last).as("c_last_name"),
      nm.isValid.as("is_name_valid"),
      email.value.as("c_email"), email.isValid.as("is_email_valid"),
      phone.value.as("c_phone"), phone.isValid.as("is_phone_valid"),
      dob.value.as("c_dob"), dob.isValid.as("is_dob_valid"),
      gender.value.as("c_gender"), gender.isValid.as("is_gender_valid"),
      titleCase(col("city")).as("c_city_pre"),
      state.value.as("c_state"), state.isValid.as("is_state_valid"),
      enroll.value.as("c_enrollment_date"), enroll.isValid.as("is_enrollment_date_valid"),
      upperOrNull(col("program_id")).as("c_program_id"),
      fee.value.as("c_fee_paid"), fee.isValid.as("is_fee_valid"),
      titleOrUnknown(col("payment_status")).as("c_payment_status"))

    // alias tier first (broadcast equi-join), then exact/fuzzy tiers
    val aliased = pre
      .join(broadcast(aliases), pre("c_city_pre") === aliases("alias"), "left")
      .withColumn("c_city_pre2", coalesce(col("city_name"), col("c_city_pre")))
      .drop("alias", "city_name")
    val withCity = FuzzyJoin.tieredClean(
        aliased, "c_city_pre2", cityMaster, "city_name",
        corrections, threshold = 0.8, out = "c_city")
      .withColumn("is_city_valid",
        col("c_city_method").isin("corrected", "exact", "fuzzy") && col("c_city") =!= "")
      .drop("c_city_pre", "c_city_pre2")

    withCity.withColumn("quality_score", qualityScore(
      col("is_student_id_valid"), col("is_name_valid"), col("is_email_valid"),
      col("is_phone_valid"), col("is_dob_valid"), col("is_gender_valid"),
      col("is_city_valid"), col("is_state_valid"),
      col("is_enrollment_date_valid"), col("is_fee_valid")))
  }

  /** Progress events: id standardization, score/completion validation,
    * duration cleaning, timestamp parsing (cleaners.py:56-89). */
  def progress(raw: DataFrame, asOf: Column): DataFrame = {
    val sid = standardizeStudentId(col("student_id"))
    val score = validateScore(col("score"))
    val completion = validateScore(col("completion_percentage"))
    val duration = cleanNumeric(col("duration_seconds"))
    val ts = parseTimestamp(col("event_timestamp"), asOf)
    raw.select(
        col("*"),
        sid.value.as("c_student_id"), sid.isValid.as("is_student_valid"),
        ts.value.as("c_event_timestamp"), ts.isValid.as("is_timestamp_valid"),
        duration.value.cast("int").as("c_duration_seconds"), duration.isValid.as("is_duration_valid"),
        score.value.as("c_score"), score.isValid.as("is_score_valid"),
        completion.value.as("c_completion_percentage"), completion.isValid.as("is_completion_valid"),
        upper(coalesce(col("course_id"), lit(""))).as("c_course_id"))
      .withColumn("quality_score", qualityScore(
        col("is_student_valid"), col("is_score_valid"), col("is_completion_valid"),
        col("is_duration_valid"), col("is_timestamp_valid")))
  }

  /** Support tickets: id + created/resolved date parsing (cleaners.py:92-112). */
  def tickets(raw: DataFrame, asOf: Column): DataFrame = {
    val sid = standardizeStudentId(col("student_id"))
    val created = parseDate(col("created_date"), asOf)
    val resolved = parseDate(col("resolved_date"), asOf)
    raw.select(
        col("*"),
        sid.value.as("c_student_id"), sid.isValid.as("is_student_valid"),
        created.value.as("c_created_date"), created.isValid.as("is_created_valid"),
        resolved.value.as("c_resolved_date"), resolved.isValid.as("is_resolved_valid"))
      .withColumn("quality_score", qualityScore(
        col("is_student_valid"), col("is_created_valid"), col("is_resolved_valid")))
  }

  /** D-1 + F-1 + D-2 (data_cleaning_pipeline.py:40-60): flag duplicates
    * keep-first by file order, drop null-key records, dedupe last-write-wins
    * for the staging upsert. */
  def toStaging(cleaned: DataFrame, key: String, orderCol: String): DataFrame =
    Upsert.dedupLastWins(
      Upsert.markDuplicates(cleaned, Seq(key), orderCol)
        .filter(col(key).isNotNull),
      Seq(key), orderCol)
}
