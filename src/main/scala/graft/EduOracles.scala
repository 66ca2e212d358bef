package graft

/** DuckDB-dialect oracle SQL for the seven EduFlow pipeline queries
  * (q26-q29, q52-q54).
  *
  * These run the WHOLE reference pipeline (ingest -> clean -> staging ->
  * warehouse -> view; reference dags + init_db/init_schema.sql:445-534) in
  * SQL over the reference's own CSV fixtures via DuckDB read_csv, so the
  * driver can hash-verify the EduFlow views instead of rows-only checks.
  *
  * Dialect/parity notes:
  *  - the students CSV contains unquoted commas in "Month d, yyyy" dob
  *    values, so 6 of 31 rows carry 13 tokens; Spark's PERMISSIVE CSV parse
  *    keeps the first 12 tokens (columns shift left across dob).  The oracle
  *    reproduces that with a fixed 14-column read (null_padding) projecting
  *    the first 12 -- NOT a csv-spec-faithful parse, a Spark-faithful one;
  *  - float aggregates are rounded to 6dp on both sides (see Queries q26..q52);
  *  - DuckDB strptime has no JDK-style lenient zone parse: the trailing-Z
  *    ISO timestamps use a literal-Z format.
  */
object EduOracles {

  private val ctes: String = """WITH stu_raw AS (
  SELECT c01 AS student_id, c02 AS full_name, c03 AS email, c04 AS phone,
    c05 AS dob, c06 AS gender, c07 AS city, c08 AS state,
    c09 AS enrollment_date, c10 AS program_id, c11 AS fee_paid,
    c12 AS payment_status, CAST(row_number() OVER () AS INT) AS frn
  FROM read_csv('/root/reference/input_data/students_enrollment.csv', header=false, skip=1,
    delim=',', quote='"', nullstr='NULL', null_padding=true, auto_detect=false,
    columns={'c01':'VARCHAR','c02':'VARCHAR','c03':'VARCHAR','c04':'VARCHAR',
             'c05':'VARCHAR','c06':'VARCHAR','c07':'VARCHAR','c08':'VARCHAR',
             'c09':'VARCHAR','c10':'VARCHAR','c11':'VARCHAR','c12':'VARCHAR',
             'c13':'VARCHAR','c14':'VARCHAR'})
),
city_master AS (
  SELECT * FROM read_csv('/root/reference/input_data/city_master.csv', header=true, all_varchar=true, nullstr='NULL', delim=',')
),
aliases AS (
  -- min(city_name) per alias mirrors the Spark side's groupBy(alias)
  -- .agg(min(city_name)) tie-break (Clean.scala): an alias listed under two
  -- cities must resolve identically in both engines
  SELECT alias, min(city_name) AS city_name FROM (
    SELECT array_to_string(list_transform(string_split(regexp_replace(trim(coalesce(a,'')),'\s+',' ','g'),' '), w -> upper(substr(w,1,1))||lower(substr(w,2))),' ') AS alias, city_name
    FROM (SELECT city_name, unnest(string_split(coalesce(common_misspellings,''),',')) AS a
          FROM city_master))
  WHERE alias <> ''
  GROUP BY alias
),
stu_pre AS (
  SELECT *,
    CASE WHEN sid_digits <> '' THEN 'STU' ||
      (CASE WHEN length(sid_digits) < 3 THEN lpad(sid_digits,3,'0') ELSE sid_digits END) END AS c_student_id,
    sid_digits <> '' AS is_student_id_valid,
    CASE WHEN nm <> '' THEN nm END AS c_full_name,
    CASE WHEN nm <> '' THEN string_split(nm,' ')[1] END AS c_first_name,
    CASE WHEN nm <> '' THEN
      (CASE WHEN len(string_split(nm,' ')) > 1
            THEN array_to_string(list_slice(string_split(nm,' '), 2, len(string_split(nm,' '))), ' ')
            ELSE '' END) END AS c_last_name,
    nm <> '' AS is_name_valid,
    CASE WHEN regexp_matches(em, '^[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}$') THEN em END AS c_email,
    regexp_matches(em, '^[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}$') AS is_email_valid,
    CASE WHEN length(ph)=10 THEN '+91-'||ph
         WHEN length(ph)=12 AND substr(ph,1,2)='91' THEN '+91-'||substr(ph,3,10) END AS c_phone,
    (CASE WHEN length(ph)=10 THEN '+91-'||ph
         WHEN length(ph)=12 AND substr(ph,1,2)='91' THEN '+91-'||substr(ph,3,10) END) IS NOT NULL AS is_phone_valid,
    CASE WHEN dobp IS NOT NULL AND year(dobp)>=1950 AND dobp <= DATE '2024-06-01' THEN dobp END AS c_dob,
    (dobp IS NOT NULL AND year(dobp)>=1950 AND dobp <= DATE '2024-06-01') AS is_dob_valid,
    CASE WHEN g IN ('m','male') THEN 'Male' WHEN g IN ('f','female') THEN 'Female' ELSE 'Other' END AS c_gender,
    g IN ('m','male','f','female') AS is_gender_valid,
    CASE WHEN state IS NOT NULL THEN array_to_string(list_transform(string_split(regexp_replace(trim(coalesce(state,'')),'\s+',' ','g'),' '), w -> upper(substr(w,1,1))||lower(substr(w,2))),' ') END AS c_state,
    state IS NOT NULL AS is_state_valid,
    CASE WHEN enrp IS NOT NULL AND year(enrp)>=1950 AND enrp <= DATE '2024-06-01' THEN enrp END AS c_enrollment_date,
    (enrp IS NOT NULL AND year(enrp)>=1950 AND enrp <= DATE '2024-06-01') AS is_enrollment_date_valid,
    CASE WHEN trim(coalesce(program_id,'')) = '' THEN NULL ELSE upper(trim(program_id)) END AS c_program_id,
    (CASE WHEN fee_raw='' THEN 0.0 WHEN fee_v IS NOT NULL THEN abs(fee_v) END) AS c_fee_paid,
    (fee_raw <> '' AND fee_v IS NOT NULL AND fee_v >= 0) AS is_fee_valid
  FROM (
    SELECT *,
      regexp_replace(coalesce(student_id,''),'[^0-9]','','g') AS sid_digits,
      array_to_string(list_transform(string_split(trim(regexp_replace(regexp_replace(trim(coalesce(full_name,'')),'[0-9]','','g'),'\s+',' ','g')),' '), w -> upper(substr(w,1,1))||lower(substr(w,2))),' ') AS nm,
      lower(trim(coalesce(email,''))) AS em,
      regexp_replace(coalesce(phone,''),'[^0-9]','','g') AS ph,
      CAST(coalesce(try_strptime(trim(coalesce(dob,'')), '%Y-%m-%d'), try_strptime(trim(coalesce(dob,'')), '%d/%m/%Y'), try_strptime(trim(coalesce(dob,'')), '%d-%m-%Y'), try_strptime(trim(coalesce(dob,'')), '%B %d, %Y'), try_strptime(trim(coalesce(dob,'')), '%d-%b-%y')) AS DATE) AS dobp,
      CAST(coalesce(try_strptime(trim(coalesce(enrollment_date,'')), '%Y-%m-%d'), try_strptime(trim(coalesce(enrollment_date,'')), '%d/%m/%Y'), try_strptime(trim(coalesce(enrollment_date,'')), '%d-%m-%Y'), try_strptime(trim(coalesce(enrollment_date,'')), '%B %d, %Y'), try_strptime(trim(coalesce(enrollment_date,'')), '%d-%b-%y')) AS DATE) AS enrp,
      lower(trim(coalesce(gender,''))) AS g,
      array_to_string(list_transform(string_split(regexp_replace(trim(coalesce(city,'')),'\s+',' ','g'),' '), w -> upper(substr(w,1,1))||lower(substr(w,2))),' ') AS c_city_pre,
      trim(coalesce(fee_paid,'')) AS fee_raw,
      CASE WHEN regexp_matches(regexp_replace(trim(coalesce(fee_paid,'')),'[^0-9.\-]','','g'), '^-?[0-9]+(\.[0-9]*)?$')
             OR regexp_matches(regexp_replace(trim(coalesce(fee_paid,'')),'[^0-9.\-]','','g'), '^-?\.[0-9]+$')
           THEN CAST(regexp_replace(trim(coalesce(fee_paid,'')),'[^0-9.\-]','','g') AS DOUBLE) END AS fee_v
    FROM stu_raw)
),
stu_city AS (
  SELECT p.*,
    CASE WHEN ex_city IS NOT NULL THEN corr
         WHEN fz_sim >= 0.8 THEN fz_city
         ELSE corr END AS c_city,
    ((ex_city IS NOT NULL OR fz_sim >= 0.8) AND
     (CASE WHEN ex_city IS NOT NULL THEN corr WHEN fz_sim >= 0.8 THEN fz_city ELSE corr END) <> '')
      AS is_city_valid
  FROM (
    SELECT q.*,
      (SELECT m.city_name FROM city_master m WHERE m.city_name = q.corr LIMIT 1) AS ex_city,
      (SELECT max((CASE WHEN length(q.corr)=0 OR length(m.city_name)=0 THEN 0.0 ELSE CAST(length(list_filter(range(1, least(length(q.corr), length(m.city_name))+1), i -> substr(lower(q.corr),i,1) = substr(lower(m.city_name),i,1))) AS DOUBLE) / greatest(length(q.corr), length(m.city_name)) END)) FROM city_master m) AS fz_sim,
      (SELECT m.city_name FROM city_master m
        ORDER BY (CASE WHEN length(q.corr)=0 OR length(m.city_name)=0 THEN 0.0 ELSE CAST(length(list_filter(range(1, least(length(q.corr), length(m.city_name))+1), i -> substr(lower(q.corr),i,1) = substr(lower(m.city_name),i,1))) AS DOUBLE) / greatest(length(q.corr), length(m.city_name)) END) DESC, m.city_name ASC LIMIT 1) AS fz_city
    FROM (
      SELECT s.*,
        CASE WHEN cpre2 = 'Mumabi' THEN 'Mumbai'
             WHEN cpre2 = 'Banglore' THEN 'Bangalore' ELSE cpre2 END AS corr
      FROM (
        SELECT p2.*, coalesce(a.city_name, p2.c_city_pre) AS cpre2
        FROM stu_pre p2 LEFT JOIN aliases a ON p2.c_city_pre = a.alias) s) q) p
),
stu_scored AS (
  SELECT *,
    CAST(greatest(0, 100 - 10 * (
      (CASE WHEN NOT is_student_id_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_name_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_email_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_phone_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_dob_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_gender_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_city_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_state_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_enrollment_date_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_fee_valid THEN 1 ELSE 0 END))) AS INT) AS quality_score
  FROM stu_city
),
stu_staged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY c_student_id ORDER BY frn DESC) AS __rn
    FROM stu_scored WHERE c_student_id IS NOT NULL) WHERE __rn = 1
),
prog_raw AS (
  SELECT *, CAST(row_number() OVER () AS INT) AS frn
  FROM read_csv('/root/reference/input_data/student_progress.csv', header=true, all_varchar=true, nullstr='NULL', delim=',')
),
prog_clean AS (
  SELECT *,
    CAST(greatest(0, 100 - 10 * (
      (CASE WHEN NOT is_student_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_score_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_completion_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_duration_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_timestamp_valid THEN 1 ELSE 0 END))) AS INT) AS quality_score
  FROM (
    SELECT *,
      CASE WHEN sid_digits <> '' THEN 'STU' ||
        (CASE WHEN length(sid_digits) < 3 THEN lpad(sid_digits,3,'0') ELSE sid_digits END) END AS c_student_id,
      sid_digits <> '' AS is_student_valid,
      CASE WHEN tsp IS NOT NULL AND tsp <= TIMESTAMP '2024-06-01 23:59:59' THEN tsp END AS c_event_timestamp,
      (tsp IS NOT NULL AND tsp <= TIMESTAMP '2024-06-01 23:59:59') AS is_timestamp_valid,
      CAST(trunc((CASE WHEN dur_raw='' THEN 0.0 WHEN dur_v IS NOT NULL THEN abs(dur_v) END)) AS INT) AS c_duration_seconds,
      (dur_raw <> '' AND dur_v IS NOT NULL AND dur_v >= 0) AS is_duration_valid,
      CASE WHEN sc_v IS NOT NULL THEN round(least(greatest(sc_v,0.0),100.0),2) END AS c_score,
      (sc_v IS NOT NULL AND sc_v >= 0 AND sc_v <= 100) AS is_score_valid,
      CASE WHEN cp_v IS NOT NULL THEN round(least(greatest(cp_v,0.0),100.0),2) END AS c_completion_percentage,
      (cp_v IS NOT NULL AND cp_v >= 0 AND cp_v <= 100) AS is_completion_valid,
      upper(coalesce(course_id,'')) AS c_course_id
    FROM (
      SELECT *,
        regexp_replace(coalesce(student_id,''),'[^0-9]','','g') AS sid_digits,
        coalesce(try_strptime(trim(coalesce(event_timestamp,'')), '%Y-%m-%dT%H:%M:%S'), try_strptime(trim(coalesce(event_timestamp,'')), '%Y-%m-%d %H:%M:%S'), try_strptime(trim(coalesce(event_timestamp,'')), '%Y-%m-%dT%H:%M:%SZ')) AS tsp,
        trim(coalesce(duration_seconds,'')) AS dur_raw,
        CASE WHEN regexp_matches(regexp_replace(trim(coalesce(duration_seconds,'')),'[^0-9.\-]','','g'), '^-?[0-9]+(\.[0-9]*)?$')
               OR regexp_matches(regexp_replace(trim(coalesce(duration_seconds,'')),'[^0-9.\-]','','g'), '^-?\.[0-9]+$')
             THEN CAST(regexp_replace(trim(coalesce(duration_seconds,'')),'[^0-9.\-]','','g') AS DOUBLE) END AS dur_v,
        CASE WHEN regexp_matches(trim(coalesce(score,'')), '^-?[0-9]+(\.[0-9]*)?$')
               OR regexp_matches(trim(coalesce(score,'')), '^-?\.[0-9]+$')
             THEN CAST(trim(coalesce(score,'')) AS DOUBLE) END AS sc_v,
        CASE WHEN regexp_matches(trim(coalesce(completion_percentage,'')), '^-?[0-9]+(\.[0-9]*)?$')
               OR regexp_matches(trim(coalesce(completion_percentage,'')), '^-?\.[0-9]+$')
             THEN CAST(trim(coalesce(completion_percentage,'')) AS DOUBLE) END AS cp_v
      FROM prog_raw))
),
prog_staged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY frn DESC) AS __rn
    FROM prog_clean WHERE event_id IS NOT NULL) WHERE __rn = 1
),
progress_summary AS (
  SELECT c_student_id AS student_id,
    count(DISTINCT c_course_id) AS total_courses_enrolled,
    count(CASE WHEN coalesce(c_completion_percentage,0.0) >= 100 THEN 1 END) AS total_modules_completed,
    avg(c_score) AS avg_score,
    sum(coalesce(c_duration_seconds,0))/3600.0 AS total_time_spent_hours,
    max(CAST(c_event_timestamp AS DATE)) AS last_activity_date,
    count(CASE WHEN date_diff('day', CAST(c_event_timestamp AS DATE), DATE '2024-06-01') < 7 THEN 1 END) AS activity_count_7_days,
    count(CASE WHEN date_diff('day', CAST(c_event_timestamp AS DATE), DATE '2024-06-01') < 30 THEN 1 END) AS activity_count_30_days
  FROM prog_staged GROUP BY c_student_id
),
dim_students AS (
  SELECT
    s.c_student_id AS student_id,
    s.c_full_name AS full_name, s.c_email AS email, s.c_phone AS phone,
    CASE WHEN s.c_dob IS NOT NULL THEN greatest(
      CAST(year(DATE '2024-06-01') - year(s.c_dob) -
        (CASE WHEN month(DATE '2024-06-01') < month(s.c_dob)
               OR (month(DATE '2024-06-01') = month(s.c_dob) AND day(DATE '2024-06-01') < day(s.c_dob))
              THEN 1 ELSE 0 END) AS INT), 0) END AS age,
    s.c_city AS city, s.c_state AS state,
    s.c_enrollment_date AS enrollment_date,
    pay AS payment_status,
    s.c_fee_paid AS fee_paid,
    CAST(coalesce(ps.total_courses_enrolled, 0) AS BIGINT) AS total_courses_enrolled,
    coalesce(ps.total_time_spent_hours, 0.0) AS total_time_spent_hours,
    ps.avg_score AS avg_score,
    ps.last_activity_date,
    CAST(date_diff('day', ps.last_activity_date, DATE '2024-06-01') AS INT) AS days_since_last_activity,
    CASE WHEN pay = 'COMPLETED' AND (ps.last_activity_date IS NOT NULL AND date_diff('day', ps.last_activity_date, DATE '2024-06-01') < 30) THEN 'ACTIVE'
         WHEN ps.last_activity_date IS NULL THEN (CASE WHEN pay <> 'COMPLETED' THEN 'PENDING' ELSE 'INACTIVE' END)
         WHEN date_diff('day', ps.last_activity_date, DATE '2024-06-01') >= 90 THEN 'CHURNED'
         WHEN date_diff('day', ps.last_activity_date, DATE '2024-06-01') >= 30 THEN 'INACTIVE'
         WHEN pay <> 'COMPLETED' THEN 'PENDING'
         ELSE 'ACTIVE' END AS enrollment_status,
    CAST(risk AS DOUBLE) AS ai_risk_score,
    CASE WHEN risk >= 75 THEN 'Critical' WHEN risk >= 50 THEN 'High'
         WHEN risk >= 25 THEN 'Medium' ELSE 'Low' END AS ai_risk_category,
    s.quality_score AS quality_score
  FROM (
    SELECT s0.*, ps0.student_id AS ps_id,
      CASE lower(trim(coalesce(s0.payment_status,'')))
        WHEN 'paid' THEN 'COMPLETED' WHEN 'pending' THEN 'PENDING'
        WHEN 'partial' THEN 'PARTIAL' WHEN 'refunded' THEN 'REFUNDED'
        WHEN 'failed' THEN 'FAILED' ELSE 'UNKNOWN' END AS pay,
      least(
        (CASE WHEN coalesce(date_diff('day', ps0.last_activity_date, DATE '2024-06-01'), 0) > 30 THEN 20 ELSE 0 END) +
        (CASE WHEN coalesce(round(coalesce(ps0.avg_score, 0.0), 2), 0.0) < 30 THEN 25 ELSE 0 END) +
        (CASE WHEN lower(coalesce(
            CASE lower(trim(coalesce(s0.payment_status,'')))
              WHEN 'paid' THEN 'COMPLETED' WHEN 'pending' THEN 'PENDING'
              WHEN 'partial' THEN 'PARTIAL' WHEN 'refunded' THEN 'REFUNDED'
              WHEN 'failed' THEN 'FAILED' ELSE 'UNKNOWN' END, '')) <> 'completed' THEN 15 ELSE 0 END),
        100) AS risk
    FROM stu_staged s0 LEFT JOIN progress_summary ps0 ON s0.c_student_id = ps0.student_id) s
  LEFT JOIN progress_summary ps ON s.c_student_id = ps.student_id
),
age_grouped AS (
  SELECT *, CASE WHEN age IS NULL THEN NULL WHEN age <= 22 THEN '18-22'
    WHEN age <= 27 THEN '23-27' WHEN age <= 35 THEN '28-35' ELSE '35+' END AS age_group
  FROM dim_students
),
tkt_raw AS (
  SELECT *, CAST(row_number() OVER () AS INT) AS frn
  FROM read_csv('/root/reference/input_data/support_tickets.csv', header=true, all_varchar=true, nullstr='NULL', delim=',')
),
tkt_clean AS (
  SELECT *,
    CAST(greatest(0, 100 - 10 * (
      (CASE WHEN NOT is_student_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_created_valid THEN 1 ELSE 0 END) +
      (CASE WHEN NOT is_resolved_valid THEN 1 ELSE 0 END))) AS INT) AS quality_score
  FROM (
    SELECT *,
      CASE WHEN sid_digits <> '' THEN 'STU' ||
        (CASE WHEN length(sid_digits) < 3 THEN lpad(sid_digits,3,'0') ELSE sid_digits END) END AS c_student_id,
      sid_digits <> '' AS is_student_valid,
      CASE WHEN crp IS NOT NULL AND year(crp)>=1950 AND crp <= DATE '2024-06-01' THEN crp END AS c_created_date,
      (crp IS NOT NULL AND year(crp)>=1950 AND crp <= DATE '2024-06-01') AS is_created_valid,
      CASE WHEN rsp IS NOT NULL AND year(rsp)>=1950 AND rsp <= DATE '2024-06-01' THEN rsp END AS c_resolved_date,
      (rsp IS NOT NULL AND year(rsp)>=1950 AND rsp <= DATE '2024-06-01') AS is_resolved_valid
    FROM (
      SELECT *,
        regexp_replace(coalesce(student_id,''),'[^0-9]','','g') AS sid_digits,
        CAST(coalesce(try_strptime(trim(coalesce(created_date,'')), '%Y-%m-%d'), try_strptime(trim(coalesce(created_date,'')), '%d/%m/%Y'), try_strptime(trim(coalesce(created_date,'')), '%d-%m-%Y'), try_strptime(trim(coalesce(created_date,'')), '%B %d, %Y'), try_strptime(trim(coalesce(created_date,'')), '%d-%b-%y')) AS DATE) AS crp,
        CAST(coalesce(try_strptime(trim(coalesce(resolved_date,'')), '%Y-%m-%d'), try_strptime(trim(coalesce(resolved_date,'')), '%d/%m/%Y'), try_strptime(trim(coalesce(resolved_date,'')), '%d-%m-%Y'), try_strptime(trim(coalesce(resolved_date,'')), '%B %d, %Y'), try_strptime(trim(coalesce(resolved_date,'')), '%d-%b-%y')) AS DATE) AS rsp
      FROM tkt_raw))
),
tkt_staged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY ticket_id ORDER BY frn DESC) AS __rn
    FROM tkt_clean WHERE ticket_id IS NOT NULL) WHERE __rn = 1
),
cat_raw AS (
  SELECT * FROM read_csv('/root/reference/input_data/course_catalog.csv', header=true, all_varchar=true, nullstr='NULL', delim=',')
),
dim_courses AS (
  SELECT upper(course_id) AS course_id, course_name, category, difficulty,
    CAST(duration_hours AS INT) AS duration_hours,
    CAST(price AS DECIMAL(15,2)) AS price, instructor_name,
    upper(coalesce(is_active,'TRUE')) = 'TRUE' AS is_active
  FROM cat_raw
),
fact_enrollments AS (
  SELECT e.*, c.price AS fee_paid
  FROM (
    SELECT p.c_student_id AS sid, p.c_course_id AS cid,
      min(CAST(p.c_event_timestamp AS DATE)) AS enrolled_date,
      count(*) AS n_events,
      max(p.c_completion_percentage) AS max_completion_pct,
      avg(p.c_score) AS avg_score,
      sum(coalesce(p.c_duration_seconds,0))/60.0 AS total_minutes
    FROM prog_staged p
    WHERE p.c_student_id IN (SELECT c_student_id FROM stu_staged)
      AND p.c_course_id IN (SELECT course_id FROM dim_courses)
    GROUP BY 1, 2) e
  LEFT JOIN dim_courses c ON e.cid = c.course_id
)
"""

  val all: Map[String, String] = Map(
    "q26_eduflow_student360" -> (ctes + """,
tix AS (
  SELECT c_student_id AS tid, count(*) AS total_tickets,
    count(CASE WHEN status = 'Open' THEN 1 END) AS open_tickets
  FROM tkt_staged GROUP BY c_student_id)
SELECT d.student_id, d.full_name, d.email, d.phone, d.age, d.age_group, d.city,
  d.state, d.enrollment_date, d.enrollment_status, d.payment_status, d.fee_paid,
  d.total_courses_enrolled, round(d.total_time_spent_hours, 6) AS total_time_spent_hours,
  round(d.avg_score, 6) AS avg_score,
  d.last_activity_date, d.days_since_last_activity, d.ai_risk_score,
  d.ai_risk_category, d.quality_score,
  CAST(coalesce(t.total_tickets, 0) AS BIGINT) AS total_tickets,
  CAST(coalesce(t.open_tickets, 0) AS BIGINT) AS open_tickets
FROM age_grouped d LEFT JOIN tix t ON d.student_id = t.tid"""),

    "q27_eduflow_course_performance" -> (ctes + """
SELECT c.course_id, c.course_name, c.category, c.difficulty, c.price,
  count(DISTINCT e.sid) AS total_enrollments,
  sum(e.fee_paid) AS total_revenue,
  round(avg(e.max_completion_pct), 6) AS avg_completion_rate,
  round(avg(e.avg_score), 6) AS avg_student_score,
  round(sum(e.total_minutes)/60.0, 6) AS total_hours_spent
FROM dim_courses c LEFT JOIN fact_enrollments e ON c.course_id = e.cid
GROUP BY 1, 2, 3, 4, 5"""),

    "q28_eduflow_ai_insights" -> (ctes + """
SELECT 'High Risk Students' AS metric_name,
  count(*) AS metric_value, 'Students with risk score > 70' AS description
FROM dim_students WHERE ai_risk_score > 70
UNION ALL
SELECT 'Negative Sentiment Tickets', count(*), 'Tickets with negative sentiment'
FROM tkt_staged WHERE contains(lower(concat_ws(' ', subject, description)), 'not')
UNION ALL
SELECT 'Low Quality Records', count(*), 'Student records with quality score < 60'
FROM dim_students WHERE quality_score < 60"""),

    "q29_eduflow_daily_dashboard" -> (ctes + """,
dim_date AS (
  SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS date_key,
         CAST(d AS DATE) AS full_date, dayname(d) AS day_name,
         monthname(d) AS month_name, CAST(year(d) AS INT) AS year
  FROM (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2026-12-31', INTERVAL 1 DAY)) AS d)
),
fp AS (
  SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS date_key,
    CASE WHEN c_student_id IN (SELECT c_student_id FROM stu_staged) THEN c_student_id END AS sk_id,
    quality_score, coalesce(c_duration_seconds, 0) AS dur
  FROM (SELECT *, CAST(c_event_timestamp AS DATE) AS d FROM prog_staged)),
pagg AS (
  SELECT date_key, count(DISTINCT sk_id) AS active_students, count(*) AS total_events,
    sum(dur)/3600.0 AS total_hours, avg(quality_score) AS avg_quality_score
  FROM fp GROUP BY date_key),
tagg AS (
  SELECT CAST(year(c_created_date)*10000 + month(c_created_date)*100 + day(c_created_date) AS INT) AS date_key,
    count(*) AS tickets_created
  FROM tkt_staged GROUP BY 1),
fdm AS (
  SELECT coalesce(p.date_key, t.date_key) AS date_key,
    CAST(coalesce(p.active_students, 0) AS BIGINT) AS active_students,
    CAST(coalesce(p.total_events, 0) AS BIGINT) AS total_events,
    coalesce(p.total_hours, 0.0) AS total_hours,
    CAST(coalesce(t.tickets_created, 0) AS BIGINT) AS tickets_created,
    p.avg_quality_score
  FROM pagg p FULL OUTER JOIN tagg t ON p.date_key = t.date_key)
SELECT dd.full_date, dd.day_name, dd.month_name, dd.year,
  f.active_students, f.total_events, round(f.total_hours, 6) AS total_hours,
  f.tickets_created, round(f.avg_quality_score, 6) AS avg_quality_score
FROM fdm f JOIN dim_date dd ON f.date_key = dd.date_key"""),

    "q52_eduflow_progress_summary" -> (ctes + """
SELECT student_id, total_courses_enrolled, total_modules_completed,
  round(avg_score, 6) AS avg_score,
  round(total_time_spent_hours, 6) AS total_time_spent_hours,
  last_activity_date, activity_count_7_days, activity_count_30_days
FROM progress_summary"""),

    "q53_eduflow_course_summary" -> (ctes + """
SELECT c_course_id AS course_id,
  count(DISTINCT c_student_id) AS total_enrollments,
  round(avg(coalesce(c_completion_percentage, 0.0)), 6) AS avg_completion_rate,
  round(avg(c_score), 6) AS avg_score
FROM prog_staged GROUP BY c_course_id"""),

    "q54_eduflow_rule_stats" -> (ctes + """
SELECT
  count(CASE WHEN NOT is_student_id_valid THEN 1 END) AS student_id_valid_invalid,
  count(CASE WHEN NOT is_name_valid THEN 1 END) AS name_valid_invalid,
  count(CASE WHEN NOT is_email_valid THEN 1 END) AS email_valid_invalid,
  count(CASE WHEN NOT is_phone_valid THEN 1 END) AS phone_valid_invalid,
  count(CASE WHEN NOT is_dob_valid THEN 1 END) AS dob_valid_invalid,
  count(CASE WHEN NOT is_gender_valid THEN 1 END) AS gender_valid_invalid,
  count(CASE WHEN NOT is_city_valid THEN 1 END) AS city_valid_invalid,
  count(CASE WHEN NOT is_state_valid THEN 1 END) AS state_valid_invalid,
  count(CASE WHEN NOT is_enrollment_date_valid THEN 1 END) AS enrollment_date_valid_invalid,
  count(CASE WHEN NOT is_fee_valid THEN 1 END) AS fee_valid_invalid
FROM stu_staged"""),

  )
}
