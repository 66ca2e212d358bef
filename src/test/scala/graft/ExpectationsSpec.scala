package graft

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  // 5-row fixture with one planted violation per check kind:
  // id 4 duplicated, one null email, one out-of-range score, one bad
  // status, one FK orphan (dept 99), and a stale max date.
  private val people = Seq(
    (1L, "a@x.com", 50.0, "active", 10L, "2024-01-01"),
    (2L, null.asInstanceOf[String], 70.0, "active", 10L, "2024-02-01"),
    (3L, "c@x.com", 150.0, "retired", 20L, "2024-03-01"),
    (4L, "d@x.com", 60.0, "active", 99L, "2024-04-01"),
    (4L, "e@x.com", 61.0, "active", 20L, "2024-05-01"))
    .toDF("id", "email", "score", "status", "dept_id", "joined")
  private val depts = Seq(10L, 20L).toDF("dept_id")

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("every check kind counts its planted violation") {
    val out = resultMap(Expectations.run(people, Seq(
      NotNull("email"),
      Unique(Seq("id")),
      InRange("score", 0.0, 100.0),
      InSet("status", Seq("active")),
      ForeignKey("dept_id", depts, "dept_id"),
      MinDate("joined", "2025-01-01"))))
    assert(out("not_null:email") == ((1L, 5L, false)))
    // both rows of the duplicated id count as violating
    assert(out("unique:id") == ((2L, 5L, false)))
    assert(out("range:score") == ((1L, 5L, false)))
    assert(out("accepted_values:status") == ((1L, 5L, false)))
    assert(out("fk:dept_id") == ((1L, 5L, false)))
    // max(joined) = 2024-05-01 < 2025-01-01 -> stale
    assert(out("freshness:joined") == ((1L, 5L, false)))
  }

  test("clean table passes every check") {
    val out = resultMap(Expectations.run(people.filter($"id" < 3),
      Seq(NotNull("id"), Unique(Seq("id")), InRange("score", 0.0, 100.0),
        MinDate("joined", "2024-02-01"))))
    assert(out.values.forall { case (v, n, pass) => v == 0L && n == 2L && pass })
  }

  test("null FK values are not violations; empty checks rejected") {
    val withNull = Seq((1L, Option.empty[java.lang.Long]))
      .toDF("id", "dept_id")
    val out = resultMap(Expectations.run(withNull,
      Seq(ForeignKey("dept_id", depts, "dept_id"))))
    assert(out("fk:dept_id") == ((0L, 1L, true)))
    intercept[IllegalArgumentException] {
      Expectations.run(people, Seq.empty)
    }
  }
}
