package graft

import org.apache.spark.sql.functions._
import graft.operators.ExternalEnrichment
import graft.operators.ExternalEnrichment.{Enricher, HttpEnricher, StubEnricher}

/** Batch-size probe shared with executor threads (local mode: one JVM). */
object BatchProbe {
  val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

/** External-enrichment operator (reference ai_enrichment.py:62-131) and the
  * agent stubs (langgraph_workflow.py) — mirrored behavior tests. */
class EnrichmentOpsSpec extends SparkSpec {
  import spark.implicits._

  private def students = Seq(
    ("STU001", 10.0), ("STU002", 55.0), ("STU003", 90.0)).toDF("student_id", "completion")

  test("stub enricher adds the reference's deterministic columns (42.0 / Medium)") {
    val got = ExternalEnrichment.enrich(students)
      .select("student_id", "ai_risk_score", "ai_risk_category")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got.toSet == Set(("STU001", 42.0, "Medium"),
      ("STU002", 42.0, "Medium"), ("STU003", 42.0, "Medium")))
  }

  test("failing endpoint falls back to the stub for every row (reference :81-83)") {
    // unroutable endpoint -> connect error on every batch -> stub columns
    val enricher = HttpEnricher("http://127.0.0.1:1/enrich", timeoutSeconds = 1)
    val got = ExternalEnrichment.enrich(students, enricher)
      .select("student_id", "ai_risk_score", "ai_risk_category")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    assert(got.toSet == Set(("STU001", 42.0, "Medium"),
      ("STU002", 42.0, "Medium"), ("STU003", 42.0, "Medium")))
  }

  test("enricher sees bounded batches in row order; response merges by position") {
    BatchProbe.sizes.clear()
    val echo = new Enricher {
      override def enrich(batch: Seq[String]): Seq[String] = {
        // BatchProbe is a static object — shared with executor threads in
        // local mode even though the enricher closure is serialized
        BatchProbe.sizes.add(batch.size)
        batch.map(j => s"""{"ai_risk_score":${j.length}.0,"ai_risk_category":"Echo"}""")
      }
    }
    val df = spark.range(10).select(col("id"), concat(lit("row"), col("id")).as("tag"))
      .coalesce(1)
    val got = ExternalEnrichment.enrich(df, echo, batchSize = 4)
      .select("id", "ai_risk_category").collect()
    assert(got.length == 10 && got.forall(_.getString(1) == "Echo"))
    assert(BatchProbe.sizes.toArray.toSeq == Seq(4, 4, 2)) // one partition
  }

  test("wrong-cardinality response falls back to the stub") {
    val broken = new Enricher {
      override def enrich(batch: Seq[String]): Seq[String] =
        Seq("""{"ai_risk_score":1.0,"ai_risk_category":"X"}""")
    }
    // single partition so the one batch holds all 3 rows -> size mismatch
    val got = ExternalEnrichment.enrich(students.coalesce(1), broken)
      .select("ai_risk_category").collect().map(_.getString(0))
    assert(got.forall(_ == "Medium"))
  }

  test("splitTopLevelArray: generated arrays round-trip exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val jsonString: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("a,b", "x}y", "p]q", "br{ck", "\\\"esc\\\"", "tail\\\\", " sp "))
      .map(s => "\"" + s + "\"")
    val jsonValue: Gen[String] = Gen.oneOf(
      jsonString, Gen.chooseNum(-999, 999).map(_.toString),
      Gen.const("null"), Gen.const("true"))
    val jsonObj: Gen[String] = Gen.mapOfN(3,
        Gen.zip(Gen.identifier.suchThat(_.nonEmpty), jsonValue))
      .map(m => m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}"))
    val arrays = Gen.listOfN(40, Gen.listOfN(4, jsonObj))
      .pureApply(Gen.Parameters.default, Seed(7L))
    for (elems <- arrays) {
      val rendered = elems.mkString("[ ", " , ", " ]")
      assert(ExternalEnrichment.splitTopLevelArray(rendered) == elems,
        s"failed on: $rendered")
    }
  }

  test("splitTopLevelArray: nesting, strings with commas/braces, whitespace") {
    val s = """[ {"a":1,"b":{"c":[1,2]}}, {"t":"x,}]y"}, {"n":null} ]"""
    assert(ExternalEnrichment.splitTopLevelArray(s) == Seq(
      """{"a":1,"b":{"c":[1,2]}}""", """{"t":"x,}]y"}""", """{"n":null}"""))
    assert(ExternalEnrichment.splitTopLevelArray("[]") == Seq.empty)
  }

  test("route_event mirrors the langgraph dispatcher (:5-10)") {
    val got = Seq("ticket", "quality", "progress", "anything")
      .toDF("type")
      .select(col("type"), graft.expr.Enrichment.routeEvent(col("type")).as("agent"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("ticket" -> "support_analyzer", "quality" -> "quality_analyzer",
      "progress" -> "student_risk", "anything" -> "student_risk"))
  }

  test("quality_analyzer names the worst field with the fixed recommendation (:34-36)") {
    val stats = Seq((2L, 8L, 0L)).toDF("email_valid_invalid", "phone_valid_invalid",
      "dob_valid_invalid")
    val r = etl.Transform.qualityAnalysis(stats).head()
    assert(r.getString(0) == "Top issue: phone")
    assert(r.getString(1) == "Improve validation at source")
  }

  test("insight_generator emits the fixed summary and actions (:39-44)") {
    val r = etl.Transform.insightReport(students).head()
    assert(r.getString(0) == "Data processed; Quality stable")
    assert(r.getString(1) == "Remediate invalid emails; Follow up with pending payments")
  }

  test("metrics collector records completed actions with durations") {
    val collector = graft.tools.Metrics.install(spark)
    students.count()
    students.agg(sum(col("completion"))).collect()
    // listener bus is async — poll briefly for the callbacks to land
    val deadline = System.currentTimeMillis() + 10000
    while (collector.size < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(collector.size >= 2)
    val snap = collector.snapshot(spark).collect()
    assert(snap.forall(r => !r.getBoolean(r.fieldIndex("failed"))))
    assert(snap.forall(r => r.getLong(r.fieldIndex("duration_ms")) >= 0))
    val counters = collector.counters(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counters.values.sum >= 2)
  }

  test("kafka option maps carry the reference topology") {
    import graft.streaming.Kafka
    val src = Kafka.sourceOptions("broker:9092", Kafka.Topics.raw,
      maxOffsetsPerTrigger = Some(1000L))
    assert(src("subscribe") == "raw.student.events")
    assert(src("kafka.bootstrap.servers") == "broker:9092")
    assert(src("startingOffsets") == "earliest")
    assert(src("maxOffsetsPerTrigger") == "1000")
    val snk = Kafka.sinkOptions("broker:9092", Kafka.Topics.dlq, "/tmp/ckpt")
    assert(snk("topic") == "dlq.failed.events")
    assert(snk("checkpointLocation") == "/tmp/ckpt")
  }
}
