package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** The external-AI enrichment operator shape: batch rows out to a remote
  * service, merge the enrichment back, and fall back to a deterministic
  * stub on ANY failure — the pipeline never blocks on the model being up.
  *
  * Reference: operators/ai_enrichment.py:62-131 — payload batched as JSON,
  * HTTP POST with a 30 s timeout, `enrich_fn` stub fallback on any
  * exception (:81-83); the deterministic batch stub adds
  * `ai_risk_score=42.0, ai_risk_category="Medium"`
  * (data_transformation_pipeline.py:77-81).
  *
  * Spark-first shape: the HTTP call is genuine per-partition imperative
  * work — exactly the `mapPartitions` carve-out — but everything around it
  * stays declarative: rows are serialized with `to_json(struct(*))` before
  * the map (codegen'd), and the response fields are pulled out with
  * `get_json_object` after it (codegen'd), so the opaque region is ONLY
  * the network call. At scale each partition issues its own batched calls
  * (no driver round-trip, no collect); `batchSize` bounds request payloads.
  */
object ExternalEnrichment {

  /** One batched enrichment call: input rows as JSON object strings, output
    * one JSON object string per input row (same order). Implementations
    * must be serializable — they ship to executors. */
  trait Enricher extends Serializable {
    def enrich(batch: Seq[String]): Seq[String]
  }

  /** The reference's deterministic stub (ai_risk_score=42.0, "Medium") —
    * the default fallback, and the default enricher offline. */
  object StubEnricher extends Enricher {
    override def enrich(batch: Seq[String]): Seq[String] =
      batch.map(_ => """{"ai_risk_score":42.0,"ai_risk_category":"Medium"}""")
  }

  /** HTTP POST enricher (reference `_call_endpoint`): body = JSON array of
    * row objects, response = JSON array of enriched objects, hard timeout
    * per request. Uses the JDK HttpClient — no extra dependencies. */
  final case class HttpEnricher(endpoint: String, timeoutSeconds: Int = 30)
      extends Enricher {

    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
      .build()

    override def enrich(batch: Seq[String]): Seq[String] = {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds.toLong))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          batch.mkString("[", ",", "]")))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() < 200 || resp.statusCode() >= 300)
        throw new RuntimeException(
          s"enrichment endpoint returned HTTP ${resp.statusCode()}")
      val out = splitTopLevelArray(resp.body())
      require(out.size == batch.size,
        s"enrichment endpoint returned ${out.size} records for ${batch.size} inputs")
      out
    }
  }

  /** Split a JSON array string into its top-level element strings (depth
    * and string-literal aware — no JSON library on the executor path). */
  private[graft] def splitTopLevelArray(s: String): Seq[String] = {
    val body = s.trim
    require(body.startsWith("[") && body.endsWith("]"),
      "enrichment response is not a JSON array")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    var i = 1
    while (i < body.length - 1) {
      val c = body.charAt(i)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true; if (depth == 0 && start < 0) start = i
        case '{' | '[' => if (depth == 0) start = i; depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 => if (start >= 0) out += body.substring(start, i).trim; start = -1
        case c2 if depth == 0 && start < 0 && !c2.isWhitespace => start = i
        case _ => ()
      }
      i += 1
    }
    if (start >= 0) out += body.substring(start, body.length - 1).trim
    out.toSeq
  }

  /** Enrich `df` with `ai_risk_score`/`ai_risk_category`: rows go out in
    * `batchSize` JSON batches per partition; any enricher failure falls
    * back to `fallback` for THAT batch (reference :81-83 — the run always
    * completes, enrichment degrades to the stub). */
  def enrich(df: DataFrame, enricher: Enricher = StubEnricher,
             fallback: Enricher = StubEnricher, batchSize: Int = 64): DataFrame = {
    val withJson = df.withColumn("__json",
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
    val outSchema = withJson.schema.add("__resp", "string")
    val jsonIdx = withJson.schema.fieldIndex("__json")
    val enriched = withJson.mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val payload = rows.map(_.getString(jsonIdx))
        val resp =
          try {
            val r = enricher.enrich(payload)
            if (r.size == payload.size) r else fallback.enrich(payload)
          } catch { case _: Throwable => fallback.enrich(payload) }
        // the FALLBACK must honor the one-out-per-in contract — a silent
        // lazyZip truncation here would drop input rows
        require(resp.size == payload.size,
          s"fallback enricher returned ${resp.size} records for ${payload.size} inputs")
        rows.lazyZip(resp).map((r, j) => Row.fromSeq(r.toSeq :+ j))
      }
    }(Encoders.row(outSchema))
    enriched
      .withColumn("ai_risk_score",
        get_json_object(col("__resp"), "$.ai_risk_score").cast("double"))
      .withColumn("ai_risk_category",
        get_json_object(col("__resp"), "$.ai_risk_category"))
      .drop("__json", "__resp")
  }
}
