package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** AI-enrichment stubs as pure deterministic Column expressions.
  *
  * Reference: agents/langgraph_workflow.py:13-54 — risk scorer (+20
  * inactivity, +25 low completion, +15 unpaid; bucketed), sentiment stub
  * ("not" in text -> Negative/-0.2 else Neutral/0.0), and the batch stub
  * (operators/ai_enrichment.py:62-83) that falls back to deterministic
  * values on any external-LLM failure. The engine keeps the deterministic
  * form as the default (oracle-reproducible); an external scorer would slot
  * in behind the same column contract via mapPartitions.
  */
object Enrichment {

  /** Risk points: inactivity, low completion, payment not completed.
    * Null semantics mirror the reference (langgraph_workflow.py:13-26):
    * `(completion_rate or 0) < 30` and `(payment_status or '').lower() !=
    * 'completed'`, so null completion scores +25 and null/any-case
    * non-completed payment scores +15; capped at 100 like the reference's
    * `min(risk, 100)`. */
  def riskScore(inactiveDays: Column, completionPct: Column, paymentStatus: Column): Column =
    least(
      when(coalesce(inactiveDays, lit(0)) > 30, 20).otherwise(0) +
        when(coalesce(completionPct, lit(0.0)) < 30, 25).otherwise(0) +
        when(lower(coalesce(paymentStatus, lit(""))) =!= "completed", 15).otherwise(0),
      lit(100))

  /** Buckets: Critical>=75, High>=50, Medium>=25, else Low
    * (langgraph_workflow.py:47-54). */
  def riskCategory(score: Column): Column =
    when(score >= 75, "Critical")
      .when(score >= 50, "High")
      .when(score >= 25, "Medium")
      .otherwise("Low")

  /** Sentiment stub: "not" substring -> Negative/-0.2 else Neutral/0.0
    * (langgraph_workflow.py:29-31). */
  def sentiment(text: Column): (Column, Column) = {
    val neg = lower(coalesce(text, lit(""))).contains("not")
    (when(neg, "Negative").otherwise("Neutral"),
     when(neg, -0.2).otherwise(0.0))
  }

  /** Agent router (langgraph_workflow.py:5-10): event type -> agent name.
    * ticket -> support_analyzer, quality -> quality_analyzer, else
    * student_risk. */
  def routeEvent(eventType: Column): Column =
    when(eventType === "ticket", "support_analyzer")
      .when(eventType === "quality", "quality_analyzer")
      .otherwise("student_risk")

  /** quality_analyzer agent (langgraph_workflow.py:34-36): names the worst
    * field and a fixed recommendation. `worstField` is the caller-computed
    * argmax over per-rule invalid counters (Transform.ruleStats). */
  def qualityAnalysis(worstField: Column): Column =
    concat(lit("Top issue: "), coalesce(worstField, lit("email")))

  val qualityRecommendation = "Improve validation at source"

  /** insight_generator agent (langgraph_workflow.py:39-44): fixed
    * executive summary + action items. */
  def insights(): (Column, Column) = (
    array(lit("Data processed"), lit("Quality stable")),
    array(lit("Remediate invalid emails"), lit("Follow up with pending payments")))
}
