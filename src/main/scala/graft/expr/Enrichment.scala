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

  /** Risk points: inactivity, low completion, payment not completed. */
  def riskScore(inactiveDays: Column, completionPct: Column, paymentStatus: Column): Column =
    when(inactiveDays > 30, 20).otherwise(0) +
      when(completionPct < 30, 25).otherwise(0) +
      when(paymentStatus =!= "Completed", 15).otherwise(0)

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
}
