package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata/audit log frames — the reference's `metadata` schema tables
  * (init_db/init_schema.sql:541-592): pipeline_runs, data_quality_summary,
  * ai_processing_log.
  *
  * Spark-first: each log is a small DataFrame builder the pipeline emits
  * alongside the warehouse (append-mode parquet tables in production).
  * Counts arrive as already-computed aggregates — a log row is O(1), never
  * a scan.
  */
object Metadata {

  /** metadata.pipeline_runs row (init_schema.sql:541-558). */
  def runLog(spark: SparkSession, runId: String, pipelineName: String,
             dagId: String, startTime: java.sql.Timestamp,
             endTime: java.sql.Timestamp, status: String,
             recordsRead: Long, recordsWritten: Long, recordsFailed: Long,
             inputFile: String, errorMessage: Option[String] = None): DataFrame =
    spark.range(1).select(
      lit(runId).as("run_id"),
      lit(pipelineName).as("pipeline_name"),
      lit(dagId).as("dag_id"),
      lit(startTime).as("start_time"),
      lit(endTime).as("end_time"),
      lit(status).as("status"),
      lit(recordsRead).as("records_read"),
      lit(recordsWritten).as("records_written"),
      lit(recordsFailed).as("records_failed"),
      lit(inputFile).as("input_file"),
      lit(errorMessage.orNull).cast("string").as("error_message"))

  /** metadata.data_quality_summary row for one staged table
    * (init_schema.sql:561-577): record counts + avg quality + the per-rule
    * counters as a JSON string (the JSONB rule_stats shape). Valid means
    * quality_score = 100; duplicates counts the D-1 flag. */
  def qualityLog(runId: String, tableName: String, staged: DataFrame,
                 ruleStats: DataFrame): DataFrame = {
    val counts = staged.agg(
      count(lit(1)).as("total_records"),
      count(when(col("quality_score") === 100, 1)).as("valid_records"),
      count(when(col("quality_score") < 100, 1)).as("invalid_records"),
      count(when(col("is_duplicate"), 1)).as("duplicate_records"),
      avg(col("quality_score")).cast("decimal(5,2)").as("avg_quality_score"))
    val stats = ruleStats.select(
      to_json(struct(ruleStats.columns.map(col).toIndexedSeq: _*)).as("rule_stats"))
    counts.crossJoin(stats).select(
      lit(runId).as("run_id"),
      lit(tableName).as("table_name"),
      col("total_records"), col("valid_records"), col("invalid_records"),
      col("duplicate_records"), col("avg_quality_score"), col("rule_stats"))
  }

  /** metadata.ai_processing_log row (init_schema.sql:580-592). */
  def aiLog(spark: SparkSession, runId: String, agentName: String,
            recordsProcessed: Long, processingTimeSeconds: Double,
            tokensUsed: Long, status: String,
            errorMessage: Option[String] = None): DataFrame =
    spark.range(1).select(
      lit(runId).as("run_id"),
      lit(agentName).as("agent_name"),
      lit(recordsProcessed).as("records_processed"),
      lit(BigDecimal(processingTimeSeconds).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .cast("decimal(10,2)").as("processing_time_seconds"),
      lit(tokensUsed).as("tokens_used"),
      lit(status).as("status"),
      lit(errorMessage.orNull).cast("string").as("error_message"))
}
