package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink builders for the reference's topic topology
  * (kafka/streaming.py:30, 83-85): `raw.student.events` in;
  * `processed.cleaned.events`, `alerts.anomalies`, `dlq.failed.events` out.
  *
  * Environment constraint: the `spark-sql-kafka-0-10` connector jar is NOT
  * in this offline image, so these builders are compile-checked and their
  * option maps unit-tested; `load()`/`start()` require a deployment with
  * the connector on the classpath and a reachable broker. The rate-source
  * simulator + foreachBatch path in [[Stream]] covers the same semantics
  * offline.
  */
object Kafka {

  /** The reference topic names (kafka/streaming.py:30, 83-85). */
  object Topics {
    val raw = "raw.student.events"
    val cleaned = "processed.cleaned.events"
    val enriched = "processed.enriched.events"
    val alerts = "alerts.anomalies"
    val dlq = "dlq.failed.events"
  }

  /** Pure option map for a Kafka stream source — unit-testable without the
    * connector. `startingOffsets=earliest` mirrors the reference consumer's
    * auto_offset_reset="earliest" (streaming.py:124). */
  def sourceOptions(bootstrapServers: String, topic: String,
                    startingOffsets: String = "earliest",
                    maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Pure option map for a Kafka sink. */
  def sinkOptions(bootstrapServers: String, topic: String,
                  checkpointDir: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)

  /** Kafka JSON-event source: subscribes and projects the payload to
    * (event string, topic, timestamp). Downstream parsing/cleaning is the
    * same from_json + rule pipeline as the simulator path (ST-2: one rule
    * codebase for batch and stream). Requires the Kafka connector jar. */
  def source(spark: SparkSession, bootstrapServers: String,
             topic: String = Topics.raw,
             startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(bootstrapServers, topic, startingOffsets))
      .load()
      .select(
        col("value").cast("string").as("event"),
        col("topic"), col("timestamp"))

  /** Kafka sink for a frame with an `event` string column (JSON payloads):
    * event -> value, optional `key` column passed through. Requires the
    * Kafka connector jar; exactly-once via the checkpoint + broker
    * idempotence, mirroring ST-8's contract. */
  def sink(df: DataFrame, bootstrapServers: String, topic: String,
           checkpointDir: String): DataStreamWriter[Row] = {
    val keyed =
      if (df.columns.contains("key")) df.select(col("key").cast("string"), col("event").as("value"))
      else df.select(col("event").as("value"))
    keyed.writeStream.format("kafka")
      .options(sinkOptions(bootstrapServers, topic, checkpointDir))
  }
}
