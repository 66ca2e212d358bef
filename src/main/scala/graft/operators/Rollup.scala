package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained group-by rollups — the
  * materialized-view machinery for the most common aggregate shape
  * (count / sum / min / max per key), generalizing the per-family
  * persisted-stats tables (moments, histogram, CMS/HLL/Bloom) to an
  * arbitrary key + measure set. (Reference analogue: the summary tables
  * dags/transform.py recomputes in full per run; here each commit
  * contributes one delta-sized aggregation instead.)
  *
  * Table schema: keyCols..., <count>, <sums...>, <mins...>, <maxes...>,
  * batch_id — one BOUNDED frame per append (|distinct keys in batch|
  * rows). The fold is replay-safe and insert-only:
  *  - replay dedup on (batch_id, keys) keep-any — a re-appended batch
  *    writes byte-identical rows, so at-least-once delivery folds to
  *    exactly-once (the moments-table argument);
  *  - count and sums merge by SUM, mins by MIN, maxes by MAX — valid
  *    for insert-only feeds; deletes would need signed deltas for the
  *    sums and are out of scope here (min/max are not delete-mergeable
  *    at all without a full per-key recount).
  * At 100 TB the base is never rescanned: the read folds |batches| x
  * |keys| bounded delta rows; compaction keeps that product from
  * accreting.
  */
object Rollup {

  /** One batch's delta frame: the rollup of `df` alone, stamped with
    * `batchId`. sumCols/minCols/maxCols map source column -> output
    * measure name; `countName` is the row-count measure. */
  def deltaRollup(df: DataFrame, keyCols: Seq[String], countName: String,
                  sumCols: Map[String, String], minCols: Map[String, String],
                  maxCols: Map[String, String], batchId: String): DataFrame = {
    val aggs = sumCols.toSeq.sortBy(_._2).map { case (c, n) =>
      sum(col(c)).cast("long").as(n) } ++
      minCols.toSeq.sortBy(_._2).map { case (c, n) => min(col(c)).as(n) } ++
      maxCols.toSeq.sortBy(_._2).map { case (c, n) => max(col(c)).as(n) }
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(countName), aggs: _*)
      .withColumn("batch_id", lit(batchId))
  }

  /** Append one batch's bounded delta frame to the table at `path`. */
  def appendRollup(df: DataFrame, keyCols: Seq[String], countName: String,
                   sumCols: Map[String, String], minCols: Map[String, String],
                   maxCols: Map[String, String], path: String,
                   batchId: String): Unit =
    deltaRollup(df, keyCols, countName, sumCols, minCols, maxCols, batchId)
      .write.mode("append").parquet(path)

  /** ONE fold shared by the read path and compaction (the moments-table
    * r8-review rule): replay-dedup on (batch_id, keys), then merge —
    * SUM for the count and sums, MIN/MAX for the extremes. */
  private def fold(df: DataFrame, keyCols: Seq[String], countName: String,
                   sumNames: Seq[String], minNames: Seq[String],
                   maxNames: Seq[String]): DataFrame =
    df.dropDuplicates("batch_id" +: keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(countName)).cast("long").as(countName),
        sumNames.map(n => sum(col(n)).cast("long").as(n)) ++
          minNames.map(n => min(col(n)).as(n)) ++
          maxNames.map(n => max(col(n)).as(n)): _*)

  /** The maintained rollup: fold everything ever appended. Equals the
    * one-shot rollup of the union of all (deduped) batches — q265's
    * proof, anchored on q215's full-recompute oracle. */
  def rollupFromTable(spark: SparkSession, path: String, keyCols: Seq[String],
                      countName: String, sumNames: Seq[String],
                      minNames: Seq[String], maxNames: Seq[String]): DataFrame =
    fold(spark.read.parquet(path), keyCols, countName, sumNames, minNames,
      maxNames)

  /** Rewrite the delta table with all batches folded into one frame
    * under a synthetic batch id (value-preserving by the fold argument).
    * Same operating constraint as [[Embeddings.compactMoments]]: only
    * compact with the writing stream STOPPED on a committed checkpoint —
    * folding erases the per-batch ids a replayed in-flight micro-batch
    * would dedup against. */
  def compactRollup(spark: SparkSession, path: String, keyCols: Seq[String],
                    countName: String, sumNames: Seq[String],
                    minNames: Seq[String], maxNames: Seq[String],
                    targetFiles: Int = 1): (Int, Int) =
    graft.etl.Sinks.compactWith(spark, path, targetFiles,
      fold(_, keyCols, countName, sumNames, minNames, maxNames)
        .withColumn("batch_id", lit("__compacted")))
}
