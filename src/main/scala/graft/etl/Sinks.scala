package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse sinks: partitioned/bucketed parquet layouts.
  *
  * Facts are written partitioned by date_key so time-ranged queries prune
  * partitions at planning time (a scan with `date_key = N` touches one
  * directory out of thousands — the difference between reading 100 TB and
  * reading 50 GB). Dimensions stay unpartitioned (they broadcast).
  */
object Sinks {

  /** Append-mode raw-layer write (O-4's sink side). */
  def appendRaw(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Partitioned fact write. `partitionCols` become directory levels;
    * dynamic overwrite replaces only the partitions present in `df`, so
    * an incremental day-load never rewrites history. */
  def writePartitionedFact(df: DataFrame, path: String,
                           partitionCols: Seq[String] = Seq("date_key")): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Scale-safe partitioned fact write. `repartition(col)` (the small-SF
    * default above and q78's file-count optimum) funnels EVERY row of a
    * partition value through ONE task — at 100 TB a hot partition (today's
    * date_key, the `en` lang) becomes a single-task, single-file write
    * that straggles the whole job. This variant spreads each partition
    * value over `tasksPerPartition` shuffle tasks (hash on partition cols
    * + a salt), and caps rows per output file so no file degenerates;
    * planning-time pruning is unchanged (directories are identical, just
    * holding several files). Trade-off documented in docs/SCALE.md: more
    * small files at tiny SF, bounded task skew at scale. */
  def writePartitionedFactScaled(df: DataFrame, path: String,
                                 partitionCols: Seq[String] = Seq("date_key"),
                                 tasksPerPartition: Int = 8,
                                 maxRecordsPerFile: Long = 5000000L): Unit = {
    require(tasksPerPartition >= 1, "tasksPerPartition >= 1")
    import org.apache.spark.sql.functions.{col, pmod, spark_partition_id, xxhash64}
    val salted = df.repartition(
      // salt derived from a stable row hash, NOT rand(): deterministic
      // re-runs (speculative tasks, retries) must land rows identically
      (partitionCols.map(col) :+
        pmod(xxhash64(spark_partition_id()), org.apache.spark.sql.functions
          .lit(tasksPerPartition.toLong))): _*)
    salted.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed write for co-located joins: both sides bucketed by the join
    * key join without a shuffle. Requires a table (metastore) target. */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
                         buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
