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
