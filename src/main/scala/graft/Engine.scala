package graft

import org.apache.spark.sql.SparkSession

/** The engine's blessed SparkSession configuration — one place for every
  * setting correctness or scale depends on, used by Verify/Bench/tests and
  * available to library users as the supported entry point.
  */
object Engine {

  /** Apply graft's required configs to a builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // reproducibility: timestamps pinned to UTC everywhere
    .config("spark.sql.session.timeZone", "UTC")
    // testdata events.parquet carries TIMESTAMP(NANOS); read as long and
    // let Tables.load convert (Spark has no nanos timestamp type)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // AQE: runtime coalescing + skew-join splitting (on by default in
    // Spark 4 — pinned here so a deployment override cannot silently
    // regress the skew story)
    .config("spark.sql.adaptive.enabled", "true")
    // Spark 4.1's checksum checkpoint manager deadlocks its background
    // pool under local[n] streaming; disable until fixed upstream
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // native SQL functions (positional_similarity etc.)
    .config("spark.sql.extensions", classOf[graft.expr.GraftExtensions].getName)
    // bucketed saveAsTable targets (Sinks.writeBucketedTable) land under
    // the build dir, never the repo root's default ./spark-warehouse
    .config("spark.sql.warehouse.dir",
      new java.io.File("target/spark-warehouse").getAbsolutePath)

  /** Local session for tools/tests: `cores` threads, shuffle partitions
    * sized to match (not the 200 default — at local scale extra partitions
    * are pure scheduling overhead; on a cluster, size to ~2-3x total
    * cores or rely on AQE coalescing). */
  def localSession(cores: Int, appName: String = "graft"): SparkSession = {
    // locale-sensitive functions (date_format EEEE/MMMM day/month names)
    // must produce English regardless of host locale — the oracle and the
    // is_weekend isin("Saturday","Sunday") checks assume it. Local mode:
    // driver JVM == executor JVM, one setDefault covers both; on a cluster
    // ship -Duser.language=en via spark.executor.extraJavaOptions.
    java.util.Locale.setDefault(java.util.Locale.ENGLISH)
    val s = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
