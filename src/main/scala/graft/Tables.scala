package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * All queries are parameterized by the scale-factor directory so the same
  * code runs at sf0.001 (smoke), sf0.01 (correctness oracle) and sf0.1
  * (bench) — and, unchanged, against a 100 TB warehouse directory on a real
  * cluster: nothing below hardcodes row counts or collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Parquet TIMESTAMP(NANOS) is not a legal Spark timestamp; read it as
    // epoch-nanos long and convert to TimestampType (truncating ns->us,
    // exactly what DuckDB does reading the same file). The conf is set
    // here, not only at session build, so the loaders work in ANY session
    // (it is runtime-settable and only consulted during schema conversion).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
