package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
