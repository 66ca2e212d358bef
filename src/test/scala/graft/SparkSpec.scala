package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.localSession(4, "graft-tests")
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  import org.apache.spark.sql.{DataFrame, Row}

  /** Collect a single-column DataFrame to a list for assertions. */
  def rows(df: DataFrame): Seq[Row] = df.collect().toIndexedSeq
}
