package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Sampling at 100 TB must be a pure function of the row key — never
  * rand(): random sampling changes under retries/re-runs and cannot be
  * reproduced by a downstream consumer or an oracle. The bucket hash here
  * is Knuth multiplicative hashing on the key, portable to any engine
  * (plain 64-bit integer arithmetic), so a split is re-derivable anywhere.
  */
object Split {

  /** Deterministic bucket in [0, buckets) for an integer key column. */
  def bucket(key: Column, buckets: Int): Column =
    pmod((key.cast("long") * lit(2654435761L)) % lit(4294967296L),
      lit(buckets.toLong)).cast("int")

  /** Train/validation/test assignment by percentage cut-points over the
    * deterministic bucket (e.g. 80/10/10). */
  def assign(key: Column, trainPct: Int = 80, validPct: Int = 10): Column = {
    val b = bucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validPct, "valid")
      .otherwise("test")
  }

  /** Split a frame into (train, valid, test) on a key column. */
  def trainValidTest(df: DataFrame, keyCol: String, trainPct: Int = 80,
                     validPct: Int = 10): (DataFrame, DataFrame, DataFrame) = {
    val tagged = df.withColumn("__split", assign(col(keyCol), trainPct, validPct))
    (tagged.filter(col("__split") === "train").drop("__split"),
     tagged.filter(col("__split") === "valid").drop("__split"),
     tagged.filter(col("__split") === "test").drop("__split"))
  }

  /** Deterministic p-percent sample (keeps rows whose bucket < pct). */
  def sample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(bucket(col(keyCol), 100) < pct)

  /** Stratified deterministic sampling: per-stratum percentage targets
    * (strata absent from the map keep `defaultPct`). */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       pcts: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    val pctExpr = pcts.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(strataCol) === k, p).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), 100) < pctExpr)
  }
}
