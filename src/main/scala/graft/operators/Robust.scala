package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust statistics for data-quality gating: median / MAD outlier
  * detection. Mean/stddev outlier rules break on the exact data they are
  * meant to catch (a handful of extreme rows drags the mean toward
  * itself and inflates sigma until nothing is an outlier — masking);
  * the median and the median-absolute-deviation have a 50% breakdown
  * point, so the fences hold even on heavily polluted columns.
  *
  * Exactness: this is the EXACT form — Spark's `percentile` and DuckDB's
  * `quantile_cont` compute the same linear-interpolated order statistic
  * (bit-parity established by q44), so the whole operator replays in the
  * oracle. Spark's exact percentile buffers each group's values, which is
  * the right trade for grouped telemetry/metric columns (bounded groups);
  * for 100 TB single-group columns use the mergeable histogram sketch
  * ([[Sketch.histogramQuantiles]], q82) as the approximate scale path.
  *
  * Physical shape: two grouped aggregates with the group-keyed medians
  * BROADCAST back between them (group cardinality is the broadcast bound,
  * not data), one final counting aggregate — three passes over the
  * column, nothing corpus×corpus. */
object Robust {

  /** Per-group median, MAD, and the count of rows outside
    * `|x - median| > k * MAD` — (groupCol, med, mad, n, n_outliers).
    * Published med/mad are rounded to 6 decimals; the fence predicate
    * uses the UNROUNDED values (the q81 threshold convention). */
  def madOutlierStats(df: DataFrame, groupCol: String, valueCol: String,
                      k: Double = 3.0): DataFrame = {
    require(k > 0, "madOutlierStats: k > 0")
    val ev = df.select(col(groupCol).as("__g"),
      col(valueCol).cast("double").as("__v"))
    val med = ev.groupBy(col("__g"))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val dev = ev.join(broadcast(med), "__g")
      .withColumn("__adev", abs(col("__v") - col("__med")))
    val mad = dev.groupBy(col("__g"), col("__med"))
      .agg(expr("percentile(__adev, 0.5)").as("__mad"))
    dev.join(broadcast(mad.select(col("__g"), col("__mad"))), "__g")
      .groupBy(col("__g"), col("__med"), col("__mad"))
      .agg(count(lit(1)).as("n"),
        count(when(col("__adev") > lit(k) * col("__mad"), 1))
          .as("n_outliers"))
      .select(col("__g").as(groupCol),
        round(col("__med"), 6).as("med"),
        round(col("__mad"), 6).as("mad"),
        col("n"), col("n_outliers"))
  }
}
