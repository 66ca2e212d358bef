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

  /** Per-group percentile-rank score calibration — the step before a
    * GLOBAL quality threshold can be applied to a heterogeneous corpus.
    * Raw quality scores are not comparable across sources (a "good"
    * length/punctuation profile for forum posts is a terrible one for
    * reference text), so thresholding raw scores keeps whole sources and
    * drops whole sources. Rank-normalizing within each source first
    * (norm = (rank - 1) / (n - 1) ∈ [0, 1]) makes "top 30% of each
    * source" a single global predicate — the CCNet-style per-bucket
    * selection generalized to any score.
    *
    * Determinism: `rank()` over (score asc) gives ties an identical
    * rank, so norm is a pure function of the score multiset — no
    * tie-break arbitrariness crosses engines; the decile boundary is
    * integer-exact ((rank-1)*10 DIV (n-1), capped at 9) so no float
    * boundary decides bucket membership. Per-row norms are frozen to
    * DECIMAL(10,6) before the sum so the group mean is
    * order-independent.
    *
    * Scale shape: one rank window per source (shuffle keyed on the
    * group; a skewed giant source is ONE sort — for that shape switch
    * the score to its [[Sketch.histogramQuantiles]] bucket first), then
    * a bounded (group × decile) aggregate.
    * Output: (groupCol, decile, n_docs, min_score, max_score, mean_norm). */
  def percentileCalibration(df: DataFrame, groupCol: String,
                            scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__v").asc)
    val ranked = df
      .select(col(groupCol).as("__g"), col(scoreCol).cast("long").as("__v"))
      .withColumn("__rank", rank().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))))
      .withColumn("__norm",
        when(col("__n") === 1, lit(0.0)).otherwise(
          (col("__rank") - 1).cast("double") / (col("__n") - 1).cast("double")))
      .withColumn("decile",
        when(col("__n") === 1, lit(0)).otherwise(
          least(expr("CAST((__rank - 1) * 10 DIV (__n - 1) AS INT)"), lit(9))))
    ranked.groupBy(col("__g"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("__v")).as("min_score"), max(col("__v")).as("max_score"),
        sum(round(col("__norm"), 6).cast("decimal(10,6)")).as("__snorm"))
      .select(col("__g").as(groupCol), col("decile"), col("n_docs"),
        col("min_score"), col("max_score"),
        round(col("__snorm").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_norm"))
  }
}
