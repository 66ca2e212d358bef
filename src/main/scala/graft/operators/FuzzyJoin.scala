package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** R-8 / J-2: fuzzy match of a dirty string column against a master list —
  * a similarity theta-join keeping the best match per probe (argmax).
  *
  * Reference semantics (cleaning_rules.py:156-169, 223-237): positional
  * character similarity = (# positions where chars match, over the common
  * prefix length) / max(len). NOT levenshtein. Best match accepted when
  * similarity >= threshold (0.8).
  *
  * Spark-first: similarity is a pure built-in expression (split + zip_with +
  * filter), fully codegen'd — no UDF. The join broadcasts the master list
  * (city/nation masters are KBs even at 100 TB fact scale) and takes top-1
  * per probe with a window. For very large masters the tiered short-circuit
  * (alias -> exact -> fuzzy, SURVEY.md §7.4-2) keeps the cross-join side to
  * the residue that failed exact match.
  */
object FuzzyJoin {

  /** Positional char similarity in [0,1]; both sides must be non-null.
    * zip_with pads the shorter array with nulls, (x = y) is null then, and
    * filter drops nulls — so matches count over the common prefix only,
    * exactly the reference's zip(a, b) loop.
    */
  def positionalSimilarity(a: Column, b: Column): Column =
    // native codegen'd Expression (graft.expr.PositionalSimilarity) — the
    // hot path of the fuzzy cross join; reference `_similarity` lowercases
    // both sides (cleaning_rules.py:234-237)
    graft.expr.GraftFunctions.positionalSimilarity(a, b)

  /** Best master match per probe row: adds `<out>` (matched master value or
    * null) and `<out>_sim`. The master is broadcast; ties break on master
    * value ascending for determinism.
    *
    * @param probe     dataframe with the dirty column
    * @param probeCol  dirty column name (pre-normalized by caller)
    * @param master    single-column dataframe of canonical values
    * @param masterCol column in `master`
    */
  def bestMatch(probe: DataFrame, probeCol: String, master: DataFrame,
                masterCol: String, threshold: Double = 0.8,
                out: String = "matched"): DataFrame = {
    val m = master.select(col(masterCol).as("__master")).distinct()
    val sim = positionalSimilarity(col(probeCol), col("__master"))
    // partition the top-1 window on a unique per-row key, NOT the probe
    // columns — identical probe rows must each keep their own best match
    val w = Window.partitionBy(col("__row"))
      .orderBy(col("__sim").desc, col("__master").asc)
    probe.withColumn("__row", monotonically_increasing_id())
      .crossJoin(broadcast(m))
      .withColumn("__sim", sim)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn(out, when(col("__sim") >= threshold, col("__master")))
      .withColumn(out + "_sim", when(col("__sim") >= threshold, round(col("__sim"), 4)))
      .drop("__row", "__master", "__sim", "__rn")
  }

  /** Tiered cleaning à la R-8: hardcoded corrections map -> exact master
    * match -> fuzzy best-match >= threshold -> keep original, flagged.
    * Returns probe plus `<out>` (cleaned value) and `<out>_method` in
    * {corrected, exact, fuzzy, unmatched}.
    */
  def tieredClean(probe: DataFrame, probeCol: String, master: DataFrame,
                  masterCol: String, corrections: Map[String, String],
                  threshold: Double = 0.8, out: String = "clean"): DataFrame = {
    val corrected =
      if (corrections.isEmpty) col(probeCol)
      else {
        val pairs = corrections.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq
        coalesce(element_at(map(pairs: _*), col(probeCol)), col(probeCol))
      }
    val withCorr = probe.withColumn("__corr", corrected)
    val exact = withCorr.join(
      broadcast(master.select(col(masterCol).as("__exact")).distinct()),
      col("__corr") === col("__exact"), "left")
    val needFuzzy = exact.filter(col("__exact").isNull).drop("__exact")
    val matched = exact.filter(col("__exact").isNotNull)
      .withColumn(out, col("__exact"))
      .withColumn(out + "_method",
        when(col("__corr") =!= col(probeCol), "corrected").otherwise(lit("exact")))
      .drop("__exact")
    val fuzzy = bestMatch(needFuzzy, "__corr", master, masterCol, threshold, "__fz")
      .withColumn(out, coalesce(col("__fz"), col("__corr")))
      .withColumn(out + "_method", when(col("__fz").isNotNull, "fuzzy").otherwise("unmatched"))
      .drop("__fz", "__fz_sim")
    matched.unionByName(fuzzy).drop("__corr")
  }
}
