package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives: salted aggregation and salted joins.
  *
  * At 100 TB a handful of hot keys (one viral document, one default user
  * id) can pin an entire stage on one task. AQE's skew-join handling covers
  * sort-merge joins at runtime; these operators cover the remaining cases —
  * skewed aggregations and broadcast-incompatible hot-key joins — with the
  * classic two-phase salt: spread the hot key over N subkeys, partial-
  * process, then combine.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style measures per key where a
    * few keys dominate. Phase 1 groups on (key, salt in [0, salts)), phase 2
    * combines the partials — both phases are ordinary hash aggregations
    * with map-side combine, so the hot key's rows land on `salts` tasks
    * instead of one.
    *
    * @param aggs  (partialAgg, combine) pairs keyed by output name:
    *              partial runs per (key, salt); combine merges partials.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
                aggs: Map[String, (Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as("__" + aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as("__" + n) }.toSeq: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._2._2(col("__" + aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, (_, c)) => c(col("__" + n)).as(n) }.toSeq: _*)
  }

  /** Convenience: salted count + sum per key. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keyCols, salts, scala.collection.immutable.ListMap(
      "n" -> (count(lit(1)), (c: Column) => sum(c)),
      "total" -> (sum(col(valueCol)), (c: Column) => sum(c))))

  /** Salted equi-join for a skewed LEFT side against a modest RIGHT side
    * that cannot be broadcast: left rows get a random salt in [0, salts),
    * right rows are replicated `salts` times, and the join key becomes
    * (key, salt) — the hot key's probe rows spread over `salts` tasks.
    * Right-side replication multiplies its shuffle volume by `salts`:
    * appropriate when right is orders of magnitude smaller than left but
    * past the broadcast threshold.
    *
    * Only inner/left/left_semi/left_anti joins are sound under this
    * construction: a right or full outer join would emit every unmatched
    * right row once per salt replica.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val allowed =
      Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")
    require(allowed(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched right rows " +
        "(right side is replicated per salt); use inner/left/left_semi/left_anti")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Skew DIAGNOSTICS: the measurement that decides whether the two
    * operators above are needed at all. Per key: row count, corpus share
    * in ppm, a hot flag (count > 2x the mean per-key count — compared
    * cross-multiplied in exact BIGINTs, no division), and the salt
    * factor a salted plan would need to land the key under
    * `targetRowsPerTask` rows per task (ceiling division in integers).
    * One keyed aggregation plus a broadcast 1-row stats frame — the
    * report costs one shuffle of the keyed counts, never a second corpus
    * pass. Run it on a sample or yesterday's partition at 100 TB; the
    * hot-key set is stable far longer than the row counts. */
  def advisor(df: DataFrame, keyCols: Seq[String],
              targetRowsPerTask: Long = 1000000L): DataFrame = {
    require(targetRowsPerTask > 0, "advisor: targetRowsPerTask must be > 0")
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum(col("n_rows")).cast("long").as("__total"),
      count(lit(1)).as("__keys"))
    counts.crossJoin(broadcast(stats))
      .select(keyCols.map(col) ++ Seq(
        col("n_rows"),
        expr("n_rows * 1000000 DIV __total").as("share_ppm"),
        // the cross-product runs in DECIMAL(38,0): at the 100 TB scale
        // this advisor targets (1e12 rows x 1e9 keys) a BIGINT product
        // wraps silently under non-ANSI Spark and flips is_hot
        (col("n_rows").cast("decimal(19,0)") *
          col("__keys").cast("decimal(19,0)") >
          lit(2L).cast("decimal(19,0)") *
          col("__total").cast("decimal(19,0)")).as("is_hot"),
        expr(s"(n_rows + ${targetRowsPerTask - 1}L) DIV ${targetRowsPerTask}L")
          .as("salt_factor")): _*)
      .orderBy(col("n_rows").desc, struct(keyCols.map(col): _*))
  }
}
