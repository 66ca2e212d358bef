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
}
