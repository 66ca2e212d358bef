package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval rows
  * with start <= ts < end, composed from built-ins.
  *
  * A naive theta join is a cross product with a filter — O(points x
  * intervals). The bucketized form bins time into `bucketSeconds` cells:
  * each point lands in exactly one cell, each interval is exploded to the
  * cells it covers, and the join becomes an equi-join on the cell id (plus
  * any extra key) with a residual predicate. Cost is O(points + intervals x
  * span/bucket + true matches) — pick `bucketSeconds` near the median
  * interval length so intervals explode to a handful of cells.
  */
object RangeJoin {

  /** @param points     frame with a timestamp column `tsCol`
    * @param intervals  frame with [`startCol`, `endCol`) timestamp bounds
    * @param keys       extra equi-join keys present on both sides (empty for
    *                   pure time containment)
    * @return           inner join of points x containing intervals
    */
  def bucketed(points: DataFrame, tsCol: String,
               intervals: DataFrame, startCol: String, endCol: String,
               bucketSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    val p = points.withColumn("__cell",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    // end is exclusive: the last covered cell is the one containing end-1s
    val i = intervals.withColumn("__cell",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor((unix_timestamp(col(endCol)) - 1) / bucketSeconds))))
    p.join(i, Seq("__cell") ++ keys)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__cell")
  }
}
