package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact rank / running totals over a totally-ordered frame —
  * the scale path for the "q252 convention" analytics families (RFM
  * quintiles, ABC/Lorenz cumulative shares, uplift deciles, order
  * statistics at exact ranks). The reference computes such ranks in
  * Postgres window functions over warehouse-sized tables
  * (init_db/init_schema.sql:445-534 views ORDER BY aggregates); a naive
  * Spark translation — `row_number().over(Window.orderBy(...))` — plans
  * an Exchange to ONE partition and sorts the whole frame on a single
  * task. Fine when the frame is a bounded grid; a serialization wall when
  * it is an entity dimension (10⁹ customers/parts at the 100 TB target).
  *
  * Algorithm (classic distributed sort + partition-offset pass):
  *  1. `repartitionByRange(order)` — one shuffle; partition i holds a
  *     contiguous slice of the total order (sampling picks boundaries;
  *     whatever they land on, ranks below are boundary-independent).
  *     The partition id is frozen as a column and the frame is
  *     checkpointed so the ledger pass and the rank pass share ONE
  *     materialization (the q339/q347 double-computation lesson:
  *     column pruning makes the two consumers non-identical subtrees,
  *     so exchange reuse can never be relied on here).
  *  2. A per-partition ledger — row count and per-totals sums, ONE ROW
  *     PER SHUFFLE PARTITION — is aggregated (map-side: each physical
  *     partition holds exactly one pid, so the partial aggregate is a
  *     single row per task) and prefix-summed. The ledger's own windows
  *     are unpartitioned but run on ≤ `spark.sql.shuffle.partitions`
  *     rows — bounded metadata, the IVF-centroid convention, never data.
  *  3. The ledger broadcasts back; each row's global rank = its
  *     row_number within its partition (pid-keyed window — the second
  *     and last bounded shuffle) + the ledger offset of every earlier
  *     partition. Running sums identically: partition-local cumulative
  *     sum + the ledger's sum-prefix.
  *
  * Exactness: equal full sort keys colocate (range partitioning is a
  * function of the key), so with a unique tiebreaker in `order` — every
  * caller's convention — the assignment is the total order, identical to
  * the single-partition window bit for bit (DimRankSpec parity). With a
  * non-unique key (q284's pooled scores) rank among ties is
  * partition-local-arbitrary, exactly as arbitrary as the naive window,
  * and any rank-k key VALUE is still exact because ties never straddle a
  * partition boundary.
  *
  * Shape at 10⁹ rows: two bounded shuffles (range + pid-hash), one sort
  * (inside the pid window), no single-partition stage touching data —
  * every stage's partition size is a range slice. Skew: the range
  * partitioner equidepth-samples the full key including the tiebreaker,
  * so no value can pin one task.
  *
  * `totals` sources must be integral (LongType) columns — the sums ride
  * plain BIGINT here; callers needing the DECIMAL ladder widen before
  * calling (the q300 convention). NULL source values count as 0 (the
  * source is coalesced inside the local cumsum, mirroring sum's
  * ignore-nulls semantics): the result equals the naive window wherever
  * the global prefix holds at least one non-null value; on an all-NULL
  * prefix the naive window returns NULL where this returns 0 — the one
  * narrowing of the bit-parity claim (no current caller passes nullable
  * sources; DimRankSpec pins the non-null contract).
  */
object DimRank {

  /** An inclusive running sum to carry through the rank pass: `cum` =
    * sum of `src` over all rows at or before this one in `order`. */
  final case class RunTotal(src: String, cum: String)

  private val PID = "__dr_pid"
  private val CNT = "__dr_cnt"
  private val OFF = "__dr_off"

  /** Append a global `rankCol` (LongType row_number over `order`) and any
    * requested running/grand totals to `df`, without ever funnelling the
    * frame through one partition.
    *
    * @param order     total order (include a unique tiebreaker for a
    *                  deterministic rank); asc/desc/nulls-first honored
    * @param rankCol   output name of the 1-based global row number
    * @param totals    inclusive running sums to compute alongside the rank
    * @param countCol  if set, attach the grand row count (the frame-wide
    *                  `n` every quintile/decile formula needs) — read off
    *                  the ledger, no second pass over the data
    * @param sumTotals (src, out) grand sums attached the same way
    */
  def ranked(df: DataFrame, order: Seq[Column], rankCol: String,
             totals: Seq[RunTotal] = Nil,
             countCol: Option[String] = None,
             sumTotals: Seq[(String, String)] = Nil): DataFrame = {
    require(order.nonEmpty, "DimRank.ranked: at least one sort expression")
    val srcCols = (totals.map(_.src) ++ sumTotals.map(_._1)).distinct

    val parted = df
      .repartitionByRange(order: _*)
      .withColumn(PID, spark_partition_id().cast("long"))
      .transform(Checkpoints.ckpt)

    // one row per shuffle partition: count + the totals' partial sums
    val measures = count(lit(1)).cast("long").as(CNT) +:
      srcCols.map(c => sum(col(c)).cast("long").as(s"__dr_s_$c"))
    val perPart = parted.groupBy(col(PID))
      .agg(measures.head, measures.tail: _*)

    // exclusive prefix offsets over the bounded ledger (≤ shuffle
    // partitions rows — metadata, not data)
    val wPrev = Window.orderBy(col(PID).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val ledger0 = perPart
      .withColumn(OFF, coalesce(sum(col(CNT)).over(wPrev), lit(0L)))
    val ledger1 = totals.foldLeft(ledger0) { (l, t) =>
      l.withColumn(s"__dr_o_${t.cum}",
        coalesce(sum(col(s"__dr_s_${t.src}")).over(wPrev), lit(0L)))
    }
    val ledger2 = countCol.foldLeft(ledger1) { (l, c) =>
      l.withColumn(c, sum(col(CNT)).over(wAll).cast("long"))
    }
    val ledger = sumTotals.foldLeft(ledger2) { case (l, (src, out)) =>
      l.withColumn(out, sum(col(s"__dr_s_$src")).over(wAll).cast("long"))
    }
    val keep = (Seq(PID, OFF) ++ totals.map(t => s"__dr_o_${t.cum}") ++
      countCol.toSeq ++ sumTotals.map(_._2)).map(col)

    // partition-local rank/cumsums + the broadcast offsets
    val wLocal = Window.partitionBy(col(PID)).orderBy(order: _*)
    val wLocalCum = wLocal
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rankedLocal = parted
      .join(broadcast(ledger.select(keep: _*)), Seq(PID))
      .withColumn(rankCol,
        row_number().over(wLocal).cast("long") + col(OFF))
    val withTotals = totals.foldLeft(rankedLocal) { (d, t) =>
      d.withColumn(t.cum,
        sum(coalesce(col(t.src), lit(0L))).over(wLocalCum).cast("long") +
          col(s"__dr_o_${t.cum}"))
    }
    withTotals.drop((Seq(PID, OFF) ++
      totals.map(t => s"__dr_o_${t.cum}")): _*)
  }

  /** WITHIN-GROUP distributed rank: a global `row_number` per group of
    * `groupCols` over `order`, plus optionally the per-group row count —
    * the scale path for "partition by a LOW-cardinality key, rank a
    * corpus-sized frame" windows (q248's per-source ranks), where the
    * naive window serializes each group onto one task.
    *
    * Same machinery as [[ranked]], range-partitioned on (groupCols ++
    * order): within a partition groups are contiguous, and a group's
    * rows span contiguous partitions, so the ledger needs one row per
    * (partition, group-in-partition) — bounded by partitions + groups —
    * and a group's offset is the prefix of ITS rows over earlier
    * partitions (a group-keyed window over the bounded ledger). Rank =
    * (pid, group)-local row_number + that offset: bit-identical to
    * `Window.partitionBy(groupCols).orderBy(order)` row_number under a
    * unique tiebreaker (DimRankSpec parity). No task ever holds more
    * than a range slice, whatever the group cardinality or skew (a
    * dominant group spreads over many partitions; the equidepth sampler
    * sees the full (group, order) key). */
  def rankedWithin(df: DataFrame, groupCols: Seq[String],
                   order: Seq[Column], rankCol: String,
                   countCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty && order.nonEmpty,
      "DimRank.rankedWithin: group and sort expressions required")
    val gcols = groupCols.map(col)
    val parted = df
      .repartitionByRange((gcols.map(_.asc) ++ order): _*)
      .withColumn(PID, spark_partition_id().cast("long"))
      .transform(Checkpoints.ckpt)
    val perPart = parted.groupBy((col(PID) +: gcols): _*)
      .agg(count(lit(1)).cast("long").as(CNT))
    val wPrev = Window.partitionBy(gcols: _*).orderBy(col(PID).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ledger0 = perPart
      .withColumn(OFF, coalesce(sum(col(CNT)).over(wPrev), lit(0L)))
    val ledger = countCol.foldLeft(ledger0) { (l, c) =>
      l.withColumn(c, sum(col(CNT)).over(
        Window.partitionBy(gcols: _*)).cast("long"))
    }
    val keep = (Seq(col(PID)) ++ gcols ++ Seq(col(OFF)) ++
      countCol.map(col).toSeq)
    val wLocal = Window.partitionBy((col(PID) +: gcols): _*)
      .orderBy(order: _*)
    parted
      .join(broadcast(ledger.select(keep: _*)), PID +: groupCols)
      .withColumn(rankCol,
        row_number().over(wLocal).cast("long") + col(OFF))
      .drop(PID, OFF)
  }
}
