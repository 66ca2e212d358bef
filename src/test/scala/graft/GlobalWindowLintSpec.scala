package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide single-partition-window lint (r13, VERDICT item 5): every
  * unpartitioned WindowExec in EVERY registered query's physical plan must
  * be provably bounded, or the build fails. This is the machine check that
  * would have caught q280/q175 in r12 (kernel prescribed in prose, naive
  * window in the plan) — any NEW query with an unclassified global window
  * now fails here before the driver or a 100 TB run ever sees it.
  *
  * A global window is legal only when one of these holds:
  *  1. its sort order references only `__dr_pid` — a [[graft.operators
  *     .DimRank]] LEDGER window: one row per shuffle partition (and per
  *     group for rankedWithin), metadata, never data;
  *  2. a GlobalLimitExec / TakeOrderedAndProjectExec sits BELOW it — the
  *     frame was already cut to a driver-bounded top-k before the window;
  *  3. the (query, order-columns) pair is in [[boundedGrids]] — a named,
  *     REVIEWED bounded frame (deciles, day/hour grids, support
  *     histograms, per-source lists, ladder rungs, ...). Each entry
  *     documents WHY the frame is bounded; adding a query here is a
  *     review act, not a default.
  */
class GlobalWindowLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** (query name -> order-column names its global windows may reference),
    * each with the boundedness argument. Grouped by frame class. */
  private val boundedGrids: Map[String, Set[String]] = Map(
    // histogram-bin grids: <= value-range/binWidth rows by construction
    // (the q82 sketch's bounded mergeable state)
    "q82_hist_quantiles" -> Set("bin"),
    "q209_hist_table" -> Set("bin"),
    "q386_ppl_buckets_sketch" -> Set("bin"),
    // #sources frames: the largest-remainder allocation runs on one row
    // per SOURCE (a governance list, not data)
    "q87_mixture_sample" -> Set("__rem", "__src"),
    "q163_temperature_mix" -> Set("__rem", "__src"),
    // per-source aggregate frame (Gini over source token totals)
    "q242_gini_sources" -> Set("toks", "source"),
    // calendar grids: hour/day spines bounded by the corpus time span
    "q247_rolling_corr" -> Set("hour"),
    "q310_changepoint" -> Set("day"),
    "q314_seasonal_decompose" -> Set("day_num"),
    "q326_sprt" -> Set("day_num"),
    "q332_seasonal_strength" -> Set("day_num"),
    // day-grid residual/deviation rank windows (frame = the day spine)
    "q357_seasonal_mad" -> Set("resid_milli", "adev", "day_num"),
    // duration grid: whole hours first-event->conversion, <= span hours
    // (the scaladoc's <= 720-row at-risk table)
    "q262_kaplan_meier" -> Set("dur_h"),
    // value-SUPPORT grids: one row per distinct value of a bounded-range
    // measurement (n_chars <= max doc length), never per row
    "q248_quantile_norm" -> Set("v"),
    "q298_mann_whitney" -> Set("n_chars"),
    // decile grids (<= 10 rows, built by the DimRank families)
    "q300_lorenz_deciles" -> Set("decile"),
    "q330_vocab_growth" -> Set("decile"),
    "q343_uplift_deciles" -> Set("decile"),
  )

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
        Seq(r.child)
      case other => other.children
    }
    (p +: through.flatMap(collectAll)) ++ p.subqueries.flatMap(collectAll)
  }

  private def boundedByLimit(w: SparkPlan): Boolean =
    collectAll(w).drop(1).exists {
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _ => false
    }

  for ((name, fn) <- Queries.all.toSeq.sortBy(_._1)) {
    test(s"$name: every global window is bounded") {
      val allowed = boundedGrids.getOrElse(name, Set.empty) + "__dr_pid"
      val offenders = collectAll(fn(spark, dir).queryExecution.executedPlan)
        .collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        .filterNot { w =>
          val refs = w.orderSpec.flatMap(_.references.map(_.name)).toSet
          refs.subsetOf(allowed) || boundedByLimit(w)
        }
      assert(offenders.isEmpty,
        s"$name: unclassified global window(s) over " +
          offenders.map(_.orderSpec.flatMap(_.references.map(_.name))
            .mkString("(", ",", ")")).mkString(", ") +
          " — either rewire onto DimRank or add a REVIEWED boundedGrids " +
          "entry with the boundedness argument\n" +
          offenders.headOption.fold("")(_.toString))
    }
  }
}
