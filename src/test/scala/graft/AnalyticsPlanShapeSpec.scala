package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, BroadcastNestedLoopJoinExec}

/** Physical-plan shape pins for the round-8 analytics queries: the
  * SCALE.md table claims broadcast dimension joins and no real
  * cartesian products — this spec makes those claims machine-checked
  * instead of prose. A cross join is only legal when one side is a
  * bounded stat/grid frame (the broadcast-1-row convention); anything
  * else joining two unbounded sides without keys fails here before a
  * 100 TB run finds out the hard way. */
class AnalyticsPlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    // AdaptiveSparkPlanExec exposes NO children (its plan lives in a
    // private field), so a naive walk sees only the root — unwrap it;
    // same for reused/staged wrappers. Subqueries walked explicitly.
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

  /** Unbounded-by-unbounded products are the scale killer; broadcast
    * nested-loop against a sub-row-limit side (our stat frames and
    * literal grids) is fine. CartesianProductExec (both sides
    * unbroadcast) is never acceptable in these plans. */
  private def assertNoRealCartesian(df: DataFrame, name: String): Unit = {
    val bad = collectAll(plan(df)).collect {
      case c: CartesianProductExec => c
    }
    assert(bad.isEmpty,
      s"$name has an unbroadcast cartesian product:\n" +
        bad.headOption.fold("")(_.toString))
  }

  private def broadcastJoins(df: DataFrame): Int =
    collectAll(plan(df)).count {
      case _: BroadcastHashJoinExec => true
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    }

  test("q338: the customer dim reaches the fact join as a broadcast") {
    val df = Queries.q338Dispersion(spark, dir)
    assert(broadcastJoins(df) >= 1, df.queryExecution.executedPlan.toString)
    assertNoRealCartesian(df, "q338")
  }

  test("q343: response join broadcast; no real cartesian") {
    val df = Queries.q343UpliftDeciles(spark, dir)
    assert(broadcastJoins(df) >= 1)
    assertNoRealCartesian(df, "q343")
  }

  test("q346: the nation aggregate joins back as a broadcast") {
    val df = Queries.q346TargetEncoding(spark, dir)
    assert(broadcastJoins(df) >= 1)
    assertNoRealCartesian(df, "q346")
  }

  test("q359: dimension joins broadcast; no real cartesian") {
    val df = Queries.q359FeatureMatrix(spark, dir)
    assert(broadcastJoins(df) >= 1)
    assertNoRealCartesian(df, "q359")
  }

  test("q363: recs/popularity eval joins carry no real cartesian") {
    assertNoRealCartesian(Queries.q363RecHoldout(spark, dir), "q363")
  }

  test("q366/q367: pair chain and lift plans carry no real cartesian") {
    assertNoRealCartesian(Queries.q366DecayedCf(spark, dir), "q366")
    assertNoRealCartesian(Queries.q367TransitionLift(spark, dir), "q367")
  }

  /** The r12 DimRank contract: in the rewired rank families, every
    * unpartitioned WindowExec is either a kernel LEDGER window (orders
    * only by the frozen partition id — one row per shuffle partition)
    * or runs over a frame already reduced to a bounded grid (named
    * grid columns / below a global limit). No dimension-sized frame
    * may reach an Exchange-to-one-partition + Window pair. */
  private def assertNoGlobalDimWindow(df: DataFrame, name: String,
                                      gridCols: Set[String] = Set.empty): Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    val all = collectAll(plan(df))
    all.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        val refs = w.orderSpec.flatMap(_.references.map(_.name)).toSet
        val boundedByLimit = collectAll(w).exists {
          case _: org.apache.spark.sql.execution.GlobalLimitExec => true
          case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
          case _ => false
        }
        assert(refs.subsetOf(Set("__dr_pid") ++ gridCols) || boundedByLimit,
          s"$name: unpartitioned window over data columns $refs\n$w")
      }
  }

  test("DimRank families: no single-partition window over a dimension") {
    assertNoGlobalDimWindow(Queries.q252Rfm(spark, dir), "q252")
    assertNoGlobalDimWindow(Queries.q261AbcClassification(spark, dir), "q261")
    assertNoGlobalDimWindow(Queries.q284Conformal(spark, dir), "q284")
    assertNoGlobalDimWindow(Queries.q300LorenzDeciles(spark, dir), "q300",
      gridCols = Set("decile"))
    assertNoGlobalDimWindow(Queries.q343UpliftDeciles(spark, dir), "q343",
      gridCols = Set("decile"))
    assertNoGlobalDimWindow(Queries.q347AbcXyz(spark, dir), "q347")
    assertNoGlobalDimWindow(Queries.q359FeatureMatrix(spark, dir), "q359")
    assertNoGlobalDimWindow(Queries.q340RecCoverage(spark, dir), "q340")
    assertNoGlobalDimWindow(Queries.q361BounceRate(spark, dir), "q361")
    assertNoGlobalDimWindow(Queries.q292DecayedPopularity(spark, dir), "q292")
    assertNoGlobalDimWindow(Queries.q336ZipfFit(spark, dir), "q336")
    // r13 rollout: the session-boundary cumsum, the Heaps doc-offset +
    // vocab-rank windows, the length-batch numbering and the curriculum
    // ntile all ride the kernel now — no global data window anywhere
    assertNoGlobalDimWindow(Queries.q280PeakConcurrency(spark, dir), "q280")
    assertNoGlobalDimWindow(Queries.q175HeapsFit(spark, dir), "q175")
    assertNoGlobalDimWindow(Queries.q102LengthBatches(spark, dir), "q102")
    assertNoGlobalDimWindow(Queries.q138Curriculum(spark, dir), "q138")
  }

  test("q341/q342/q347/q355: corpus aggs carry no real cartesian") {
    assertNoRealCartesian(Queries.q341RetentionTriangle(spark, dir), "q341")
    assertNoRealCartesian(Queries.q342Cuped(spark, dir), "q342")
    assertNoRealCartesian(Queries.q347AbcXyz(spark, dir), "q347")
    assertNoRealCartesian(Queries.q355EssBalance(spark, dir), "q355")
  }
}
