package graft

import graft.operators.DimRank
import graft.operators.DimRank.RunTotal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed rank/cumsum kernel must be bit-identical to the naive
  * single-partition window on any totally-ordered frame, while its plan
  * keeps every data-touching window partitioned (the single-partition
  * ledger windows run on the per-partition metadata frame only). */
class DimRankSpec extends SparkSpec {
  import spark.implicits._

  /** A frame wide enough to actually span several range partitions. */
  private def frame(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id"),
        pmod(xxhash64(col("id")), lit(997L)).as("v"),
        (pmod(xxhash64(col("id"), lit(7)), lit(50L)) + 1L).as("x"))
      .repartition(8) // arbitrary incoming layout

  private def naive(df: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v").desc, col("id").asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
  }

  test("rank + running sum parity with the single-partition window") {
    val df = frame(5000)
    val got = DimRank.ranked(df, Seq(col("v").desc, col("id").asc), "rk",
        totals = Seq(RunTotal("x", "cum")))
      .select("id", "rk", "cum")
    val want = naive(df).select("id", "rk", "cum")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and the kernel genuinely spreads the frame over >1 partition once
    // AQE stops right-sizing the tiny test shuffle down to one (at real
    // scale coalescing keeps range-contiguity, so ranks are unaffected —
    // the parity assertions above ran WITH coalescing on)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val spread = DimRank.ranked(df, Seq(col("v").desc, col("id").asc), "rk")
        .withColumn("p", spark_partition_id())
        .select("p").distinct().count()
      assert(spread > 1, s"kernel collapsed to $spread partition(s)")
      val again = DimRank.ranked(df, Seq(col("v").desc, col("id").asc), "rk",
          totals = Seq(RunTotal("x", "cum")))
        .select("id", "rk", "cum")
      assert(again.exceptAll(want).isEmpty && want.exceptAll(again).isEmpty)
    } finally spark.conf.set(key, prev)
  }

  test("countCol and sumTotals match separate aggregates") {
    val df = frame(3000)
    val out = DimRank.ranked(df, Seq(col("v").asc, col("id").asc), "rk",
      countCol = Some("n_all"), sumTotals = Seq("x" -> "total_x"))
    val distinctNs = out.select("n_all", "total_x").distinct().collect()
    assert(distinctNs.length == 1)
    assert(distinctNs.head.getLong(0) == 3000L)
    val wantTotal = df.agg(sum(col("x"))).as[Long].head()
    assert(distinctNs.head.getLong(1) == wantTotal)
  }

  test("ties on a non-unique key: rank-k values exact, ranks a permutation") {
    // key with heavy ties and no tiebreaker (the q284 shape)
    val df = spark.range(2000).select(col("id"),
      pmod(col("id"), lit(7L)).as("v"))
    val out = DimRank.ranked(df, Seq(col("v").asc), "rk")
      .select(col("rk"), col("v")).collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq == (1L to 2000L))
    // the value at every rank equals the sorted sequence of keys
    val wantVals = df.select("v").as[Long].collect().sorted.toSeq
    assert(out.map(_.getLong(1)).toSeq == wantVals)
  }

  test("rankedWithin parity with the group-partitioned window") {
    val df = frame(4000).withColumn("g", pmod(col("id"), lit(3L)))
    val got = DimRank.rankedWithin(df, Seq("g"),
        Seq(col("v").asc, col("id").asc), "rk", countCol = Some("n_g"))
      .select("id", "rk", "n_g")
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
    val want = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_g", count(lit(1)).over(
        Window.partitionBy(col("g"))).cast("long"))
      .select("id", "rk", "n_g")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // and with coalescing off, a single group still spreads over
    // multiple partitions (the point: no group serializes onto one task)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val one = df.filter(col("g") === 0)
      val spread = DimRank.rankedWithin(one, Seq("g"),
          Seq(col("v").asc, col("id").asc), "rk")
        .withColumn("p", spark_partition_id())
        .select("p").distinct().count()
      assert(spread > 1, s"group collapsed to $spread partition(s)")
    } finally spark.conf.set(key, prev)
  }

  test("nullable totals source: NULLs count as 0, non-null prefixes exact") {
    // the ADVICE r12 latent case: rows whose partition-local prefix is
    // all NULL must still read the earlier partitions' sum, and a NULL
    // source contributes 0 (sum-ignores-nulls), never poisons the cumsum
    val df = frame(3000).withColumn("xn",
      when(pmod(col("id"), lit(5L)) === 0, col("x"))) // 80% NULL
    val got = DimRank.ranked(df, Seq(col("v").desc, col("id").asc), "rk",
        totals = Seq(RunTotal("xn", "cum")))
      .select("id", "rk", "cum")
    val w = Window.orderBy(col("v").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = naive(df)
      .withColumn("cum", coalesce(sum(col("xn")).over(w), lit(0L)).cast("long"))
      .select("id", "rk", "cum")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("empty frame yields an empty ranked frame with the right schema") {
    val df = frame(100).filter(col("id") < 0)
    val out = DimRank.ranked(df, Seq(col("v").asc, col("id").asc), "rk",
      totals = Seq(RunTotal("x", "cum")), countCol = Some("n"))
    assert(out.count() == 0)
    assert(Seq("rk", "cum", "n").forall(out.columns.contains))
  }

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

  test("plan: the data-path window is pid-partitioned, never global") {
    val df = frame(5000)
    val out = DimRank.ranked(df, Seq(col("v").desc, col("id").asc), "rk",
      totals = Seq(RunTotal("x", "cum")))
    out.collect() // realize the adaptive plan
    val windows = collectAll(out.queryExecution.executedPlan).collect {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty)
    // every unpartitioned window in the kernel's plan is a ledger window:
    // its sort order references only the frozen partition-id column
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val orderRefs = w.orderSpec.flatMap(_.references.map(_.name)).toSet
      assert(orderRefs.subsetOf(Set("__dr_pid")),
        s"unpartitioned window over data columns: $orderRefs\n$w")
    }
    // and the rank window (the one ordering by the data columns) carries
    // a partition spec
    val dataWindows = windows.filter(
      _.orderSpec.exists(_.references.exists(_.name == "v")))
    assert(dataWindows.nonEmpty && dataWindows.forall(_.partitionSpec.nonEmpty))
  }
}
