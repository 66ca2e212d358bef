package graft.tools

/** Driver-side cost split for one registered query:
  * runMain graft.tools.PlanTime <sfDir> <name> [reps]
  *
  * Per rep, times three phases separately: (1) DataFrame construction
  * (fn call — builds the logical plan, runs any eager session-cache
  * work), (2) analysis+optimization+physical planning (forcing
  * queryExecution.executedPlan), (3) execution (count). A query whose
  * phase-2 dominates is paying single-threaded Catalyst work that no
  * cluster parallelism can hide — the fix is a smaller expression tree /
  * fewer plan nodes, not operator tuning.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Engine.localSession(cpus, "graft-plantime")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      graft.operators.Checkpoints.releaseQueryScoped(spark)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution
      qe.executedPlan // forces analysis + optimization + physical planning
      val t2 = System.nanoTime()
      val n = df.count()
      val t3 = System.nanoTime()
      println(f"[plantime] $name rep$i: build=${(t1 - t0) / 1e9}%.3f s " +
        f"plan=${(t2 - t1) / 1e9}%.3f s exec=${(t3 - t2) / 1e9}%.3f s " +
        f"total=${(t3 - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
