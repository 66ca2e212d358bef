package graft.tools

/** Time one registered query: runMain graft.tools.TimeQ <sfDir> <name> [reps] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.Engine.localSession(cpus, "graft-timeq")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
