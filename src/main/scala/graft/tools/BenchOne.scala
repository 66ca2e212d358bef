package graft.tools

/** Single-query timing harness: `sbt "runMain graft.tools.BenchOne
  * <query> [sfDir] [cpus] [reps]"` — the quick feedback loop for
  * optimizing ONE query without paying the full Bench sweep. Protocol
  * matches Bench: one untimed warm rep, then timed reps. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query> [sfDir] [cpus] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 3
    val spark = graft.Engine.localSession(cpus, "graft-bench-one")
    val q = graft.SparkEntry.queries(name)
    q(spark, sfDir).count() // warm: session/codegen/family builds
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[bench-one] $name " +
      times.map(t => f"$t%.3f").mkString("reps=[", ",", "]"))
    spark.stop()
  }
}
