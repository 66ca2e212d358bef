package graft
object Bench {
  /** Per-query median of `SPARK_GRAFT_BENCH_REPS` (default 3) runs: single
    * measurements on a shared host are ±30%+ noise (docs/NOTES.md), so the
    * headline numbers are medians.
    *
    * The stdout JSON line must stay SHORT: the driver keeps only the last
    * ~2000 chars of stdout (and sbt appends a `[success]` line after us), so
    * a long line gets its head — including `"metric":"total"` — truncated
    * away, which is exactly what happened to BENCH_r03/r04. Hence: per-query
    * keys are the unique `qNN` prefix (the driver-contract example itself
    * uses `"q1"`), medians are rounded to 3 decimals, and the full-name
    * per-rep raw timings are emitted on stderr instead of riding along.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = Engine.localSession(cpus, "graft-bench")
    // one light warm-up action so the first timed query does not absorb
    // classloading + codegen-compiler startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // sorted so per-query timings are attributed deterministically (shared
    // cached intermediates otherwise land on whichever query runs first)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0 }
      }
      (name, times)
    }
    // a failed query must be distinguishable from a fast one: any failed rep
    // marks the query failed, its reported timing is -1
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def short(name: String): String = name.takeWhile(_ != '_')
    val meds = results.map { case (name, ts) =>
      (name, if (ts.contains(-1.0)) -1.0 else median(ts))
    }
    // duplicate short keys would silently overwrite each other in the JSON
    // object — fail fast instead if a registry name ever reuses a qNN prefix
    require(meds.map(m => short(m._1)).distinct.size == meds.size,
      "duplicate qNN prefixes in SparkEntry.queries")
    val qs = meds.map { case (k, v) => "\"" + short(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = meds.collect { case (k, -1.0) => "\"" + short(k) + "\"" }
      .mkString("[", ",", "]")
    val total = meds.collect { case (_, v) if v >= 0 => v }.sum
    // full-name raw reps → stderr (kept out of the driver's stdout tail)
    val raw = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    System.err.println(s"""{"bench_detail":$raw,"sf":"$sfDir","cpus":$cpus}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"runs":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
