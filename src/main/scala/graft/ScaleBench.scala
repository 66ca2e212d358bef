package graft

/** Interleaved scaling-exponent harness (VERDICT r9 item 1): measures each
  * query at TWO scale directories in ONE JVM, alternating scales rep by
  * rep, and reports per-family scaling exponents.
  *
  * Why not two `graft.Bench` runs? An exponent is a RATIO of timings taken
  * at different scales; on a shared box the regime drifts several-x within
  * minutes (r9 "watch items"; this round measured untouched queries at
  * 2.7-8x between adjacent runs, with the bench's gc_ms/storage_mb columns
  * flat — host, not JVM). Two separate runs put the whole drift into the
  * ratio. Interleaving (warmA, warmB, then A,B,A,B,...) takes the two
  * scales' reps seconds apart under the same JIT/regime state, so drift
  * largely cancels; the residual shows as rep spread, which is printed.
  *
  * Usage:
  *   SPARK_GRAFT_BENCH_ONLY=q1,... runMain graft.ScaleBench \
  *     <scaleA>:<dirA> <scaleB>:<dirB>
  * e.g. 0.1:/root/testdata/sf0.1 1:target/scaledata/sf1
  *
  * exponent = log(tB/tA) / log(scaleB/scaleA) over timed medians, and
  * separately over warm times (for session-cached families the corpus-
  * scale BUILD lives in the warm rep — Bench.scala protocol). Writes
  * SCALEBENCH.json in the working directory (committed evidence) and the
  * one-line summary to stdout.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "args: <scaleA>:<dirA> <scaleB>:<dirB>")
    val Array((sfA, dirA), (sfB, dirB)) = args.map { a =>
      val i = a.indexOf(':')
      require(i > 0, s"malformed arg '$a' — expected <scale>:<dir>")
      (a.take(i).toDouble, a.drop(i + 1))
    }
    // equal scales would make every exponent log(x)/log(1) = infinite and
    // blow up AFTER the expensive measurement — reject before any work
    require(sfA != sfB && sfA > 0 && sfB > 0,
      s"scales must be positive and distinct (got $sfA and $sfB)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(sys.error("SPARK_GRAFT_BENCH_ONLY is required"))
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
    val spark = Engine.localSession(cpus, "graft-scalebench")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    def release(): Unit = {
      graft.operators.Checkpoints.releaseQueryScoped(spark); System.gc()
    }
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                 dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] $name @ $dir FAILED: " +
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")
            .linesIterator.nextOption().getOrElse("")}")
        -1.0 }
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    val decade = math.log10(sfB / sfA)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only(n) }
      .map { case (name, fn) =>
        // warm both scales first (session caches, codegen), then
        // alternate timed reps A,B,A,B so regime drift hits both evenly
        val warmA = timeOnce(fn, dirA, name); release()
        val warmB = timeOnce(fn, dirB, name); release()
        val timed = (1 to reps).map { _ =>
          val a = timeOnce(fn, dirA, name); release()
          val b = timeOnce(fn, dirB, name); release()
          (a, b)
        }
        val (tsA, tsB) = (timed.map(_._1), timed.map(_._2))
        val ok = warmA > 0 && warmB > 0 && tsA.forall(_ > 0) && tsB.forall(_ > 0)
        val (mA, mB) = (median(tsA), median(tsB))
        val expTimed = if (ok) math.log10(mB / mA) / decade else Double.NaN
        val expWarm = if (ok) math.log10(warmB / warmA) / decade else Double.NaN
        System.err.println(f"[scalebench] $name%-28s A=${r3(mA)}%8s B=${r3(mB)}%8s " +
          f"expTimed=$expTimed%6.2f expWarm=$expWarm%6.2f " +
          s"repsA=${tsA.map(r3).mkString("[", ",", "]")} repsB=${tsB.map(r3).mkString("[", ",", "]")}")
        (name, warmA, warmB, tsA, tsB, mA, mB, expTimed, expWarm, ok)
      }
    def jnum(d: Double): String = if (d.isNaN) "null" else r3(d)
    val detail = rows.map { case (n, wA, wB, tsA, tsB, mA, mB, eT, eW, ok) =>
      s""""$n":{"warm_a":${r3(wA)},"warm_b":${r3(wB)},""" +
        s""""reps_a":${tsA.map(r3).mkString("[", ",", "]")},""" +
        s""""reps_b":${tsB.map(r3).mkString("[", ",", "]")},""" +
        s""""median_a":${r3(mA)},"median_b":${r3(mB)},""" +
        s""""exp_timed":${jnum(eT)},"exp_warm":${jnum(eW)},"ok":$ok}"""
    }.mkString("{", ",", "}")
    val line = s"""{"scalebench":$detail,"sf_a":$sfA,"sf_b":$sfB,""" +
      s""""dir_a":"$dirA","dir_b":"$dirB","cpus":$cpus,"reps":$reps,""" +
      s""""protocol":"interleaved warmA,warmB then A,B per rep; exponent=log(tB/tA)/log(sfB/sfA)"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALEBENCH.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[scalebench] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
