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
  * WORK metrics (VERDICT r10 item 2): wall exponents hide work behind
  * local[32] slack — q286 measured wall exp 0.98 for n²/10 WORK (x100
  * work absorbed into x10 time by idle cores; on a saturated cluster the
  * work exponent is what bills). So each rep also records, via a
  * SparkListener over task-end events, the rep's shuffle read/write bytes
  * and executor CPU time; the JSON carries {shuffle_rw_mb, cpu_s} arrays
  * per scale and exp_cpu / exp_shuffle next to exp_timed. The listener
  * bus is drained (shim.waitListenerBusEmpty) around every snapshot so a
  * rep's task events are counted against THAT rep. Shuffle deltas are
  * deterministic per plan; CPU deltas carry JIT/GC noise like wall time —
  * medians over reps, same as wall.
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

  /** Cumulative task-level work counters; deltas around an action are that
    * action's work. AtomicLongs because task-end events arrive on the
    * listener bus thread while the driver thread reads snapshots. */
  private final class WorkCounters extends org.apache.spark.scheduler.SparkListener {
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        cpuNs.addAndGet(m.executorCpuTime)
        ()
      }
    }
    def snapshot: (Long, Long, Long) =
      (shuffleRead.get(), shuffleWrite.get(), cpuNs.get())
  }

  /** One rep's measurement: wall seconds, shuffle read+write MB, CPU s. */
  private final case class Rep(wall: Double, shuffleMb: Double, cpuS: Double)

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
    var spark = Engine.localSession(cpus, "graft-scalebench")
    var work = new WorkCounters
    spark.sparkContext.addSparkListener(work)
    // one family's executor OOM kills the shared SparkContext; without a
    // rebuild every later family in the sweep false-fails on "stopped
    // SparkContext" (this run's q239-at-sf1 lesson). Rebuild between
    // families so a fatal family poisons only itself.
    def ensureLive(): Unit =
      if (spark.sparkContext.isStopped) {
        System.err.println("[scalebench] SparkContext died — rebuilding session")
        spark = Engine.localSession(cpus, "graft-scalebench")
        work = new WorkCounters
        spark.sparkContext.addSparkListener(work)
      }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // release/drain touch the live context (unpersist RPC, listener bus);
    // if an executor OOM killed it mid-family they must not abort the
    // sweep the family-boundary rebuild exists to protect (ADVICE r11) —
    // the family's remaining reps read -1/ok=false and the next
    // ensureLive() rebuilds
    // NonFatal only: a fatal JVM error (OOM) must propagate to timeOnce's
    // family guard / the JVM, and an interrupt must keep its status
    // (ADVICE r12) — the guard here is for the dead-SparkContext RPC case
    def release(): Unit =
      try {
        graft.operators.Checkpoints.releaseQueryScoped(spark); System.gc()
      } catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(s"[scalebench] release interrupted: ${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scalebench] release skipped: ${e.getMessage}")
      }
    def drain(): Unit =
      try org.apache.spark.sql.graft.shim.waitListenerBusEmpty(
        spark.sparkContext, 10000L)
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          System.err.println(s"[scalebench] drain interrupted: ${e.getMessage}")
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scalebench] drain skipped: ${e.getMessage}")
      }
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                 dir: String, name: String): Rep = {
      drain()
      val (r0, w0, c0) = work.snapshot
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        val (r1, w1, c1) = work.snapshot
        Rep(wall, ((r1 - r0) + (w1 - w0)) / 1e6, (c1 - c0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[scalebench] $name @ $dir FAILED: " +
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")
            .linesIterator.nextOption().getOrElse("")}")
        Rep(-1.0, -1.0, -1.0) }
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

    val decade = math.log10(sfB / sfA)
    // exponent over positive medians only; 0-work families (nothing
    // shuffled at either scale) report NaN -> null, not -Infinity
    def expOf(a: Double, b: Double, ok: Boolean): Double =
      if (ok && a > 0 && b > 0) math.log10(b / a) / decade else Double.NaN
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only(n) }
      .map { case (name, fn) =>
        ensureLive()
        // warm both scales first (session caches, codegen), then
        // alternate timed reps A,B,A,B so regime drift hits both evenly
        val warmA = timeOnce(fn, dirA, name); release()
        val warmB = timeOnce(fn, dirB, name); release()
        val timed = (1 to reps).map { _ =>
          val a = timeOnce(fn, dirA, name); release()
          val b = timeOnce(fn, dirB, name); release()
          (a, b)
        }
        val (rsA, rsB) = (timed.map(_._1), timed.map(_._2))
        val ok = warmA.wall > 0 && warmB.wall > 0 &&
          rsA.forall(_.wall > 0) && rsB.forall(_.wall > 0)
        val (mA, mB) = (median(rsA.map(_.wall)), median(rsB.map(_.wall)))
        val (shA, shB) = (median(rsA.map(_.shuffleMb)), median(rsB.map(_.shuffleMb)))
        val (cpA, cpB) = (median(rsA.map(_.cpuS)), median(rsB.map(_.cpuS)))
        val expTimed = expOf(mA, mB, ok)
        val expWarm = expOf(warmA.wall, warmB.wall, ok)
        val expCpu = expOf(cpA, cpB, ok)
        val expShuffle = expOf(shA, shB, ok)
        System.err.println(f"[scalebench] $name%-28s A=${r3(mA)}%8s B=${r3(mB)}%8s " +
          f"expTimed=$expTimed%6.2f expWarm=$expWarm%6.2f " +
          f"expCpu=$expCpu%6.2f expShuffle=$expShuffle%6.2f " +
          f"cpu=${r3(cpA)}->${r3(cpB)} shMB=${r3(shA)}->${r3(shB)} " +
          s"repsA=${rsA.map(r => r3(r.wall)).mkString("[", ",", "]")} " +
          s"repsB=${rsB.map(r => r3(r.wall)).mkString("[", ",", "]")}")
        (name, warmA, warmB, rsA, rsB, ok)
      }
    def jnum(d: Double): String = if (d.isNaN) "null" else r3(d)
    def jarr(ds: Seq[Double]): String = ds.map(r3).mkString("[", ",", "]")
    val detail = rows.map { case (n, wA, wB, rsA, rsB, ok) =>
      val (mA, mB) = (median(rsA.map(_.wall)), median(rsB.map(_.wall)))
      val (shA, shB) = (median(rsA.map(_.shuffleMb)), median(rsB.map(_.shuffleMb)))
      val (cpA, cpB) = (median(rsA.map(_.cpuS)), median(rsB.map(_.cpuS)))
      s""""$n":{"warm_a":${r3(wA.wall)},"warm_b":${r3(wB.wall)},""" +
        s""""reps_a":${jarr(rsA.map(_.wall))},"reps_b":${jarr(rsB.map(_.wall))},""" +
        s""""median_a":${r3(mA)},"median_b":${r3(mB)},""" +
        s""""cpu_s_a":${jarr(rsA.map(_.cpuS))},"cpu_s_b":${jarr(rsB.map(_.cpuS))},""" +
        s""""shuffle_mb_a":${jarr(rsA.map(_.shuffleMb))},""" +
        s""""shuffle_mb_b":${jarr(rsB.map(_.shuffleMb))},""" +
        s""""exp_timed":${jnum(expOf(mA, mB, ok))},""" +
        s""""exp_warm":${jnum(expOf(wA.wall, wB.wall, ok))},""" +
        s""""exp_cpu":${jnum(expOf(cpA, cpB, ok))},""" +
        s""""exp_shuffle":${jnum(expOf(shA, shB, ok))},"ok":$ok}"""
    }.mkString("{", ",", "}")
    val line = s"""{"scalebench":$detail,"sf_a":$sfA,"sf_b":$sfB,""" +
      s""""dir_a":"$dirA","dir_b":"$dirB","cpus":$cpus,"reps":$reps,""" +
      s""""protocol":"interleaved warmA,warmB then A,B per rep; exponent=log(tB/tA)/log(sfB/sfA); cpu/shuffle deltas from task-end metrics, bus-drained per rep"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALEBENCH.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[scalebench] write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
