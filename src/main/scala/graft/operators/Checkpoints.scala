package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-truncating eager materialization for iterative / multi-consumer
  * frames (CC rounds, LSH candidate sets, shared tf aggregates).
  *
  * Default: `localCheckpoint()` — materializes once, truncates the lineage
  * so downstream analysis stays cheap, leaves no CacheManager entry for
  * every later action to plan-match against (measured 8x slowdown across a
  * 180-action session), and its blocks are freed by the ContextCleaner when
  * the result frame is dropped. The trade-off: local-checkpoint blocks live
  * only on their executors and are NOT recomputable after executor loss —
  * acceptable for interactive/short jobs, not for long-lived production
  * pipelines on preemptible clusters.
  *
  * Set `spark.graft.reliableCheckpoint=true` (runtime conf) AND
  * `sc.setCheckpointDir(...)` to route every such site through RELIABLE
  * checkpointing instead: blocks go to the checkpoint dir (HDFS/object
  * store on a cluster), surviving executor loss, at the cost of a
  * write+read through the filesystem per materialization. Same values
  * either way (ReliableCheckpointSpec pins a CC + near-dedup pass).
  *
  * Block-lifetime accounting (the r8 driver-bench lesson): in a 369-query
  * single-JVM run, checkpoint blocks from completed queries are reclaimed
  * only when a GC happens to let the ContextCleaner process their weak
  * refs — an ASYNC path that under suite-level storage pressure lags far
  * enough for later queries' reps to inflate 4-7x (q239 reps [9.2, 3.2,
  * 22.1], q167 2.4 -> 9.3 s in BENCH_r08). So every ckpt call registers
  * the RDD ids it persisted as query-scoped and RELEASABLE, and the
  * harnesses (Bench between reps, Verify between queries) call
  * [[releaseQueryScoped]] to unpersist them deterministically — no rep's
  * cost depends on suite position. Frames that must OUTLIVE a query —
  * the session-level family caches (shared LSH pair chains etc.) — build
  * under [[sessionScope]], which suppresses registration; `.persist()`/
  * `.cache()` frames (IVF lists, the EduFlow pipeline) keep their lineage
  * and are never registered, so they are untouched either way.
  *
  * Registration reads the PRECISE persisted-RDD id off the returned
  * Dataset's plan (a checkpoint result is a LogicalRDD wrapping exactly
  * the RDD that was persisted — shim.checkpointedRddId, and the local-
  * checkpoint path REQUIRES the id to be found, so a future Spark plan-
  * shape change fails fast instead of silently never releasing anything
  * and resurrecting the r8 storage-pressure pathology), and the
  * releasable registry is THREAD-SCOPED: concurrent ckpt calls (parallel
  * test suites, a future parallel harness) can neither cross-attribute
  * nor cross-release each other's blocks — [[releaseQueryScoped]] only
  * unpersists ids the CALLING thread's queries registered (r9 advice: the
  * previous getPersistentRDDs set-diff + global set could claim, and then
  * release, a neighbor thread's blocks mid-query). A thread's
  * registrations it never releases die with the ContextCleaner as before. */
object Checkpoints {
  private val releasable = new ThreadLocal[scala.collection.mutable.Set[Int]] {
    override def initialValue(): scala.collection.mutable.Set[Int] =
      scala.collection.mutable.Set.empty[Int]
  }
  private val suppress = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Run `body` with ckpt registration suppressed: blocks created inside
    * belong to a session-lifetime cache and must survive
    * [[releaseQueryScoped]]. */
  def sessionScope[T](body: => T): T = {
    val prev = suppress.get
    suppress.set(java.lang.Boolean.TRUE)
    try body finally suppress.set(prev)
  }

  /** LAZY variant of [[ckpt]] (r14 perf): the Catalyst plan is truncated
    * either way — Dataset.localCheckpoint wraps the physical RDD in a
    * LogicalRDD at BUILD time, eager only adds an immediate count() job —
    * so deferring materialization into the first consuming action removes
    * one job launch + driver barrier per ckpt site. Iterative operators
    * (HITS, k-core, CC/label-prop rounds) pay 1-3 such barriers PER
    * ROUND; on a cluster each barrier idles every executor for a
    * scheduling round trip, so this is a scale win, not a local[32]
    * artifact. Values are unchanged: the same RDD is persisted by
    * whichever action touches it first, and later consumers read the
    * same blocks (cache semantics).
    *
    * WHEN NOT TO USE (measured, r14): a frame whose FIRST consumption is
    * several sibling stages of one job (triangle census' 4-leg edge
    * fan-out, CC's round-1 edge set) — the sibling stages race to
    * compute the still-unmaterialized RDD and duplicate its work
    * (q239 +19%, q67 +36% when forced lazy). Eager [[ckpt]] stays the
    * default for exactly that shape; mark a site lazy only when its
    * first consumer is a single sequential action (the next round's
    * convergence check, a broadcast-max job, the final collect). */
  def ckptLazy(df: DataFrame): DataFrame = ckpt(df, eager = false)

  def ckpt(df: DataFrame): DataFrame = ckpt(df, eager = true)

  private def ckpt(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val out =
      if (spark.conf.get("spark.graft.reliableCheckpoint", "false").toBoolean) {
        require(sc.getCheckpointDir.isDefined,
          "spark.graft.reliableCheckpoint=true requires sparkContext.setCheckpointDir(...)")
        // honor eager=false here too (ADVICE r14): df.checkpoint() defaults
        // to eager, which silently re-added the per-round barrier the
        // ckptLazy sites removed whenever reliable mode is on. Reliable
        // semantics (blocks in the checkpoint dir, survive executor loss)
        // and values are unchanged — only materialization timing moves.
        df.checkpoint(eager = eager)
      } else df.localCheckpoint(eager = eager)
    if (!suppress.get.booleanValue()) {
      // exact id from the returned plan — never a set-diff that could
      // claim a concurrent thread's blocks. A reliable checkpoint's RDD
      // is not persisted; registering its id is a release-time no-op.
      val id = org.apache.spark.sql.graft.shim.checkpointedRddId(out)
      val reliable =
        spark.conf.get("spark.graft.reliableCheckpoint", "false").toBoolean
      require(reliable || id.isDefined,
        "localCheckpoint result did not expose its persisted RDD " +
          "(plan shape changed?) — block release would silently stop working")
      id.foreach(i => releasable.get.add(i))
    }
    out
  }

  /** Unpersist (blocking) every query-scoped checkpoint block THIS THREAD
    * registered since its last call. Safe at any query boundary: each
    * execution re-materializes its own checkpoints, and session caches
    * either built under [[sessionScope]] or hold recomputable
    * `.persist()` frames; other threads' in-flight blocks are untouchable
    * by construction (thread-scoped registry). */
  def releaseQueryScoped(spark: SparkSession): Unit = {
    val persisted = spark.sparkContext.getPersistentRDDs
    val mine = releasable.get
    mine.foreach(id => persisted.get(id).foreach(_.unpersist(blocking = true)))
    mine.clear()
  }
}
