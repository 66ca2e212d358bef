package graft

import org.apache.spark.sql.functions._
import graft.operators.Checkpoints

/** Pins the block-lifetime contract the Bench/Verify harnesses rely on
  * (the r8 driver-bench lesson, PLANS_r09 §2): query-scoped checkpoint
  * blocks are released deterministically between queries, while frames
  * built under [[Checkpoints.sessionScope]] — the session caches — must
  * SURVIVE that release and stay readable. The survival half is the
  * sharp edge: a localCheckpoint truncates lineage, so a session-cached
  * frame that were wrongly registered would not recompute after the
  * harness unpersists it — it would crash on its next consumer. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releaseQueryScoped unpersists a plain ckpt's blocks") {
    // drain registrations left behind by other suites first
    Checkpoints.releaseQueryScoped(spark)
    val before = persistedIds
    val df = Checkpoints.ckpt((1 to 100).toDF("x").withColumn("y", col("x") * 2))
    assert(df.count() == 100)
    val created = persistedIds.diff(before)
    assert(created.nonEmpty, "ckpt should persist at least one RDD")
    Checkpoints.releaseQueryScoped(spark)
    assert(persistedIds.intersect(created).isEmpty,
      "query-scoped blocks must be gone after release")
  }

  test("a sessionScope ckpt survives releaseQueryScoped and stays readable") {
    Checkpoints.releaseQueryScoped(spark)
    val cached = Checkpoints.sessionScope {
      Checkpoints.ckpt((1 to 50).toDF("x").withColumn("s", col("x") + 1))
    }
    assert(cached.count() == 50)
    Checkpoints.releaseQueryScoped(spark)
    // lineage is truncated: this count would throw "checkpoint block not
    // found" if the release had dropped the session-scoped blocks
    assert(cached.count() == 50)
    assert(cached.agg(sum(col("s"))).head.getLong(0) == (2 to 51).sum)
    unpersistCheckpoint(cached) // leave the shared session clean
  }

  /** `.rdd.unpersist` would be a no-op (Dataset.rdd builds a NEW RDD from
    * the plan, not the persisted one) — unpersist the actual checkpoint
    * block via its registered id. */
  private def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    org.apache.spark.sql.graft.shim.checkpointedRddId(df).foreach { id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = true))
    }

  test("release is idempotent and safe with nothing registered") {
    Checkpoints.releaseQueryScoped(spark)
    Checkpoints.releaseQueryScoped(spark)
  }

  test("a CONCURRENT thread's sessionScope ckpt is never claimed by a " +
      "query-scoped registration (exact-id registration, r9 advice)") {
    Checkpoints.releaseQueryScoped(spark)
    // the neighbor thread builds a session cache while this thread runs a
    // query-scoped ckpt; under the old getPersistentRDDs set-diff the
    // main thread's registration window could claim the neighbor's block,
    // and the release below would unpersist a lineage-truncated cache
    @volatile var neighbor: org.apache.spark.sql.DataFrame = null
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val t = new Thread(() => {
      barrier.await()
      neighbor = Checkpoints.sessionScope {
        Checkpoints.ckpt((1 to 40).toDF("x").withColumn("n", col("x") * 3))
      }
      neighbor.count()
      barrier.await()
    })
    t.start()
    barrier.await()
    val mine = Checkpoints.ckpt((1 to 60).toDF("x").withColumn("m", col("x") + 7))
    assert(mine.count() == 60)
    barrier.await(); t.join()
    Checkpoints.releaseQueryScoped(spark)
    // the neighbor's session cache must still be readable after release
    assert(neighbor.count() == 40)
    assert(neighbor.agg(sum(col("n"))).head.getLong(0) == (1 to 40).map(_ * 3).sum)
    unpersistCheckpoint(neighbor)
  }

  test("a CONCURRENT thread's QUERY-scoped ckpt is never cross-released " +
      "(thread-scoped registry)") {
    Checkpoints.releaseQueryScoped(spark)
    // thread A registers a query-scoped ckpt and parks mid-query; the
    // main thread (B) releases ITS scope — A's block must survive,
    // because a released local checkpoint cannot recompute
    @volatile var theirs: org.apache.spark.sql.DataFrame = null
    val built = new java.util.concurrent.CountDownLatch(1)
    val mayFinish = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      theirs = Checkpoints.ckpt((1 to 30).toDF("x").withColumn("q", col("x") * 5))
      theirs.count()
      built.countDown()
      mayFinish.await()
      // A's own boundary release must still work on its own thread
      Checkpoints.releaseQueryScoped(spark)
    })
    t.start(); built.await()
    Checkpoints.releaseQueryScoped(spark) // B's release, mid-A-query
    assert(theirs.count() == 30, "neighbor's query-scoped block survived")
    val id = org.apache.spark.sql.graft.shim.checkpointedRddId(theirs).get
    assert(spark.sparkContext.getPersistentRDDs.contains(id))
    mayFinish.countDown(); t.join()
    assert(!spark.sparkContext.getPersistentRDDs.contains(id),
      "A's own release reclaims its block")
  }
}
