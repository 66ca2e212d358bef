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
    cached.rdd.unpersist(blocking = true) // leave the shared session clean
  }

  test("release is idempotent and safe with nothing registered") {
    Checkpoints.releaseQueryScoped(spark)
    Checkpoints.releaseQueryScoped(spark)
  }
}
