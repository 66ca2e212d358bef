package graft.operators

import org.apache.spark.sql.DataFrame

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
  * either way (ReliableCheckpointSpec pins a CC + near-dedup pass). */
object Checkpoints {
  def ckpt(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get("spark.graft.reliableCheckpoint", "false").toBoolean) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        "spark.graft.reliableCheckpoint=true requires sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
