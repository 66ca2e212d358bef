package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Column <-> Expression conversions are private[sql]
  * in Spark 4, and third-party native expressions need them (the same
  * pattern frameless/spark-daria use). Nothing else from the private API
  * surface is touched. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The id of the RDD a `checkpoint()`/`localCheckpoint()` result wraps
    * (its analyzed plan is a LogicalRDD holding exactly the RDD that was
    * persisted), or None for any other plan shape. Lets the checkpoint
    * block-lifetime registry record the PRECISE id instead of diffing
    * `getPersistentRDDs` around the call — a diff can misattribute a
    * concurrent thread's blocks (r9 advice). */
  def checkpointedRddId(df: org.apache.spark.sql.DataFrame): Option[Int] =
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        d.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd.id)
          case _ => None
        }
      case _ => None
    }

  /** Block until the listener bus has delivered every queued event (or
    * the timeout passes — swallowed: a metrics reader would rather see a
    * slightly-stale counter than die). `SparkContext.listenerBus` is
    * private[spark]; work-metric snapshots (ScaleBench's per-rep shuffle/
    * CPU deltas) need a drain barrier so a rep's task-end events are
    * counted against THAT rep, not the next one. */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
                           timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
