package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal bridge into the private[spark] listener bus, so the bench
  * can DRAIN queued task-end events before snapshotting per-query
  * telemetry — without it, a query's tail metrics can be attributed
  * to the next query. Same technique (and justification) as
  * `org.apache.spark.sql.graft.bridge`. */
object listenerBridge {
  /** Block until all queued listener events are delivered (bounded). */
  def drain(sc: SparkContext, timeoutMillis: Long = 5000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
