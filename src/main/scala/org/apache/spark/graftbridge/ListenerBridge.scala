package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener-bus flush bridge. `SparkContext.listenerBus` and
  * `waitUntilEmpty` are private[spark]; Bench's per-query task-metric
  * attribution needs a deterministic flush between queries (the bus
  * is async — without it a query's last task-end events could bill to
  * the NEXT query's row). Same convention as
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]]: a minimal
  * accessor inside the org.apache.spark namespace, nothing else.
  */
object ListenerBridge {
  /** Block until every posted listener event has been delivered. */
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
