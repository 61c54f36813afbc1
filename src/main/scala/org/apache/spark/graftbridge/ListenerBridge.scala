package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** The async listener bus delivers task-end events after the action that
  * produced them returns, so metric listeners snapshotting "right after"
  * an action undercount it. `waitUntilEmpty` is `private[spark]`; this
  * bridge (placed under org.apache.spark for access, like the sibling
  * sql ColumnBridge) is the sanctioned hop.
  */
object ListenerBridge {

  /** Block until every event posted so far has been delivered (bounded). */
  def flush(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
