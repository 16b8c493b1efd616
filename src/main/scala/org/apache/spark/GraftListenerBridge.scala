package org.apache.spark

/** Bridge into the private[spark] listener bus: QueryExecutionListener
  * callbacks are delivered asynchronously on this bus, so a post-hoc
  * executed-plan audit (graft.plans.PlanLint.lintExecuted) must drain it
  * before reading what was captured. Same pattern as GraftColumnBridge. */
object GraftListenerBridge {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
