package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` internals: drains the shared
  * listener bus so QueryExecutionListener callbacks (delivered async) are
  * guaranteed visible before a spec asserts on captured plans.
  */
object TestBridges {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
