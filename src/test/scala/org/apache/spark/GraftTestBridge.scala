package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * async listener bus before asserting on listener-collected state
  * (job counts etc.) without sleeps.
  */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
