package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark] sc.listenerBus.waitUntilEmpty()` — a test
  * that counts scheduled jobs via a SparkListener must drain the async
  * listener bus before asserting, or the count races event delivery.
  * Spark's own test harness (SparkFunSuite/TestUtils) uses exactly this
  * call; same access pattern as TaskContextBridge. */
object ListenerBusBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
