package org.apache.spark

/** Bridge into `private[spark]` listener-bus synchronization. The async
  * event queues deliver stage events after jobs return, so any metrics
  * listener needs a real drain barrier — sleep-polling can both leak a
  * previous job's events into a freshly attached listener and read a
  * tally before the measured job's events arrive. Lives in the
  * org.apache.spark package purely for access; no internals modified.
  */
object GraftListenerBridge {
  /** Block until every event posted so far has been dispatched to all
    * registered listeners (Spark caps the wait internally).
    */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
