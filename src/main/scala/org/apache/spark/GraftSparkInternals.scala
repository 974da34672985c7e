package org.apache.spark

/** Package-private Spark internals the graft bench needs (nothing here
  * runs in library code paths — measurement only).
  *
  * `listenerBus.waitUntilEmpty` is how Spark's own test/benchmark
  * harnesses make SparkListener-collected task metrics deterministic:
  * task-end events are delivered async, so a per-query metric snapshot
  * taken right after an action could miss the tail of its own tasks.
  * It is `private[spark]`, hence this one-file bridge in the
  * org.apache.spark package.
  */
object GraftSparkInternals {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
