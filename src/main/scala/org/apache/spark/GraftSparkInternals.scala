package org.apache.spark

/** Typed access to `private[spark]` internals the probes need — the
  * standard extension-package shim (a file in the `org.apache.spark`
  * package sees Spark's qualified-private members; no reflection, so a
  * Spark upgrade that changes the member breaks the COMPILE, not a
  * run).
  */
object GraftSparkInternals {
  /** Block until the async listener bus has delivered every queued
    * event — the deterministic replacement for sleep-and-hope before
    * reading listener-tallied metrics (ADVICE r13: on a loaded host a
    * fixed sleep can miss late task-end events or bleed them into the
    * next measurement).
    */
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
