package org.apache.spark.sql.execution.streaming.state

/** Test/bench-harness shim: [[StateStore]] is `private[sql]`, but the
  * bench suite must unload every loaded state-store provider between
  * attempts — a terminated AvailableNow query leaves its providers
  * loaded (full state map in memory + periodic maintenance ticks), and
  * over a 170-entry suite that accumulation inflated late streaming
  * entries' timings (r9: q_stream_containment attempt 2 at 19.9 s with
  * zero GC time and 9.6 GB heap). Production code never calls this —
  * provider lifecycle there belongs to the streaming engine. */
object GraftStateStoreHygiene {
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
