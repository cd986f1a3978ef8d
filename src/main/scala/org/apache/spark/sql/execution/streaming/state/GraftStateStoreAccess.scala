package org.apache.spark.sql.execution.streaming.state

/** Package-local bridge to `StateStore.unloadAll()` for graft's bench
  * harness.
  *
  * `StateStore` is `private[sql]`: Spark's own test suites reach it by
  * living in this package, and this shim does the same — one line, no
  * behavior. Why the bench needs it: providers of STOPPED streaming
  * queries stay loaded (native RocksDB instances + maintenance work)
  * until the maintenance interval unloads them, and a pile of them
  * measurably taxes the next streaming query's micro-batches
  * (measured: st03's loopback replay at 13.6 s following retried
  * st01/st02 — six lingering providers — vs 6.8 s following single
  * runs). Between timed measurements the bench unloads them all;
  * unloading is the normal executor-loss path (a provider reloads
  * from its checkpoint on demand), and every timed query starts its
  * own fresh checkpoint anyway, so no state is ever lost — only the
  * idle native instances are released eagerly instead of lazily.
  */
object GraftStateStoreAccess {
  def unloadAll(): Unit = StateStore.unloadAll()
}
