package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.util.SerializableConfiguration

/** Executor-side access to the session's hadoop configuration.
  *
  * Spark's `SerializableConfiguration` wrapper is `private[spark]`, so a
  * library closure that must open a `FileSystem` on an EXECUTOR (the
  * streaming tombstone-freshness guard re-lists `deletes.parquet` per
  * micro-batch) cannot name it — hence this one-method shim inside the
  * spark package, the [[ColumnShim]] pattern. The returned thunk captures
  * only a `Broadcast` (serializable, shipped once) and is itself a
  * serializable Scala lambda. */
object HadoopConfShim {
  // ONE broadcast per SparkContext (ADVICE r18): every caller used to
  // broadcast afresh — a long-lived driver constructing many probe
  // streams (or LifecycleSweep's 20-guards-per-rung loop) accumulated
  // dead broadcast blocks that are never unpersisted. The cached value
  // is a SNAPSHOT of the context's hadoopConfiguration at first call —
  // fine for the guard's use (opening a FileSystem for a LIST), which
  // needs scheme handlers, not late session-conf mutations; a caller
  // that mutates hadoopConfiguration AFTER the first guard is built
  // (fs.* credentials set late) must do so before any stream/guard
  // construction — the snapshot will not see it.
  @volatile private var cached: (SparkContext, () => Configuration) = _
  def confGetter(sc: SparkContext): () => Configuration = synchronized {
    // fail CLEARLY on a stopped context (ADVICE r19): re-broadcasting on
    // it would throw an opaque IllegalStateException from deep inside
    // SparkContext.broadcast — name the actual precondition instead
    require(!sc.isStopped,
      "HadoopConfShim.confGetter: SparkContext is stopped — construct " +
        "guards/streams on a live session (a cached getter from a stopped " +
        "context is never reused; callers must re-acquire after restart)")
    // no stopped-context clause needed: cached._1 eq sc is live per the
    // require above, and cached._1 ne sc already triggers the rebuild
    if (cached == null || (cached._1 ne sc)) {
      val b = sc.broadcast(new SerializableConfiguration(sc.hadoopConfiguration))
      cached = (sc, () => b.value.value)
    }
    cached._2
  }
}
