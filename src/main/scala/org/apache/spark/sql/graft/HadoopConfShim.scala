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
  def confGetter(sc: SparkContext): () => Configuration = {
    val b = sc.broadcast(new SerializableConfiguration(sc.hadoopConfiguration))
    () => b.value.value
  }
}
