package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared parquet table loader for the testdata star schema.
  *
  * Some driver generations store `events.ts` as parquet INT64
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
  * ([PARQUET_TYPE_ILLEGAL]). We read nanos as a plain long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  * microseconds — exactly what DuckDB does when it casts timestamp_ns to
  * its native microsecond timestamp, so oracle comparisons agree. The
  * conversion is a pure projection (no shuffle, codegen'd) and the scan
  * itself stays vectorized with pushdown intact for all other columns.
  *
  * Other generations store `ts` as TIMESTAMP(MICROS, isAdjustedToUTC =
  * false), which Spark ≥3.4 infers as TIMESTAMP_NTZ — a type `unix_micros`
  * and the streaming watermark paths reject. NTZ inference is disabled so
  * the column reads as the session type (LTZ) carrying the RAW stored
  * micros — bit-identical to the nanos-truncation path above and to
  * DuckDB's `epoch_us`, with no session-timezone reinterpretation (an
  * NTZ→LTZ `cast` would shift the epoch by the session offset instead).
  */
object Tables {

  /** The normalization tail both formats share: a LongType `ts` column
    * is raw nanos (the nanosAsLong read) — truncate to micros.
    * Integer div truncates toward zero == duckdb's ns→us truncation. */
  private[engine] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }

  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    normalizeTs(s.read.parquet(s"$dir/$name.parquet"))
  }

  /** ORC registry tables load through the SAME normalization tail (the
    * load-only-via-Tables rule applies to every format the Catalog
    * serves). The two parquet confs are parquet-reader-specific; graft's
    * ORC tables are engine-written from already-normalized frames
    * (CatalogSpec round-trip), and a raw long `ts` still truncates
    * identically here. */
  def readOrc(s: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(s.read.orc(s"$dir/$name.orc"))
}
