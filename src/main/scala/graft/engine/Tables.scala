package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared parquet table loader for the testdata star schema.
  *
  * The `events` table stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
  * We read nanos as a plain long (`spark.sql.legacy.parquet.nanosAsLong`)
  * and truncate to microseconds — exactly what DuckDB does when it casts
  * timestamp_ns to its native microsecond timestamp, so oracle comparisons
  * agree. The conversion is a pure projection (no shuffle, codegen'd) and
  * the scan itself stays vectorized with pushdown intact for all other
  * columns.
  */
object Tables {

  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integer div truncates toward zero == duckdb's ns->us truncation
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
