package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational composites (SURVEY.md §2 C5, C10): operators Spark lacks as
  * single calls, assembled from built-ins so Catalyst still owns the
  * physical strategy.
  */
object Relational {

  /** C5: as-of join — for each left row, the single most recent right row
    * with `rightTime <= leftTime`, matched on an equality key.
    *
    * Implementation: equi-join on the key (shuffle/broadcast chosen by
    * Catalyst) restricted by the time inequality, then a per-left-row
    * window keeps the latest match (deterministic tie-break on
    * `rightTieBreak`). The equi-key keeps it a hash join — never a pure
    * range/BNL join — so it scales with the key cardinality. For a
    * time-series-dense right side the scale refinement is bucketing both
    * sides by key (co-located join) which this plan picks up for free.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               leftIdCol: String, rightTieBreak: String): DataFrame = {
    val joined = left.join(
      right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime),
      "inner"
    )
    // "latest right row per left row" as ONE hash aggregate (max_by over a
    // lexicographic (time, tie-break) struct) — partial aggregation folds
    // most candidates map-side, where the window formulation would shuffle
    // every joined candidate and sort each partition
    val best = max_by(
      struct(right.columns.map(right(_)).toIndexedSeq: _*),
      struct(right(rightTime), right(rightTieBreak))
    ).as("__best")
    val carriedNames = left.columns.filterNot(_ == leftIdCol).toIndexedSeq
    val carried = carriedNames.map(c => first(left(c)).as(c))
    joined
      .groupBy(left(leftIdCol))
      .agg(best, carried: _*)
      .select(col(leftIdCol) +: carriedNames.map(col) :+ col("__best.*"): _*)
  }

  /** C10: per-group top-k, the window+filter idiom (rank pushes the filter
    * into `WindowGroupLimit` in Spark 4 — per-partition heaps, no full
    * per-group sort materialization). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[Column], k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
