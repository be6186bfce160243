package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch mirror of
  * the Structured Streaming `mapGroupsWithState` session operator in
  * [[graft.streaming.IncrementalIndex]]-style pipelines.
  *
  * Scale design: one shuffle on the user key (window partitioning);
  * everything else is per-partition sorted scans. Skewed power-users
  * are bounded by per-user event counts, not corpus size; AQE skew
  * handling covers the rest.
  */
object Sessions {

  /** Tag each event with its session ordinal (1-based per user): a new
    * session starts when the gap since the previous event exceeds
    * `gapSeconds`. `tieCol` makes ordering total when timestamps
    * collide.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Per-user session summary: session count + event count. */
  def sessionCounts(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(events, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(userCol)
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
}
