package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Gap-based sessionization over an event stream (beyond-reference: the
  * reference has no event-time operators, SURVEY.md §2.6; this is the
  * standard batch formulation — lag → gap flag → running sum = session id).
  *
  * One shuffle on the user key; both window functions share the same
  * partitioning, so Catalyst plans a single Exchange + Sort.
  */
object Sessionize {

  /** Assign `session_id` (0-based per user): a new session starts when
    * the gap since the previous event exceeds `gapSeconds`. Epoch seconds
    * are truncated (cast to long) so engines agree on boundary ties.
    */
  def withSessionIds(events: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String, gapSeconds: Long): DataFrame = {
    // TIMESTAMP_NTZ (what pandas/pyarrow-written parquet yields without a
    // UTC flag) rejects a direct cast-to-long; relabel NTZ→session-TZ
    // timestamp for the gap arithmetic only — the user's column and the
    // ordering are untouched.
    val epochSecs: Column => Column = events.schema(tsCol).dataType match {
      case TimestampNTZType => c => c.cast(TimestampType).cast("long")
      case _                => c => c.cast("long")
    }
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreakCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          epochSecs(col(tsCol)) - epochSecs(col("__prev")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev", "__new")
  }

  /** Per-session summary: start/end, event count. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String, gapSeconds: Long): DataFrame =
    withSessionIds(events, userCol, tsCol, tieBreakCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
