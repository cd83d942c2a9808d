package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over event streams — a standard training-data
  * pipeline step (session-level dedup, engagement features, conversation
  * assembly).
  *
  * Batch path: two windows, both partitioned by the user key — a lag to
  * detect gap breaks and a running sum to number sessions. Everything
  * shuffles once on the user key; no global window, scales with users.
  *
  * Streaming path: Spark's native `session_window` aggregation (merging
  * session state handled by the engine, watermark-driven eviction).
  */
object Sessions {

  /** Tag each event with its session index (0-based per user): a new
    * session starts when the gap since the previous event exceeds
    * `gapSec` seconds. `tsCol` is numeric epoch seconds (or any numeric
    * time axis — `gapSec` is in the same unit). */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(byUser)
    val isBreak = when(prev.isNull || (col(tsCol) - prev) > gapSec, 1L).otherwise(0L)
    df.withColumn("__brk", isBreak)
      .withColumn("session_idx",
        sum(col("__brk")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__brk")
  }

  /** One row per (user, session): event count, start/end, duration. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, gapSec: Long): DataFrame =
    sessionize(df, userCol, tsCol, gapSec)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"))

  /** Streaming session aggregation via the engine's native session window.
    * `tsCol` must be a TimestampType event-time column with a watermark set
    * by the caller (`withWatermark`) for state eviction. */
  def streamingSessionCounts(stream: DataFrame, userCol: String, tsCol: String,
                             gap: String): DataFrame =
    stream.groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
}
