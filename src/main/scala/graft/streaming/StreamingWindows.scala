package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expressions of the engine's event-time operators.
  * The reference is batch-only (SparkCompute); these extend the same
  * semantics to unbounded input, composing built-ins first:
  * `window()` for tumbling/sliding, `session_window()` for gap sessions,
  * `flatMapGroupsWithState` only where no built-in holds the state shape.
  *
  * Scale notes: state store size is bounded by the watermark (late rows
  * beyond it are dropped and their state evicted); keys hash-partition across
  * executors, so state grows with ACTIVE keys per window, not stream length.
  */
object StreamingWindows {

  /** Tumbling event-time counts/sums per event type. Works identically on a
    * batch DataFrame (window() is the same expression) — used by the batch
    * parity test. */
  def tumblingAgg(events: DataFrame, windowLength: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding-window variant. */
  def slidingAgg(events: DataFrame, windowLength: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n_events"))

  /** Gap-based sessionization with the built-in session_window — the
    * streaming analogue of the batch q33 sessionize query. */
  def sessionAgg(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}

/** Input row for the custom-state operator. */
case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
/** Emitted when a user's running total crosses a threshold (once per cross). */
case class ThresholdCross(user_id: Long, total: Double, n_events: Long)

/** Custom keyed state where no built-in aggregation fits: emit a row the
  * first time each user's running value total crosses a threshold.
  * State per key is two numbers — O(active users) total. */
object ThresholdAlerts {
  def apply(events: Dataset[UserEvent], threshold: Double): Dataset[ThresholdCross] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Double, Long, Boolean), ThresholdCross](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[(Double, Long, Boolean)]) =>
          val (total0, n0, fired0) = state.getOption.getOrElse((0.0, 0L, false))
          var total = total0; var n = n0; var fired = fired0
          val out = Seq.newBuilder[ThresholdCross]
          rows.foreach { e =>
            total += e.value; n += 1
            if (!fired && total >= threshold) {
              fired = true
              out += ThresholdCross(userId, total, n)
            }
          }
          state.update((total, n, fired))
          out.result().iterator
      }
  }
}
