package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** STREAM-STREAM interval join (the attribution shape: every left
    * event matched to the right events at most `lookback` BEFORE it,
    * same keys — clicks to the views that may have caused them). Both
    * sides get `watermark` on their time column, which is what lets
    * Spark bound the join state: a right row's state is evicted once
    * the left watermark passes `rightTime + lookback` (no match can
    * arrive for it anymore), so state is O(rate × (lookback +
    * lateness)) instead of O(stream) — the difference between a
    * stream-stream join that runs forever and one that OOMs in an hour.
    * Inner join only: every emitted pair is final, so results are
    * deterministic and batch-replayable (the same call on two BATCH
    * frames computes the identical join — the oracle the declared query
    * checks against).
    *
    * Correct ingestion contract (cross-batch exactness): feed batches
    * in event-time order with `watermark` ≥ `lookback` + max
    * out-of-order skew; a row older than the current watermark when it
    * ARRIVES is dropped as late — that is watermark semantics, not a
    * bug in the join.
    *
    * Column names must be disjoint apart from `keys` (rename before the
    * call); output carries left columns then right columns minus the
    * duplicated keys.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTime: String,
                          rightTime: String, lookback: String,
                          watermark: String,
                          joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "need at least one equality key (state keying)")
    require(joinType == "inner" || joinType == "left_outer",
      s"interval join supports inner | left_outer, got $joinType")
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    val cond = (keys.map(k => l(k) === r(k)) :+
      (r(rightTime) >= l(leftTime) - expr(s"INTERVAL $lookback")) :+
      (r(rightTime) <= l(leftTime))).reduce(_ && _)
    val joined = l.join(r, cond, joinType)
    val rightKeep = right.columns.filterNot(keys.contains)
    joined.select(left.columns.map(l(_)) ++ rightKeep.map(r(_)): _*)
  }

  // left_outer note (the part that differs from the inner contract):
  // matches still emit eagerly, but an UNMATCHED left row emits its
  // null-padded form only when the watermark proves no future right row
  // can pair with it — i.e. in the no-data micro-batches that advance
  // eviction. Callers that drain a bounded feed must push the watermark
  // past every real row (far-future sentinel appends, the sessionize
  // flush pattern) or final unmatched rows stay pending forever; and
  // no-data micro-batches MUST stay enabled for this shape, unlike the
  // inner join where they only evict state.

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

  // ---- custom state: flatMapGroupsWithState ---------------------------

  /** Mutable per-user session accumulator for [[sessionizeStateful]].
    * Times are MICROSECONDS since the epoch — Spark timestamps carry µs
    * and the gap comparison must happen at full precision or an event
    * pair within 1 ms of exactly `gap` apart classifies differently here
    * than in a µs-exact batch re-derivation.
    */
  final case class SessionAcc(startUs: Long, lastUs: Long,
                              nEvents: Long, sumValue: Double)

  /** A closed session emitted once its gap elapses past the watermark. */
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp,
                                 n_events: Long, session_value: Double)

  // carries the watermarked `ts` attribute itself (required for
  // event-time timeout: the watermark tag must survive into the
  // FlatMapGroupsWithState child plan)
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
                                        value: Double) {
    // full µs precision: getTime truncates to ms, the nanos field holds
    // the whole sub-second part
    def tsUs: Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  }


  /** Gap-based sessionization via `flatMapGroupsWithState` — the
    * arbitrary-stateful-processing formulation of [[sessionize]], for
    * session logic the built-in `session_window` cannot express (custom
    * accumulators, mid-session emission rules, per-key TTLs). State is one
    * small accumulator per ACTIVE user and is dropped by the event-time
    * timeout as the watermark passes `last event + gap` — bounded the same
    * way the built-in operator's state is.
    *
    * Emission: closed sessions only (append-mode compatible). A session
    * closes when a newer event for the same user arrives more than `gap`
    * after its last event, or when the event-time timeout fires. Streaming
    * semantics only: in batch mode timeouts never fire, so each user's
    * final open session is not emitted — use [[sessionize]] for batch.
    */
  def sessionizeStateful(events: DataFrame, gap: String = "30 minutes",
                         watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0, s"calendar-month gaps are not supported: $gap")
    val gapUs = iv.days * 86400000000L + iv.microseconds

    // local (not an object method): the task closure must not capture
    // the non-serializable enclosing module
    def usToTimestamp(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def close(u: Long, s: SessionAcc): ClosedSession =
      ClosedSession(u, usToTimestamp(s.startUs), usToTimestamp(s.lastUs),
        s.nEvents, math.rint(s.sumValue * 100) / 100)

    def update(user: Long, events: Iterator[SessionEvent],
               state: GroupState[SessionAcc]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(user, _)).iterator
        state.remove()
        out
      } else {
        val sorted = events.toSeq.sortBy(_.tsUs)
        var acc = state.getOption.orNull
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          acc match {
            case null =>
              acc = SessionAcc(e.tsUs, e.tsUs, 1, e.value)
            case a if e.tsUs - a.lastUs >= gapUs =>
              closed += close(user, a)
              acc = SessionAcc(e.tsUs, e.tsUs, 1, e.value)
            case a =>
              acc = a.copy(lastUs = math.max(a.lastUs, e.tsUs),
                nEvents = a.nEvents + 1, sumValue = a.sumValue + e.value)
          }
        }
        if (acc != null) {
          state.update(acc)
          // evict once the watermark passes the session's gap horizon
          // (timeouts are ms-granular: round the µs horizon UP so the
          // timeout can never fire early); clamp above the current
          // watermark — a late event can put lastUs+gap below it, which
          // setTimeoutTimestamp rejects
          state.setTimeoutTimestamp(
            math.max(Math.floorDiv(acc.lastUs + gapUs + 999L, 1000L),
              state.getCurrentWatermarkMs + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts"),
        col("value").cast("double").as("value"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
