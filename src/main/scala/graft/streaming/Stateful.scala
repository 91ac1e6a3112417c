package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom per-key state via `mapGroupsWithState` (SURVEY.md §2.9 engine
  * surface): gap-based sessionization with an explicit state object — the
  * pattern for stateful logic that windowed aggregation can't express
  * (per-key counters, custom timers, cross-batch carry-over).
  *
  * The same function runs in batch (one call per key, state starts empty)
  * and in a streaming query (state persists across micro-batches and is
  * evicted by timeout) — which is exactly how Spark defines the API.
  *
  * Scale: one shuffle on the grouping key; state is O(1) per key (last
  * timestamp + counter), not O(events). The in-group sort is bounded by a
  * single key's events per batch.
  */
object Stateful {

  /** (lastTsMicros, sessionsSoFar, eventsSoFar) carried across batches.
    * Integer microseconds — the same exact-timestamp discipline as
    * `Relational.sessionize`'s BIGINT sums; `NoTs` (Long.MinValue) marks
    * "no event seen yet". The repo carries no float timestamps. */
  case class SessionState(lastTsUs: Long, sessions: Long, events: Long)
  private val NoTs = Long.MinValue

  /** Count gap-delimited sessions per user: a new session starts when the
    * gap to the previous event (by event_id order, as the reference's
    * API-page order analogue) exceeds `gapSec`. Matches the windowed
    * formulation (q32) — the state version exists for the streaming path
    * and as the custom-state API demonstration. */
  def sessionCounts(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSec * 1000000L
    val typed: Dataset[(Long, Long, Long)] = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[SessionState, (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(NoTs, 0L, 0L))
          var lastTsUs = prev.lastTsUs
          var sessions = prev.sessions
          var events = prev.events
          // within one invocation, order by event_id (the reference's row order)
          for ((_, _, tsUs) <- it.toArray.sortBy(_._2)) {
            if (lastTsUs == NoTs || tsUs - lastTsUs > gapUs) sessions += 1
            lastTsUs = tsUs
            events += 1
          }
          state.update(SessionState(lastTsUs, sessions, events))
          (uid, sessions, events)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
