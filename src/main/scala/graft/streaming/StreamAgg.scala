package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming aggregations (SURVEY §2.G).
  *
  * Watermarks bound state: at 100 TB/day the window state store only ever
  * holds watermark-recent windows, and late data beyond the delay is
  * dropped deterministically rather than growing state without bound.
  */
object StreamAgg {

  /** Sliding-window event aggregation with a watermark. Input needs
    * `ts: timestamp`, `event_type: string`, `value: double`. */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "30 minutes",
      win: String = "10 minutes", slide: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))
}

/** Event shape for streaming sessionization. */
case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Open-session state carried between micro-batches (per user). */
case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

/** A closed session, emitted once its gap has passed the watermark. */
case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
  n_events: Long, sum_value: Double)

/** Streaming sessionization via flatMapGroupsWithState — the stateful
  * custom-operator path (reference: the per-subscriber channel state of
  * RealTimeCdrWiretap, generalized to per-user sessions). State is one
  * OpenSession per active user, closed either by an in-batch gap or by
  * event-time timeout at watermark + gap — so state size is bounded by
  * concurrently-active users, not history. */
object Sessionize {

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last-event + gap: the open session is closed
            val out = state.getOption.map(close(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last <= gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
