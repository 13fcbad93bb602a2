package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Sessionization on the Spark 4 `transformWithState` API — the
  * arbitrary-state successor to flatMapGroupsWithState ([[Sessionize]]
  * keeps the classic form). Differences that matter at scale: typed state
  * handles (ValueState) live in the RocksDB state store (larger-than-heap
  * state, incremental checkpoints), and event-time timers are explicit —
  * one timer per open session closes it when the watermark passes
  * last-event + gap. */
class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SessionEvent, ClosedSession] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState("open", Encoders.product[OpenSession], TTLConfig.NONE)

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)

  override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
      tv: TimerValues): Iterator[ClosedSession] = {
    val sorted = rows.toSeq.sortBy(_.ts.getTime)
    var cur = if (open.exists()) Some(open.get()) else None
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(OpenSession(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed += close(userId, s)
          cur = Some(OpenSession(t, t, 1L, e.value))
        case None =>
          cur = Some(OpenSession(t, t, 1L, e.value))
      }
    }
    cur.foreach { s =>
      open.update(s)
      getHandle.registerTimer(s.last + gapMs)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(userId: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[ClosedSession] = {
    // stale timers (session extended since registration) fire harmlessly
    if (open.exists() && info.getExpiryTimeInMs() >= open.get().last + gapMs) {
      val out = close(userId, open.get())
      open.clear()
      Iterator.single(out)
    } else Iterator.empty
  }
}

object SessionizeTws {
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
