package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event shape for streaming as-of enrichment (a01/a04 at ingest):
  * side 0 = view (state-bearing), 1 = purchase (enriched). */
case class EnrichEvent(user_id: Long, event_id: Long, ts_us: Long, side: Int)

/** An enriched purchase — a04's row shape: stale matches degrade to the
  * no-match Nones, `fresh` separates "never" from "too old". */
case class EnrichedPurchase(user_id: Long, event_id: Long, purchase_us: Long,
  view_us: Option[Long], gap_us: Option[Long], fresh: Boolean)

/** SURVEY §2.G — ONLINE as-of enrichment: a01's latest-prior-state
  * match with a04's freshness bound, applied at INGEST.
  *
  * The batch as-of join answers "what was the latest view before this
  * purchase" after the fact; production attribution wants it the moment
  * the purchase lands. The carry-forward state a01's window computes is
  * EXACTLY one value per user — the latest view timestamp — so the
  * streaming form is a flatMapGroupsWithState keyed by user carrying
  * one long: views advance it, purchases read it and emit enriched.
  * State is bounded by |active users| (not history), and a real
  * deployment sets an event-time timeout to expire dormant users — the
  * Sessionize pattern one struct smaller.
  *
  * ORDER CONTRACT (stream_pack's precedent): per-user arrivals must be
  * event-time ordered ACROSS micro-batches — the carried state is the
  * maximum view timestamp, so an in-order stream reproduces the batch
  * join exactly (spec pins parity with [[graft.operators.Temporal
  * .a04AsofTolerance]] across 3 micro-batches, same (ts, side,
  * event_id) order WITHIN a batch as a01's window sort). A purchase
  * arriving before an older view it should have matched is
  * unrecoverable by construction — that reordering is what the batch
  * operator (or a watermark-delayed replay) is for. */
object StreamEnrich {

  def enrich(events: Dataset[EnrichEvent],
      tolSec: Long = graft.operators.Temporal.AsofToleranceSec)
      : Dataset[EnrichedPurchase] = {
    import events.sparkSession.implicits._
    val tolUs = tolSec * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[EnrichEvent], state: GroupState[Long]) =>
          // a01's window order: ts, then side (view sorts before an
          // equal-timestamp purchase — the inclusive >= match), then id
          val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.side, e.event_id))
          var lastView = state.getOption
          val out = Seq.newBuilder[EnrichedPurchase]
          sorted.foreach { e =>
            if (e.side == 0) {
              // max() guards within-batch duplicates; the cross-batch
              // order contract guarantees monotonicity between batches
              lastView = Some(lastView.fold(e.ts_us)(math.max(_, e.ts_us)))
            } else {
              val gap = lastView.map(v => e.ts_us - v)
              val fresh = gap.exists(_ <= tolUs)
              out += EnrichedPurchase(userId, e.event_id, e.ts_us,
                if (fresh) lastView else None,
                if (fresh) gap else None, fresh)
            }
          }
          lastView.foreach(state.update)
          out.result().iterator
      }
  }
}
