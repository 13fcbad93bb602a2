package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A document arriving at the packer: its source shard and token count. */
case class PackDoc(source: String, doc_id: Long, n_tokens: Long)

/** The packer's decision: which context-window chunk the doc's first
  * token lands in, and at which running offset it starts. */
case class PackedDoc(source: String, doc_id: Long, chunk: Long, start_off: Long)

/** Per-shard packer state: tokens consumed so far, and the highest
  * doc_id packed (to ENFORCE the in-order-arrival contract instead of
  * silently diverging from the batch layout). */
case class PackState(total_tokens: Long, last_doc_id: Long)

/** Online GPT-style sequence packing ([[graft.operators.Sampling.p05PackChunks]]
  * at ingest): each source shard keeps one running token offset in
  * RocksDB state, and every arriving document is assigned the chunk its
  * first token lands in — concatenate-and-chop, decided AS DATA ARRIVES
  * instead of in a batch layout pass. With in-order arrival (doc_id
  * order per shard) the assignment is IDENTICAL to the batch operator —
  * the spec pins that parity across micro-batch boundaries, which is
  * the property that lets a pipeline switch between batch re-packs and
  * streaming appends without re-tokenizing history.
  *
  * Scale notes: state is ONE tiny row (two longs) per shard — the
  * smallest possible keyed state; per-shard arrival order is the same
  * assumption the batch layout makes (shards are independent, so
  * cross-shard arrival order is free) — and it is ENFORCED, not
  * assumed: a doc_id at or below the shard's high-water mark fails the
  * batch loudly, because packing it would silently produce a layout no
  * batch re-pack can reproduce. Processing-time mode: packing has no
  * event-time semantics and needs no watermark or timers. */
class PackProcessor(budget: Long)
    extends StatefulProcessor[String, PackDoc, PackedDoc] {

  @transient private var fill: ValueState[PackState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    fill = getHandle.getValueState("fill", Encoders.product[PackState], TTLConfig.NONE)

  override def handleInputRows(source: String, rows: Iterator[PackDoc],
      tv: TimerValues): Iterator[PackedDoc] = {
    // deterministic within a micro-batch regardless of task ordering
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val st = if (fill.exists()) fill.get() else PackState(0L, Long.MinValue)
    var total = st.total_tokens
    sorted.headOption.filter(_.doc_id <= st.last_doc_id).foreach { d =>
      throw new IllegalStateException(
        s"out-of-order arrival on shard '$source': doc ${d.doc_id} after " +
          s"high-water mark ${st.last_doc_id} — the streamed layout would " +
          "diverge from the batch p05 layout")
    }
    // the same contract WITHIN the batch: an at-least-once source that
    // retries a doc into one micro-batch would otherwise pack it twice,
    // shifting every later offset with no signal
    sorted.iterator.zip(sorted.iterator.drop(1))
      .find { case (a, b) => a.doc_id == b.doc_id }
      .foreach { case (a, _) =>
        throw new IllegalStateException(
          s"duplicate doc ${a.doc_id} within one micro-batch on shard " +
            s"'$source' — packing it twice would silently diverge from " +
            "the batch p05 layout")
      }
    val out = sorted.map { d =>
      val assigned = PackedDoc(source, d.doc_id, total / budget, total)
      total += d.n_tokens
      assigned
    }
    fill.update(PackState(total, sorted.lastOption.map(_.doc_id)
      .getOrElse(st.last_doc_id)))
    out.iterator
  }
}

object StreamPack {
  /** Pack a stream of (source, doc_id, n_tokens) rows into
    * `budget`-token chunks, one running layout per source shard. */
  def pack(docs: Dataset[PackDoc],
      budget: Long = graft.operators.Sampling.PackBudget): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new PackProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
