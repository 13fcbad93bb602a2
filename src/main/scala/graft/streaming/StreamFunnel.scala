package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE filter-funnel attribution: p17's observability
  * report computed per micro-batch at ingest.
  *
  * A production intake wants to see WHERE arriving documents die while
  * they arrive — a crawler source gone bad (wrong language, truncated
  * bodies) shows up as a funnel shift within one batch, hours before a
  * nightly batch report would surface it. Per-doc flags are stateless
  * map-side predicates, so the twin is the StreamQuality shape:
  * foreachBatch over the arrivals, each batch running the IDENTICAL
  * single-sourced pieces the batch report runs
  * ([[graft.operators.Pipelines.p17Flags]] →
  * [[graft.operators.Pipelines.p17FunnelOf]]) — the stream cannot
  * drift from the report it previews. No state store.
  *
  * Scope honesty: stage 4 (exact-dedup survivors) counts distinct
  * dup-groups WITHIN the batch — cross-batch dedup is an indexed-state
  * problem and lives in stream_incdedup/d18, not in a funnel preview.
  * Stages 1–3 are per-doc predicates and match the batch report on any
  * slicing (spec-pinned: per-batch rows equal the batch operator run
  * over the same slice, and stage-1 inputs sum to the docs streamed). */
object StreamFunnel {

  /** Start the funnel over the `docs` stream (needs `lang`, `text`;
    * `doc_id` recommended for the dedup stage's group hash). `onBatch`
    * receives (batchId, the 4-row funnel report for that batch). */
  def run(docs: DataFrame)(onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(id, graft.operators.Pipelines.p17FunnelOf(
          graft.operators.Pipelines.p17Flags(batch)))
      }
      .start()
}
