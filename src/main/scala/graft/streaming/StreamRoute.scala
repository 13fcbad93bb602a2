package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE code/prose ROUTING: t32's structural detector
  * applied per micro-batch at ingest.
  *
  * A mixed crawl routes arrivals to the right pipeline (code and prose
  * want different dedup spans, tokenizers, quality filters) the moment
  * they arrive — the verdict is a stateless per-doc predicate (symbol
  * density in integer ppm), so like stream_funnel it belongs at intake,
  * not in a nightly rescan. foreachBatch over the arrivals, each batch
  * running the IDENTICAL single-sourced production core
  * ([[graft.operators.TextAnalysis.t32CodeDetectOf]]) — the stream
  * cannot drift from the batch report. No state store; the per-batch
  * plan is one map-side regexp strip + a ≤|sources| rollup.
  *
  * A sudden jump in a source's `code_share_ppm` between batches is the
  * routing tripwire this monitor exists for: a prose crawler that
  * starts emitting markup/minified payloads flags within one batch. */
object StreamRoute {

  /** Start routing the `docs` stream (needs `source`, `text`; the
    * batch core excludes empty/NULL texts itself — no routing signal,
    * and its ppm division needs len > 0). `onBatch` receives
    * (batchId, per-source routing report in t32's exact output
    * schema). */
  def run(docs: DataFrame)(onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        onBatch(id, graft.operators.TextAnalysis.t32CodeDetectOf(batch.toDF()))
      }
      .start()
}
