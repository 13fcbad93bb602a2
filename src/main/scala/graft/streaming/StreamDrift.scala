package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE distribution-drift monitoring: t31's per-source
  * L1 statistic scored at ingest against a FROZEN release blend.
  *
  * The batch t31 compares each source to the corpus it sits in; the
  * ingest question is different and sharper — "do today's arrivals
  * still look like the release we trained the pipeline on?" So the
  * blend (token → count) is built ONCE from the at-rest corpus
  * ([[graft.operators.TextAnalysis.t31Blend]] over the release's token
  * counts — the stream_vecindex frozen-quantizer split) and every
  * micro-batch scores its per-source arrivals against it through the
  * IDENTICAL single-sourced core ([[graft.operators.TextAnalysis.t31Drift]]).
  * Tokens the release has never seen hit the core's LEFT join at
  * ppm_c = 0, so brand-new vocabulary counts fully toward drift — the
  * crawler-regression / language-shift signal this monitor exists for.
  * foreachBatch, no state store; the blend is a static broadcast-build
  * side at any corpus size (≤ |vocab| aggregate rows). */
object StreamDrift {

  /** Start the monitor over the `docs` stream (needs `source`, `text`)
    * against a frozen (tok, nc) blend whose total token count is
    * `corpTotal`. `onBatch` receives (batchId, per-source drift rows in
    * t31's exact output schema). */
  def run(docs: DataFrame, blend: DataFrame, corpTotal: Long)
      (onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val tot = batch.sparkSession.range(1)
          .select(lit(corpTotal).as("corp_total"))
        onBatch(id, graft.operators.TextAnalysis.t31Drift(batch, blend, tot))
      }
      .start()
}
