package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE quality scoring: the trained classifier (t28's
  * exported table) applied at ingest.
  *
  * A pipeline that trains its quality classifier offline (t28) scores
  * NEW documents the moment they arrive — the verdict is per-doc
  * against a static model, so like decontamination it belongs at ingest,
  * not in a nightly rescan. Spark-first shape (the StreamDecontam
  * precedent): the quantized weight table is a STATIC broadcast side,
  * each micro-batch runs the IDENTICAL batch scoring core
  * ([[graft.operators.TextAnalysis.quantizedDocScores]] — integer
  * score = intercept + Σ w(token), flag = score > 0), foreachBatch, no
  * state store. All-integer arithmetic makes streamed verdicts EXACTLY
  * equal to a batch pass over the same documents (spec-pinned across
  * micro-batches). At 100 TB/day the weight table is a few thousand
  * rows — a broadcast build side forever — and the per-batch plan is
  * one explode + broadcast join + partial-agg sum. */
object StreamQuality {

  /** Start scoring the `docs` stream (needs `doc_id`, `source`, `text`)
    * against a trained (t: string, w: long) table and quantized
    * intercept. `onBatch` receives each micro-batch's per-doc verdicts
    * in the batch core's exact output schema. */
  def run(docs: DataFrame, weights: DataFrame, interceptQ: Long)
      (onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(graft.operators.TextAnalysis.quantizedDocScores(
          batch, weights, interceptQ))
      }
      .start()
}
