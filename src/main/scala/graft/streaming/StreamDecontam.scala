package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE decontamination: batch d10 at ingest.
  *
  * An LLM pipeline that trains continuously cannot re-run corpus-wide
  * decontamination per refresh; the contamination decision is per-doc
  * against the AT-REST train index, so it belongs at ingest: each
  * arriving document is shingled, probed against the static index, and
  * flagged the moment it arrives.
  *
  * Spark-first shape: the train shingle index is a STATIC DataFrame (at
  * 100 TB a written, compacted table — [[graft.operators.Dedup
  * .d10TrainIndex]] built from the same split rule batch d10 uses) and
  * every micro-batch runs the IDENTICAL batch scoring —
  * [[graft.operators.Dedup.d10Prepared]] then `d10Contamination`, the
  * very code d10's gate hash-verifies — via foreachBatch (the Wiretap
  * precedent: per-batch plan rebuild, no state store; decontamination
  * needs no cross-batch state because each doc's verdict depends only on
  * the static index). The per-batch join is the same left-semi shingle
  * equi-join as batch d10 — per-shingle work, never doc × corpus.
  *
  * The split filter mirrors d10's gate semantics (only val/test docs are
  * scored); a deployment screening EVERY arrival against the train
  * corpus passes `evalOnly = false` — same plan, no split gate.
  */
object StreamDecontam {

  /** Start the decontamination stream over `docs` (needs `doc_id` +
    * `text`). `onBatch` receives each micro-batch's flagged rows in
    * batch d10's exact output schema. */
  def run(docs: DataFrame, trainShingles: DataFrame,
      threshold: Double = 0.3, evalOnly: Boolean = true)
      (onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val prep = graft.operators.Dedup.d10Prepared(batch)
        val scored = if (evalOnly) prep.filter(col("split") =!= "train") else prep
        onBatch(graft.operators.Dedup.d10Contamination(
          scored, trainShingles, threshold))
      }
      .start()
}
