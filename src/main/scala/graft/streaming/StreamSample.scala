package graft.streaming

import graft.functions.{TextFunctions => TF}
import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE score-tiered sampling: p13b's keep/drop verdict
  * applied at INGEST.
  *
  * The DCLM loop's last stage moves to arrival time: the classifier is
  * trained offline (t28), the quartile CUT SCORES are estimated offline
  * (p13's stride-sample pass — a scheduled job, like the quantizer
  * refit), and every arriving document gets its tier and keep/drop
  * verdict the moment it lands — so the at-rest corpus is already
  * sampled, instead of ingesting everything and nightly re-sampling.
  *
  * Spark-first shape (StreamQuality's precedent): weight table + cut
  * scores are STATIC (broadcast join + literals), each micro-batch runs
  * the IDENTICAL batch pieces — [[TextAnalysis.quantizedDocScores]] for
  * the integer score (single-sourced with the t28 bridge and
  * stream_quality) and [[Sampling.p13TierCol]]/`p13KeepPpmCol`/
  * `p13KeptCol` for the decision (single-sourced with the gated batch
  * rollup) — foreachBatch, no state store. Everything is integer
  * arithmetic on a deterministic fingerprint, so streamed verdicts are
  * EXACTLY a batch pass over the same documents (spec-pinned across
  * micro-batches). */
object StreamSample {

  /** One micro-batch's per-doc verdicts — the exact batch semantics,
    * exposed for the spec and the foreachBatch body. `docs` needs
    * (doc_id, source, text). */
  private[graft] def verdicts(docs: DataFrame, weights: DataFrame,
      interceptQ: Long, cuts: (Long, Long, Long)): DataFrame = {
    val base = docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("fp",
        graft.functions.NativeFunctions.polyFingerprint(col("toks")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    TextAnalysis.quantizedDocScores(base, weights, interceptQ,
        carry = Seq("source", "fp", "n_tok"))
      .withColumn("tier", Sampling.p13TierCol(cuts._1, cuts._2, cuts._3))
      .withColumn("keep_ppm", Sampling.p13KeepPpmCol)
      .withColumn("kept", Sampling.p13KeptCol)
      .select("doc_id", "source", "score_q", "tier", "kept")
  }

  /** Start sampling the `docs` stream against the trained table and the
    * offline-estimated cut scores; `onBatch` receives each micro-batch's
    * (doc_id, source, score_q, tier, kept) verdicts. */
  def run(docs: DataFrame, weights: DataFrame, interceptQ: Long,
      cuts: (Long, Long, Long))(onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(verdicts(batch.toDF(), weights, interceptQ, cuts))
      }
      .start()
}
