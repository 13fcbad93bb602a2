package graft.streaming

import graft.operators.{Pipelines, Sampling}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — ONLINE training-shard assignment: p12's
  * tokenize→ids→shard step applied at INGEST.
  *
  * The export's streaming twin: stream_pack assigns CHUNK offsets at
  * ingest, but nothing streamed the tokenizer itself — this does. The
  * tokenizer artifacts are FROZEN driver values a production pipeline
  * trains once and ships beside the shards (p12's memoized merge-rule
  * list + sorted vocab — the same split as stream_vecindex's frozen
  * quantizer and stream_quality's frozen weight table): each arriving
  * document is BPE-encoded with the codegen'd `graft_bpe_apply`, mapped
  * to token ids with `graft_sym_ids`, and assigned its epoch-permuted
  * range-binned shard the moment it lands — so the at-rest corpus is
  * already laid out for the trainer's loader instead of waiting for a
  * nightly export pass.
  *
  * Spark-first shape (StreamSample's precedent): foreachBatch, NO state
  * store — the assignment is a pure per-doc function of the frozen
  * artifacts, so the verdicts need no cross-batch memory. Each
  * micro-batch runs the IDENTICAL batch core
  * ([[graft.operators.Pipelines.p12DocCols]], single-sourced with the
  * p12/p14 export surfaces) + the same `graft_sym_ids` mapping, so
  * streamed (shard, token_ids) EXACTLY equal a batch pass over the same
  * documents (spec-pinned across ≥3 micro-batches). The within-shard
  * chunk cumsum deliberately stays with stream_pack — offsets need the
  * running order state; shard + ids do not. */
object StreamShards {

  /** One micro-batch's per-doc assignments — the exact batch semantics,
    * exposed for the spec and the foreachBatch body. `docs` needs
    * (doc_id, text); `rules`/`vocab` are the frozen tokenizer
    * artifacts ([[graft.operators.Pipelines.p12Rules]]/`p12Vocab`).
    * `unkId` is the `graft_sym_ids` OOV contract knob: the STREAMING
    * default is the CROSS-CORPUS mode (OOV → the reserved vocab.size
    * sentinel) because arriving text is by definition text the frozen
    * tokenizer never saw — p12's same-corpus fail-fast would let ONE
    * exotic character kill the whole streaming query and drop every
    * later arrival; pass a negative unkId to opt back into fail-fast
    * when the stream is contractually same-alphabet. In-vocab
    * documents get identical ids under both modes, so batch parity is
    * unchanged (spec-pinned). */
  private[graft] def assignments(docs: DataFrame,
      rules: Seq[(String, String)], vocab: IndexedSeq[String],
      epoch: Long = 1L, shards: Int = Sampling.ShuffleShards,
      unkId: Option[Int] = None): DataFrame =
    Pipelines.p12DocCols(docs, rules, epoch, shards)
      .withColumn("token_ids",
        graft.functions.NativeFunctions.symIds(col("enc"), vocab,
          unkId.getOrElse(vocab.size)))
      .select("doc_id", "key", "shard", "n_ids", "token_ids")

  /** Start assigning the `docs` stream against the frozen tokenizer;
    * `onBatch` receives each micro-batch's
    * (doc_id, key, shard, n_ids, token_ids) rows. */
  def run(docs: DataFrame, rules: Seq[(String, String)],
      vocab: IndexedSeq[String], epoch: Long = 1L,
      shards: Int = Sampling.ShuffleShards, unkId: Option[Int] = None)(
      onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        onBatch(assignments(batch.toDF(), rules, vocab, epoch, shards, unkId))
      }
      .start()
}
