package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** SURVEY §2.G — d18's nightly dedup cycle AT INGEST: each arriving
  * micro-batch of documents is probed against the at-rest shingle index
  * ([[graft.operators.Dedup.d18FromIndex]] — new×old + new×new pairs,
  * never old×old) and then ABSORBED into it
  * ([[graft.operators.Dedup.d18AbsorbBatch]]) so the grown index serves
  * the next micro-batch: the build→probe→absorb cycle with "night"
  * shrunk to "micro-batch". Single-sourced with the batch surface — the
  * foreachBatch body calls the PUBLIC d18 functions, so streamed pairs
  * cannot drift from the nightly's (stream_shards' frozen-artifact rule,
  * applied to an at-rest index instead of driver values).
  *
  * Ordering hazard, made structural: d18FromIndex's DataFrame is LAZY
  * and reads the index path — if the absorb appended first, the probe
  * would see the batch on both sides and corrupt every new×new jaccard
  * (d18AbsorbBatch's documented contract). The body therefore
  * materializes the probe through an EAGER localCheckpoint (pair output
  * is report-sized, never corpus-sized) before the absorb touches disk.
  *
  * State story: NO state store — the at-rest parquet index IS the state,
  * exactly as the nightly leaves it, so a restarted query resumes from
  * the index as of the last absorbed batch (contrast stream_neardup,
  * whose LSH bucket lists live in the state store and die with the
  * checkpoint: that form owns the low-latency in-flight window, this
  * form owns durable corpus history). `batchMaxDf` carries the
  * batch-local stop-shingle cap through BOTH the probe and the absorb
  * (the capped-cycle discipline: a boilerplate-carrying micro-batch can
  * neither melt its own new×new join nor regrow hot keys in the
  * artifact).
  *
  * Reference: the tail-f arrival loop (reference
  * src/test/java/oz/poc/file/TailF.java) reacts to records one batch at
  * a time as they land; this is that arrival loop carrying d18's dedup
  * contract instead of a raw copy. */
object StreamIncDedup {

  /** Start probing the `docs` stream (needs doc_id + text) against the
    * index at `indexPath` (built once by
    * [[graft.operators.Dedup.d18BuildIndex]]); `onBatch` receives each
    * micro-batch's materialized (doc_i, doc_j, jaccard) pairs. Arrival
    * doc_ids must be disjoint from everything already in the index
    * (d18FromIndex's contract — a breach surfaces as doc_i == doc_j
    * self-pairs, the documented alert shape). */
  def run(docs: DataFrame, indexPath: String,
      batchMaxDf: Long = Dedup.NoDfCap)(
      onBatch: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.toDF()
        if (!b.isEmpty) {
          val pairs = Dedup.d18FromIndex(b.sparkSession, indexPath, b,
            batchMaxDf = batchMaxDf).localCheckpoint(true)
          onBatch(pairs)
          Dedup.d18AbsorbBatch(b, indexPath, batchMaxDf)
        }
      }
      .start()
}
