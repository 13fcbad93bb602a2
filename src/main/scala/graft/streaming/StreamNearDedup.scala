package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One (band_key, doc) index entry of the streaming LSH index. */
case class BandedDoc(band_key: String, doc_id: Long)

/** A candidate near-dup pair (doc_i < doc_j), to be exact-verified
  * downstream exactly like batch d03's candidates. */
case class NearDupCandidate(doc_i: Long, doc_j: Long)

/** Per-bucket state: emits a candidate against every doc already in the
  * bucket, then appends the newcomer. `maxBucket` caps the per-bucket
  * member list — the streaming analogue of the batch hot-bucket /
  * stop-shingle guard: a degenerate band key (boilerplate corpus) stops
  * accumulating state and stops emitting quadratic candidates past the
  * cap instead of melting the state store. */
class LshBucketProcessor(maxBucket: Int)
    extends StatefulProcessor[String, BandedDoc, NearDupCandidate] {

  @transient private var seen: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandedDoc],
      tv: TimerValues): Iterator[NearDupCandidate] = {
    val members = scala.collection.mutable.ArrayBuffer.empty[Long]
    val it = seen.get()
    while (it.hasNext) members += it.next()
    val out = Seq.newBuilder[NearDupCandidate]
    rows.foreach { r =>
      if (!members.contains(r.doc_id)) {
        members.foreach { m =>
          out += NearDupCandidate(math.min(m, r.doc_id), math.max(m, r.doc_id))
        }
        if (members.length < maxBucket) {
          members += r.doc_id
          seen.appendValue(r.doc_id)
        }
      }
    }
    out.result().iterator
  }
}

/** SURVEY §2.G — ONLINE MinHash-LSH near-dedup: the streaming counterpart
  * of batch d03, for dedup-at-ingest (flag a near-dup the moment it
  * arrives instead of re-running batch dedup over the grown corpus).
  *
  * Map-side per doc: tokens → native shingle hashes → native 32-element
  * MinHash signature → 16 band keys of 2 rows, EXACTLY d03's banding
  * (same a/b constants, same band-key arithmetic), so the streaming
  * candidate set equals what batch d03's candidate stage would produce
  * over the same documents (spec-pinned). Each (band_key, doc) row then
  * shuffles by band key — the same linear-by-bucket shape as the batch
  * equi-join — into a [[LshBucketProcessor]] keeping bucket membership
  * in the RocksDB state store.
  *
  * At 100 TB/day: state is the LSH INDEX (16 entries/doc — the classic
  * multi-band cost), so production sets a TTL/compaction policy the
  * same way [[StreamDedup]] bounds its exact-dup keys by watermark;
  * candidates are a tiny stream that a downstream exact-Jaccard join
  * (against the doc store) verifies — identical semantics to d03's
  * verify stage, and idempotent under the duplicate candidates that
  * multi-band collisions produce. */
object StreamNearDedup {

  /** Candidate pairs from a stream of documents with `doc_id` + `text`
    * columns. Emits each (earlier, newcomer) bucket collision once per
    * band; consumers dedupe via DISTINCT or an idempotent verify.
    * Banding comes from [[graft.operators.Dedup.minhashBandKeys]] — the
    * same code batch d03 runs, not a copy. */
  def candidates(docs: DataFrame, maxBucket: Int = 64): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    graft.operators.Dedup.minhashBandKeys(docs)
      .select(concat_ws(":", col("band"), col("key")).as("band_key"),
        col("doc_id"))
      .as[BandedDoc]
      .groupByKey(_.band_key)
      .transformWithState(new LshBucketProcessor(maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
