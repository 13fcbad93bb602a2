package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One (band_key, doc) index entry of the streaming LSH index. */
case class BandedDoc(band_key: String, doc_id: Long)

/** A bucket member with its insertion wall-clock time (for TTL expiry). */
case class SeenEntry(doc_id: Long, ts: Long)

/** A candidate near-dup pair (doc_i < doc_j), exact-verified by
  * [[StreamNearDedup.verified]] exactly like batch d03's candidates. */
case class NearDupCandidate(doc_i: Long, doc_j: Long)

/** Per-bucket state: emits a candidate against every doc already in the
  * bucket, then appends the newcomer. `maxBucket` caps the per-bucket
  * member list — the streaming analogue of the batch hot-bucket /
  * stop-shingle guard: a degenerate band key (boilerplate corpus) stops
  * accumulating state and stops emitting quadratic candidates past the
  * cap instead of melting the state store.
  *
  * `ttlMs` (≤ 0 = keep forever) bounds state AGE the way
  * [[StreamDedup]]'s watermark bounds its key set: entries older than
  * the TTL stop producing candidates and are compacted out of the list
  * on the next access; re-arrivals past the TTL re-index like new docs
  * (the standard bounded-state trade). Expiry is wall-clock and applied
  * EAGERLY per access (the list is capped at `maxBucket` entries, so
  * the rewrite is O(maxBucket)) — this keeps the operator drivable
  * batch-by-batch (processAllAvailable, AvailableNow backfills), but
  * reclaims a COLD bucket's rows only when that band key is touched
  * again. The full (rate × ttl) state bound therefore needs
  * `nativeTtl` (see [[StreamNearDedup.candidates]]): with it, the
  * state store itself expires rows via TTLConfig under
  * TimeMode.ProcessingTime — the deployment mode — at the price of a
  * micro-batch engine that runs continuously to advance its clock
  * (which is why tests default to the manual path).
  *
  * `clock` is injectable so TTL specs can advance time deterministically
  * instead of sleeping (local-mode executors share the JVM). */
class LshBucketProcessor(maxBucket: Int, ttlMs: Long,
    nativeTtl: Boolean = false,
    clock: () => Long = () => System.currentTimeMillis())
    extends StatefulProcessor[String, BandedDoc, NearDupCandidate] {

  @transient private var seen: ListState[SeenEntry] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[SeenEntry]("seen", Encoders.product[SeenEntry],
      if (nativeTtl && ttlMs > 0) TTLConfig(Duration.ofMillis(ttlMs))
      else TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandedDoc],
      tv: TimerValues): Iterator[NearDupCandidate] = {
    val now = clock()
    val all = scala.collection.mutable.ArrayBuffer.empty[SeenEntry]
    val it = seen.get()
    while (it.hasNext) all += it.next()
    val members = all.filter(e => ttlMs <= 0 || now - e.ts < ttlMs)
    val expiredSome = members.length != all.length
    val added = scala.collection.mutable.ArrayBuffer.empty[SeenEntry]
    val ids = scala.collection.mutable.HashSet.empty[Long]
    members.foreach(e => ids += e.doc_id)
    val out = Seq.newBuilder[NearDupCandidate]
    rows.foreach { r =>
      if (!ids.contains(r.doc_id)) {
        ids.foreach { m =>
          out += NearDupCandidate(math.min(m, r.doc_id), math.max(m, r.doc_id))
        }
        if (members.length + added.length < maxBucket) {
          added += SeenEntry(r.doc_id, now)
          ids += r.doc_id
        }
      }
    }
    if (expiredSome) seen.put((members ++ added).toArray) // compact expired out
    else added.foreach(seen.appendValue)
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
  * multi-band cost), bounded in AGE by the `ttl` knob and per-bucket by
  * `maxBucket`; [[verified]] closes the loop IN-stream — candidates
  * join the at-rest doc store and only exact-Jaccard-confirmed pairs
  * (batch d03's own verify predicate) reach the sink. */
object StreamNearDedup {

  /** Candidate pairs from a stream of documents with `doc_id` + `text`
    * columns. Emits each (earlier, newcomer) bucket collision once per
    * band; consumers dedupe via DISTINCT or an idempotent verify.
    * Banding comes from [[graft.operators.Dedup.minhashBandKeys]] — the
    * same code batch d03 runs, not a copy. With `ttl` set, bucket
    * entries older than the duration stop producing candidates; set
    * `nativeTtl = true` in deployment so the state store also RECLAIMS
    * cold buckets' rows (TTLConfig + processing-time mode — the (rate ×
    * ttl) state bound; the default manual mode only compacts a bucket
    * when its band key is touched again, and exists because
    * processing-time mode cannot be driven batch-by-batch in tests —
    * see [[LshBucketProcessor]]). */
  def candidates(docs: DataFrame, maxBucket: Int = 64,
      ttl: Option[Duration] = None, nativeTtl: Boolean = false,
      clock: () => Long = () => System.currentTimeMillis())
      : Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    graft.operators.Dedup.minhashBandKeys(docs)
      .select(concat_ws(":", col("band"), col("key")).as("band_key"),
        col("doc_id"))
      .as[BandedDoc]
      .groupByKey(_.band_key)
      .transformWithState(
        new LshBucketProcessor(maxBucket, ttl.map(_.toMillis).getOrElse(0L),
          nativeTtl, clock),
        if (nativeTtl && ttl.isDefined) TimeMode.ProcessingTime()
        else TimeMode.None(),
        OutputMode.Append())
  }

  /** VERIFIED near-dup pairs, in-stream: [[candidates]] joined against
    * the at-rest document store (a stream-static equi-join on each pair
    * side) and kept only when exact shingle Jaccard ≥ `minJaccard` —
    * batch d03's verify predicate over the SAME
    * [[graft.operators.Dedup.shingleSets]] shingle sets, so a confirmed
    * online pair is exactly a batch-confirmable pair (spec-pinned).
    *
    * Emission is exactly-once per pair modulo multi-band collisions
    * WITHIN the arrival micro-batch (a pair's 16 band checks all fire
    * in the batch where its later doc arrives): duplicates are
    * value-identical rows, and dedup-decision sinks are idempotent by
    * (doc_i, doc_j) — the same contract as batch d03's DISTINCT, paid
    * per-batch instead of with unbounded pair state. At scale the
    * static side is the compacted corpus table; the join shuffles the
    * (tiny) candidate stream to it by doc id.
    *
    * ORDERING CONTRACT: the store must already contain a doc when its
    * candidates are verified — candidates fire in the arrival batch and
    * are emitted ONCE, and the inner join silently drops a pair whose
    * doc the store has not yet ingested. Wire ingestion UPSTREAM of
    * verification (the [[Ingest]] path appends the batch's docs before
    * this join runs, e.g. in the same foreachBatch), or buffer
    * candidates until the store catches up; a lagging store loses
    * pairs, not just delays them. */
  def verified(docs: DataFrame, docStore: DataFrame,
      minJaccard: Double = 0.2, maxBucket: Int = 64,
      ttl: Option[Duration] = None): DataFrame = {
    val sh = graft.operators.Dedup.shingleSets(docStore)
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    candidates(docs, maxBucket, ttl).toDF()
      .join(sh.select(col("doc_id").as("doc_i"), col("sh").as("sh_i")), "doc_i")
      .join(sh.select(col("doc_id").as("doc_j"), col("sh").as("sh_j")), "doc_j")
      .withColumn("jaccard", inter / (size(col("sh_i")) + size(col("sh_j")) - inter))
      .filter(coalesce(col("jaccard") >= minJaccard, lit(false)))
      .select(col("doc_i"), col("doc_j"), round(col("jaccard"), 4).as("jaccard"))
  }
}
