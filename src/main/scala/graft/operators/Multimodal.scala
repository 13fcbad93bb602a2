package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.F — multimodal binary-column plumbing.
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside. The container has no image/audio codecs, so the decode step
  * is a clearly-marked deterministic STUB ([[fakeDecode]]); everything
  * Spark-side — schema, batch iteration via mapPartitions, partition
  * sizing, typed output — is real and spec-tested, and a real decoder
  * drops into [[fakeDecode]] without touching the plan shape.
  */
object Multimodal {

  /** m01: binary payload metadata — byte length + SHA-256 digest + mime —
    * pure map-side column work (length/sha2 are codegen'd; at 100 TB this
    * is a single scan with no shuffle but the output ORDER BY). */
  def m01BinaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast("binary")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      length(bin).cast("long").as("n_bytes"),
      sha2(bin, 256).as("digest"),
      lit("text/plain").as("mime"))
      .orderBy("doc_id")
  }

  /** Typed metadata extracted from one media payload. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
    n_frames: Int, format: String)

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec (none ship in this container). Derives plausible metadata from
    * payload bytes only, so results are stable across runs/partitions.
    * A real implementation replaces this body with e.g. an ImageIO /
    * ffmpeg call over the same byte array. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    MediaMeta(docId, payload.length.toLong,
      width = 64 + (b0 % 64) * 16,
      height = 64 + (b1 % 64) * 16,
      n_frames = 1 + (payload.length % 8),
      format = if (b0 % 2 == 0) "png" else "jpeg")
  }

  /** Decode pipeline: binary batches → typed metadata via mapPartitions
    * (one decoder init per partition, streaming iterator — never
    * materializes a partition in memory). Repartitions by doc_id so a
    * 100 TB corpus spreads decode work evenly regardless of input file
    * layout. Spec-only: not DuckDB-expressible. */
  def decodePipeline(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(col("doc_id"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real pipelines hoist per-partition codec init here
        batch.map { case (id, payload) => fakeDecode(id, payload) }
      }
  }

  /** One inference result; `batch_size` records the actual batch the row
    * was scored in (spec-observable). */
  case class InferenceResult(doc_id: Long, embedding: Array[Float], batch_size: Int)

  /** STUB batch model — deterministic fake embedding per payload, shaped
    * like a real encoder call: takes the WHOLE batch at once (vectorized
    * hardware wants fixed-size batches, not row-at-a-time). */
  def fakeModel(batch: Seq[(Long, Array[Byte])]): Seq[InferenceResult] =
    batch.map { case (id, payload) =>
      val v = Array.tabulate(8)(i =>
        ((payload.length * 31 + i * 7 + (if (payload.nonEmpty) payload(0) else 0)) % 97) / 97.0f)
      InferenceResult(id, v, batch.length)
    }

  /** Batched inference over binary payloads: mapPartitions →
    * `grouped(batchSize)` → model per batch. The iterator stays lazy
    * (no partition materialization); at 100 TB batch size is the knob
    * that trades accelerator utilization against latency, and partition
    * count spreads model replicas across executors. */
  def batchedInference(spark: SparkSession, dir: String,
      batchSize: Int = 32): Dataset[InferenceResult] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipelines load the model once per partition here
        it.grouped(batchSize).flatMap(b => fakeModel(b))
      }
  }

  val oracle: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS digest,
         'text/plain' AS mime
         FROM documents ORDER BY doc_id""",
  )
}
