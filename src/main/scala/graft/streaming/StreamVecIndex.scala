package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of the IVF vector index (SURVEY §2.G): newly
  * ingested embeddings are assigned to their inverted list AT ARRIVAL and
  * appended to the at-rest index, so similarity search serves fresh
  * vectors without an offline rebuild — the batch/stream split every
  * production vector service runs (the coarse quantizer retrains OFFLINE
  * and rarely; assignments stream continuously against the frozen
  * centroids; s03Index's persisted table is the batch-built base the
  * stream extends).
  *
  * Assignment is one map-side pass per micro-batch: squared-euclidean
  * argmin against the ≤ nLists broadcast centroid literals — the same
  * metric the batch KMeans assignment uses, so streamed rows land in the
  * same lists batch processing would put them in (spec-pinned against a
  * driver recompute). Each batch writes its own `v=<batchId>` version dir
  * (StreamRollup's commit rule: parquet _SUCCESS is the marker,
  * same-version overwrite makes foreachBatch replay idempotent); readers
  * union all committed versions. At 100 TB/day the version dirs are the
  * compaction input `sources.Compaction` already handles, and the drift
  * signal that schedules a quantizer refit is the per-list count skew in
  * [[indexStats]]. */
object StreamVecIndex {

  /** Squared-euclidean argmin list assignment against centroid literals
    * (ties to the lower list id — array_position returns the first
    * minimum). */
  private[graft] def listIdOf(emb: Column,
      cents: IndexedSeq[Array[Float]]): Column = {
    val dists = array(cents.map { c =>
      aggregate(zip_with(emb, typedLit(c.toSeq),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, v) => a + v)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Start maintaining `indexDir` from a stream of (vec_id: long,
    * embedding: array<float>) rows, assigning against the given frozen
    * centroids (ordered by list id — e.g. s03Index's centroid table). */
  def maintain(vectors: DataFrame, cents: IndexedSeq[Array[Float]],
      indexDir: String, checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(col("vec_id"), col("embedding"),
            listIdOf(col("embedding"), cents).as("list_id"))
          .repartition(col("list_id"))
          .write.mode("overwrite").parquet(s"$indexDir/v=$batchId")
        ()
      }
      .start()

  /** All committed streamed index rows (vec_id, embedding, list_id). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    StreamRollup.committedVersions(spark, indexDir) match {
      case vs if vs.isEmpty =>
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("vec_id", LongType),
            StructField("embedding", ArrayType(FloatType)),
            StructField("list_id", IntegerType))))
      case vs => vs.map(v => spark.read.parquet(s"$indexDir/v=$v"))
        .reduce(_ unionByName _)
    }

  /** Per-list membership counts of the streamed index — the drift signal
    * that schedules an offline quantizer refit (a hot list means the
    * frozen centroids no longer cover the incoming distribution). */
  def indexStats(spark: SparkSession, indexDir: String): DataFrame =
    readIndex(spark, indexDir)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_vecs"))
      .orderBy("list_id")
}
