package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming twin of q38's incremental rollup (SURVEY §2.G): maintain
  * the (event_type, day) daily state AT INGEST instead of by scheduled
  * batch maintenance. Each micro-batch folds into the stored state with
  * the SAME [[graft.operators.Relational.mergeDailyState]] the batch
  * operator uses — one merge definition, so batch maintenance and
  * streaming maintenance cannot drift (the stream_pack/stream_neardup
  * single-sourcing rule applied to aggregation state).
  *
  * State lives as VERSIONED parquet (`v=<batchId>`), one version per
  * micro-batch, committed by parquet's own _SUCCESS marker; readers pick
  * the highest committed version. foreachBatch may replay a batch id
  * after a crash — the overwrite of the SAME version directory makes the
  * fold idempotent, so the state is exactly-once without a table format.
  * At 100 TB/day the state stays days × types rows (KBs): each
  * micro-batch costs one delta aggregation + a tiny union-merge, never
  * a history rescan, and the store never grows past `keepVersions`. */
object StreamRollup {

  private val stateSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("day", DateType),
    StructField("n_events", LongType),
    StructField("cents", LongType)))

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** The latest committed state (empty with the state schema before the
    * first batch commits). */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    committedVersions(spark, stateDir) match {
      case vs if vs.isEmpty =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          stateSchema)
      case vs => spark.read.schema(stateSchema).parquet(s"$stateDir/v=${vs.max}")
    }

  /** Start maintaining `stateDir` from a stream of raw events
    * (`ts: timestamp`, `event_type: string`, `value: double`). */
  def maintain(events: DataFrame, stateDir: String, checkpointDir: String,
      keepVersions: Int = 3): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val next = graft.operators.Relational
          .mergeDailyState(readState(spark, stateDir), batch)
        // same-version overwrite = idempotent on foreachBatch replay
        next.coalesce(1).write.mode("overwrite")
          .parquet(s"$stateDir/v=$batchId")
        // retire old versions (never the one just written)
        val f = fs(spark, stateDir)
        committedVersions(spark, stateDir).sorted.dropRight(keepVersions)
          .filter(_ != batchId)
          .foreach(v => f.delete(
            new org.apache.hadoop.fs.Path(s"$stateDir/v=$v"), true))
        ()
      }
      .start()
}
