package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.io.{BytesWritable, IntWritable}
import org.apache.hadoop.mapred.SequenceFileAsBinaryInputFormat
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop SequenceFile compatibility for the reference's at-rest format
  * (CompressedSequenceFile.java:107-200, IngestTest.java:60-140): a
  * SequenceFile of (IntWritable, byte[]-writable) records where each
  * value is a GZIP-compressed batch of newline-joined text lines —
  * the format a migrating user's existing corpus is stored in.
  *
  * Reading goes through [[SequenceFileAsBinaryInputFormat]], which
  * returns each record's RAW serialized bytes without instantiating the
  * writable classes named in the file header. That matters: the
  * reference declares its own `ImmutableBytesWritable` value class,
  * which is not (and should not be) on this classpath — raw mode reads
  * those files anyway, because every BytesWritable-shaped writable
  * serializes as [4-byte length][payload]. Batches decompress per
  * record inside the scan tasks (gzip detected by magic bytes, plain
  * batches passed through), so a 100 TB corpus decodes with full
  * cluster parallelism: SequenceFiles are block-splittable via their
  * sync markers even when each VALUE is gzip-compressed — unlike .gz
  * text files, which force one task per whole file. */
object SeqFile {

  /** Read a reference-produced SequenceFile (or directory of them) into
    * a one-line-per-row DataFrame (column `line`). */
  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.sparkContext.hadoopFile(path,
      classOf[SequenceFileAsBinaryInputFormat],
      classOf[BytesWritable], classOf[BytesWritable])
    // copyBytes BEFORE the flatMap: Hadoop record readers reuse the
    // writable instance between records
    raw.map { case (_, v) => v.copyBytes() }
      .flatMap(decodeBatch)
      .toDF("line")
  }

  /** Write lines as a reference-compatible SequenceFile: values are
    * gzip batches of `batchSize` newline-joined lines (the reference's
    * producer/consumer buffer, CompressedSequenceFile.java:165-185),
    * keys are the batch index within the partition (the reference
    * writes a constant key; an index is strictly more informative and
    * nothing reads it back). One output file per partition — the
    * distributed analogue of the reference's N virtual writers. */
  def writeSequenceFile(df: DataFrame, path: String,
      batchSize: Int = 1000): Unit = {
    val lines = df.rdd.map(_.getString(0))
    lines.mapPartitions { it =>
      it.grouped(batchSize).zipWithIndex.map { case (batch, i) =>
        (new IntWritable(i), new BytesWritable(gzip(
          batch.mkString("", "\n", "\n").getBytes("UTF-8"))))
      }
    }.saveAsNewAPIHadoopFile(path, classOf[IntWritable], classOf[BytesWritable],
      classOf[SequenceFileOutputFormat[IntWritable, BytesWritable]])
  }

  /** One raw serialized record value → its text lines. The raw writable
    * form is [4-byte big-endian length][payload]; a length prefix can
    * only alias the gzip magic for a ≥ 520 MB record, so "gzip magic at
    * offset 0" reliably means a bare (unprefixed) payload. Gunzips when
    * the payload carries the gzip magic, passes plain batches through. */
  private[graft] def decodeBatch(bytes: Array[Byte]): Iterator[String] = {
    val payload =
      if (isGzip(bytes, 0) || bytes.length < 4) bytes
      else java.util.Arrays.copyOfRange(bytes, 4, bytes.length)
    val in =
      if (isGzip(payload, 0)) new GZIPInputStream(new ByteArrayInputStream(payload))
      else new ByteArrayInputStream(payload)
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }

  private def isGzip(b: Array[Byte], off: Int): Boolean =
    b.length >= off + 2 && b(off) == 0x1f.toByte && b(off + 1) == 0x8b.toByte

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** The reference's `prepareFile` seed replicator
    * (CompressedSequenceFile.java:96-107: copy a seed file's lines N
    * times into one big corpus), distributed: the N copies are a
    * `spark.range` cross join, so generation parallelizes instead of
    * appending through a single BufferedWriter. Returns rows written. */
  def replicateSeed(spark: SparkSession, seedPath: String, copies: Int,
      outPath: String): Long = {
    import org.apache.spark.sql.functions.col
    val seed = spark.read.text(seedPath)
    spark.range(copies.toLong)
      .crossJoin(seed)
      .select(col("value").as("line"))
      .write.mode("overwrite").text(outPath)
    spark.read.text(outPath).count()
  }
}
