package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic distributed-FS read/write round-trips (SURVEY §2.B `hdfs_rw`;
  * reference HdfsReadWriteSample.java). Path strings carry the scheme —
  * `hdfs://`, `s3a://`, `file://` — so the same calls run unchanged on a
  * cluster; formats are the built-in DataSource V2 implementations, which
  * keep predicate pushdown and column pruning (parquet/orc) intact. */
object FsIO {

  val formats: Seq[String] = Seq("parquet", "orc", "csv", "json", "text")

  /** Columnar compression codecs exercised by the round-trip spec — the
    * at-rest compression choice the reference hard-wires to gzip
    * (CompressedSequenceFile.java); columnar formats make it a write
    * option, transparent on read. zstd is the 100 TB default (gzip-class
    * ratio at snappy-class speed). */
  val parquetCodecs: Seq[String] = Seq("snappy", "zstd", "gzip")

  def write(df: DataFrame, path: String, format: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.mode("overwrite").options(options).format(format).save(path)

  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.options(options).format(format).load(path)

  /** Write `df` at `dir/<format>` then read it back. csv keeps the header
    * for schema names; text requires a single string column. */
  def roundTrip(df: DataFrame, dir: String, format: String): DataFrame = {
    val opts = format match {
      case "csv" => Map("header" -> "true", "inferSchema" -> "true")
      case _ => Map.empty[String, String]
    }
    val path = s"$dir/$format"
    write(df, path, format, opts)
    read(df.sparkSession, path, format, opts)
  }
}
