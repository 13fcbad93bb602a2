package graft.sources

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the maintenance op every long-running ingest
  * needs: streaming sinks and per-batch writers leave thousands of tiny
  * parquet files whose open/footer overhead dominates scans at scale.
  * Rewrites a parquet directory into ~`targetFileBytes` files by
  * repartitioning on actual data size, atomically via write-to-temp +
  * swap (a table format would make the swap transactional; the
  * rewrite-and-redirect shape is the same). */
object Compaction {

  /** Returns (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(dir + "_compact_tmp")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val bak = new Path(dir + "_compact_bak")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    (before.length, parquetFiles().length)
  }
}
