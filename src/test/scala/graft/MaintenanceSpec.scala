package graft

import java.sql.Timestamp
import graft.sources.Compaction
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class MaintenanceSpec extends GraftSuite {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming dedup suppresses repeats within the watermark") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamDedup.dedup(input.toDF().toDF("ts", "text"))
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "alpha beta"), (ts(1), "alpha  beta"), (ts(2), "gamma"))
      q.processAllAvailable()
      input.addData((ts(3), "ALPHA BETA"), (ts(4), "delta"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").collect().map(_.getAs[String]("text")).toSeq
      // normalization: whitespace-collapsed, case-folded repeats suppressed
      assert(texts.count(_.toLowerCase.replaceAll("\\s+", " ") == "alpha beta") == 1,
        s"normalized repeat not suppressed: $texts")
      assert(texts.exists(_ == "gamma") && texts.exists(_ == "delta"))
    } finally q.stop()
  }

  test("compaction collapses many small parquet files and preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val df = Tables.orders(spark, sf)
    df.repartition(40).write.parquet(dir) // simulate small-file buildup
    val sumBefore = spark.read.parquet(dir).agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      .collect().head.getDouble(0)
    val (before, after) = Compaction.compactParquet(spark, dir, targetFileBytes = 512L * 1024)
    assert(before == 40 && after < before, s"no compaction: $before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    val sumAfter = back.agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      .collect().head.getDouble(0)
    assert(math.abs(sumAfter - sumBefore) < 1e-6)
  }
}
