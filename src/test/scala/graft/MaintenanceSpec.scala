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

  test("compaction recovers a crashed run: orphaned bak restored, stale tmp cleared") {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files.createTempDirectory("graft_compact_rec").toString
    val dir = base + "/t"
    val df = Tables.nation(spark, sf)
    df.repartition(4).write.parquet(dir)
    val n = df.count()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Simulate dying between the two renames: dataset moved to bak, no live dir,
    // plus a stale tmp from an even earlier crash.
    assert(fs.rename(new Path(dir), new Path(dir + "_compact_bak")))
    fs.mkdirs(new Path(dir + "_compact_tmp"))
    val (_, after) = Compaction.compactParquet(spark, dir, targetFileBytes = 512L * 1024)
    assert(after >= 1)
    assert(spark.read.parquet(dir).count() == n, "recovered dataset lost rows")
    assert(!fs.exists(new Path(dir + "_compact_tmp")) && !fs.exists(new Path(dir + "_compact_bak")),
      "stale tmp/bak left behind")
  }

  test("z-order layout clusters BOTH columns' per-file value ranges") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString + "/ev"
    val ev = Tables.events(spark, sf).select("user_id", "value", "event_id")
    graft.sources.Layout.zorderWrite(ev, "user_id", "value", dir, nFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // per-file spans: z-ordering 16 files over 2 dims should give each
    // file roughly a quarter of each dimension's range, far under the
    // full span a single-column sort leaves on the other column
    def spans(c: String): (Double, Double) = {
      val per = back.groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("span"))
        .collect().map(_.getDouble(1))
      val global = ev.agg((max(col(c)) - min(col(c))).cast("double")).collect().head.getDouble(0)
      (per.sum / per.length, global)
    }
    val (uSpan, uGlobal) = spans("user_id")
    val (vSpan, vGlobal) = spans("value")
    assert(uSpan < uGlobal * 0.6, s"user_id not clustered: avg $uSpan of $uGlobal")
    assert(vSpan < vGlobal * 0.6, s"value not clustered: avg $vSpan of $vGlobal")
  }

  test("salted join rejects small-side-preserving outer join types") {
    import graft.operators.SkewUtils
    val big = Tables.orders(spark, sf).select(org.apache.spark.sql.functions.col("o_custkey").as("k"))
    val small = Tables.customer(spark, sf).select(org.apache.spark.sql.functions.col("c_custkey").as("k"))
    intercept[IllegalArgumentException] {
      SkewUtils.saltedJoin(big, small, "k", salt = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewUtils.saltedJoin(big, small, "k", salt = 4, joinType = "full_outer")
    }
    // left variants remain allowed
    SkewUtils.saltedJoin(big, small, "k", salt = 4, joinType = "left_semi")
  }
}
