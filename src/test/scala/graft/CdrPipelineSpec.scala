package graft

import scala.collection.mutable
import graft.streaming.{Ingest, Wiretap}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end reference-fidelity test: CDR/syslog lines in the exact
  * shape IngestTest.java:112 writes (`<pri> ts {set}[user]: EVENT: proto
  * n (NAME) application: app, iface:srcip:sport -> dstip:dport`) flow
  * through batch ingest → structured parse → wiretap routing, proving
  * the reference's full ingest→search→tap story composes on graft. */
class CdrPipelineSpec extends GraftSuite {

  private def cdrLine(i: Int): String = {
    val user = 100 + (i % 5)
    val proto = i % 7
    f"<${i % 32}> 2013-01-0${1 + i % 9} 10:0$i:00 {CGN-SET${i % 4}}[USER$user]: NAT44: proto $proto (TCP) application: http, ge-1/0/$i:10.0.0.$i:${4000 + i} -> 126.247.0.${i % 256}:80"
  }

  test("batch: ingest CDR text, parse fields, grep the reference IP") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdr").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/cdr.log"),
      (0 until 200).map(cdrLine).mkString("\n").getBytes)
    assert(Ingest.ingestText(spark, s"$dir/in", s"$dir/parquet") == 200)
    val parsed = spark.read.parquet(s"$dir/parquet")
      .withColumn("user", regexp_extract(col("line"), "\\[USER(\\d+)\\]", 1).cast("long"))
      .withColumn("proto", regexp_extract(col("line"), "proto (\\d+)", 1).cast("long"))
      .withColumn("dst", regexp_extract(col("line"), "-> ([\\d.]+):", 1))
    assert(parsed.filter(col("user").isNull || col("proto").isNull).count() == 0)
    // RecordFinderMap.java:50 looks for substring 126.247.0.97
    val hits = parsed.filter(col("dst") === "126.247.0.97").count()
    assert(hits == 200 / 256 + (if (97 < 200 % 256) 1 else 0))
    assert(parsed.select("user").distinct().count() == 5)
  }

  test("streaming: wiretap taps CDR lines per-subscriber like RealTimeCdrWiretap") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val wt = new Wiretap
    wt.register("proto3-watcher", "proto 3 ")
    wt.register("user102-watcher", "\\[USER102\\]")
    val got = mutable.Buffer.empty[(String, String)]
    val q = wt.routeDynamic(input.toDF(), b =>
      got.synchronized { got ++= b.collect().map(r => (r.getString(0), r.getString(1))) })
    try {
      input.addData((0 until 50).map(cdrLine): _*)
      q.processAllAvailable()
      val bySub = got.groupBy(_._1).view.mapValues(_.size).toMap
      assert(bySub("proto3-watcher") == (0 until 50).count(_ % 7 == 3))
      assert(bySub("user102-watcher") == (0 until 50).count(_ % 5 == 2))
      got.foreach { case (sub, line) =>
        if (sub == "proto3-watcher") assert(line.contains("proto 3 "))
        else assert(line.contains("[USER102]"))
      }
    } finally q.stop()
  }
}
