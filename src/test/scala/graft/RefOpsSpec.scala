package graft

import graft.operators.RefOps

class RefOpsSpec extends GraftSuite {

  test("r01 counts every table, all non-empty") {
    val rows = RefOps.r01RecordCount(spark, sf).collect()
    assert(rows.length == Tables.all.length)
    rows.foreach(r => assert(r.getAs[Long]("n_records") > 0,
      s"${r.getAs[String]("tbl")} empty"))
  }

  test("r01 footer-metadata counts equal the scan counts exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[Long]("n_records"))).toSet
    assert(pairs(RefOps.r01RecordCountMeta(spark, sf)) ==
      pairs(RefOps.r01RecordCountScan(spark, sf)))
  }

  test("r03 per-pattern counts differ and the never-match pattern is zero") {
    val counts = RefOps.r03GrepCount(spark, sf).collect()
      .map(r => r.getAs[String]("pattern") -> r.getAs[Long]("n_matches")).toMap
    assert(counts("zzz_never_matches") == 0L)
    assert(counts("spark") > 0L)
    // regression for the col.toString bug: patterns must NOT all agree
    assert(counts.values.toSet.size > 1, s"all patterns matched identically: $counts")
  }

  test("r04 finder results all contain both substrings") {
    val ids = RefOps.r04RecordFinder(spark, sf).collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    val docs = Tables.documents(spark, sf).collect()
    docs.filter(r => ids.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      val t = r.getAs[String]("text")
      assert(t.contains("window") && t.contains("hash"))
    }
  }

  test("r05 cdr parse round-trips event counts") {
    val n = RefOps.r05CdrParse(spark, sf).collect().map(_.getAs[Long]("n_lines")).sum
    assert(n == Tables.events(spark, sf).count())
  }

  test("r06 codec: packed multi-line batches decode and line-scan like SampleMapRed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.{NativeFunctions => NF}
    // reference shape: each record is a base64+gzip BATCH of newline-
    // separated lines, decoded then tokenized per line (SampleMapRed.java:26-31)
    val batches = Seq(
      (1L, "alpha line\nOleg and Tom appear here\nbeta line"),
      (2L, "nothing to see\nstill nothing"),
      (3L, "Oleg and Tom\nOleg and Tom again"))
    val packed = batches.toDF("batch_id", "payload")
      .withColumn("rec", NF.gzip64(col("payload")))
      .select("batch_id", "rec")
    val hits = packed
      .withColumn("line", explode(split(NF.gunzip64(col("rec")), "\n")))
      .filter(col("line").contains("Oleg and Tom"))
      .groupBy("batch_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 3L -> 2L))
    // malformed packed record yields null, not a task failure
    val bad = Seq("not base64 at all!", "QUJD").toDF("rec")
      .select(NF.gunzip64(col("rec")).as("d")).collect()
    assert(bad.forall(_.isNullAt(0)))
  }
}
