package graft

import graft.operators.Pipelines
import org.apache.spark.sql.functions._

class PipelinesSpec extends GraftSuite {

  test("cleanCorpus output respects every stage's contract") {
    val out = Pipelines.cleanCorpus(spark, sf).cache()
    try {
      val n = out.count()
      assert(n > 0 && n <= Tables.documents(spark, sf).count())
      // quality floor and language whitelist hold
      assert(out.filter(col("quality") < 0.3).count() == 0)
      assert(out.filter(!col("lang").isin("en", "es", "de", "fr", "zh")).count() == 0)
      // dedup: normalized texts are unique after canonical-pick
      val texts = out.select(lower(regexp_replace(trim(col("text")), "\\s+", " "))).collect()
      assert(texts.map(_.getString(0)).distinct.length == n)
      // split assignment is total and deterministic
      val splits = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(splits.values.sum == n)
      assert(splits.keySet.subsetOf(Set("train", "val", "test")))
      val out2 = Pipelines.cleanCorpus(spark, sf)
      assert(out2.count() == n, "pipeline not deterministic")
    } finally out.unpersist()
  }

  test("cleanCorpus fuses map stages into one scan (single pre-window shuffle)") {
    val plan = Pipelines.cleanCorpus(spark, sf).queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"pipeline should read documents exactly once:\n$plan")
  }
}
