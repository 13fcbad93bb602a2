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

  test("p10 near-dup build: keep rule, accounting, and drop set match a driver recompute") {
    val cleaned = Pipelines.cleanCorpus(spark, sf).cache()
    try {
      val report = Pipelines.p10NeardupCorpus(spark, sf).collect()
      assert(report.nonEmpty)
      // per-group accounting: kept + dropped = cleaned population
      val cleanedCounts = cleaned.groupBy("lang", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      report.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_neardup_dropped")
          == cleanedCounts(key), s"accounting broken for $key")
      }
      assert(report.map(r => (r.getString(0), r.getString(1))).toSet
        == cleanedCounts.keySet)
      // driver recompute of the drop set: union-find over the verified
      // pair graph, component-min survives (d01 keep rule)
      val pairs = graft.operators.Dedup
        .minhashVerifiedPairs(cleaned.select(col("doc_id"), col("text")))
        .select("doc_i", "doc_j").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, "fixture must produce at least one near-dup pair")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) { if (ri < rj) parent(rj) = ri else parent(ri) = rj }
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expectedDrops = members.filter(m => find(m) != m).toSet
      assert(expectedDrops.nonEmpty)
      val droppedTotal = report.map(_.getAs[Long]("n_neardup_dropped")).sum
      assert(droppedTotal == expectedDrops.size,
        s"drop count ${droppedTotal} != union-find ${expectedDrops.size}")
    } finally cleaned.unpersist()
  }

  test("p11 repair agrees with the d10 detector and never touches train") {
    import org.apache.spark.sql.functions._
    val report = Pipelines.p11LeakageRepair(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs_before"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_docs_after"))).toMap
    // single-sourcing: dropped-per-split must equal the detector's flag
    // count per split — the repair can never disagree with d10
    val flagged = graft.operators.Dedup.d10CrossSplitLeakage(spark, sf)
      .groupBy(col("split")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    report.foreach { case (split, (before, dropped, after)) =>
      assert(before == dropped + after, s"$split accounting broken")
      if (split == "train") assert(dropped == 0L, "train must pass through")
      else assert(dropped == flagged.getOrElse(split, 0L),
        s"$split dropped $dropped != detector ${flagged.getOrElse(split, 0L)}")
    }
    assert(report.contains("train") && report.keySet.subsetOf(Set("train", "val", "test")))
  }
}
