package graft

import graft.functions.{VectorFunctions => VF}
import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class TopKSpec extends GraftSuite {

  private def scored = {
    val e = Tables.embeddings(spark, sf)
    e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VF.cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cos")
  }

  test("TopK.perGroup equals the window row_number idiom") {
    val viaTopK = TopK.perGroup(scored, Seq(col("query_id")),
        Seq(round(col("cos"), 6).desc, col("neighbor_id").asc), 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    val viaWindow = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK.size == 8 * 5)
  }

  test("plan shows partial+final heap pair with one exchange, no sort") {
    val df = TopK.perGroup(scored, Seq(col("query_id")),
      Seq(round(col("cos"), 6).desc, col("neighbor_id").asc), 5)
    df.collect()
    // AQE wraps stages in leaf QueryStageExec nodes, so inspect the string
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2 &&
      plan.contains("5, true") && plan.contains("5, false"),
      s"expected partial+final TopKPerGroup pair:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"final pass must cluster by group key:\n$plan")
    assert(!plan.contains("Sort "), s"top-k must not sort:\n$plan")
  }

  test("partial-pass flush (memory bound) preserves exactness: many groups, tiny threshold") {
    import spark.implicits._
    val prev = graft.plans.TopKPerGroupExec.MaxPartialGroups
    try {
      graft.plans.TopKPerGroupExec.MaxPartialGroups = 2 // force constant flushing
      val rnd = new scala.util.Random(7)
      val rows = (1 to 5000).map(i => (rnd.nextInt(40).toLong, i.toLong, rnd.nextDouble()))
      val df = rows.toDF("g", "id", "score").repartition(8)
      val viaTopK = TopK.perGroup(df, Seq(col("g")), Seq(col("score").desc, col("id").asc), 3)
        .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
      val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaTopK == viaWindow)
      assert(viaTopK.size == 40 * 3)
    } finally graft.plans.TopKPerGroupExec.MaxPartialGroups = prev
  }

  test("handles groups smaller than k and duplicate-score ties") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.5), (2L, 12L, 0.9))
      .toDF("g", "id", "score")
    val out = TopK.perGroup(df, Seq(col("g")),
        Seq(col("score").desc, col("id").asc), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }
}
