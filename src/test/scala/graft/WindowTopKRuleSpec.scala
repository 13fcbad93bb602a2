package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-top-k rewrite: `row_number().over(...) <= k` must be fed
  * by the partial/final heap operator instead of a full per-partition
  * sort, without changing results, and without double-wrapping plans
  * that already use TopKPerGroup by hand. */
class WindowTopKRuleSpec extends GraftSuite {

  // count LOGICAL TopKPerGroup nodes: AQE QueryStageExec nodes hide
  // their subtrees from physical-plan collect
  private def countTopK(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case t: graft.plans.TopKPerGroup => t
    }.size

  test("row_number <= k rewrites to the heap operator with identical results") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val df = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .select("c_mktsegment", "rn", "c_custkey")
    assert(countTopK(df) == 1, "expected the heap operator in the optimized plan")
    // ground truth via plain Scala
    val expect = Tables.customer(spark, sf)
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (seg, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(4).zipWithIndex
          .map { case (r, i) => (seg, i + 1, r._2) }
      }.toSet
    val got = df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expect, "rewrite changed the top-k result")
  }

  test("GLOBAL row_number <= k (no partitionBy) rewrites and still runs") {
    // empty partitionSpec: the final heap demands AllTuples, not the
    // invalid ClusteredDistribution(Nil) — this shape used to throw at
    // planning time
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val df = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select("rn", "c_custkey")
    assert(countTopK(df) == 1, "expected the heap operator for global top-k")
    val expect = Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(r => (-r._2, r._1)).take(7).zipWithIndex
      .map { case (r, i) => (i + 1, r._1) }.toSet
    val got = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == expect, "global rewrite changed the top-k result")
  }

  test("rn = 1 argmax idiom rewrites; rn = 2 (middle rank) does not") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val argmax = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(countTopK(argmax) == 1, "rn = 1 must rewrite to the heap")
    val expect = Tables.customer(spark, sf).collect()
      .groupBy(_.getAs[String]("c_mktsegment"))
      .map { case (_, rs) =>
        rs.maxBy(r => (r.getAs[Double]("c_acctbal"), -r.getAs[Long]("c_custkey")))
          .getAs[Long]("c_custkey")
      }.toSet
    assert(argmax.collect().map(_.getAs[Long]("c_custkey")).toSet == expect,
      "argmax rewrite changed the result")
    val middle = Tables.customer(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
    assert(countTopK(middle) == 0, "rn = 2 selects a middle rank — no rewrite")
  }

  test("rank() (non-row_number) windows are left alone") {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val df = Tables.customer(spark, sf)
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 4)
    assert(countTopK(df) == 0, "rank() must not be heap-rewritten (ties)")
  }

  test("hand-written TopK.perGroup + rank window is not double-wrapped") {
    // s01 is exactly that pattern; one heap node, not two
    assert(countTopK(graft.operators.Similarity.s01KnnBrute(spark, sf)) == 1)
  }
}
