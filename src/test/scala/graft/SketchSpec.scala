package graft

import org.apache.spark.sql.functions._

/** Sketch accuracy: the approx aggregates are the 100 TB swap-ins for the
  * exact forms used by the oracle-gated queries (q09 countDistinct, q20
  * percentile). These specs pin the error contract that justifies the
  * swap: HLL++ within its rsd, t-digest percentile within a small
  * quantile error — both partial-aggregable, both constant memory. */
class SketchSpec extends GraftSuite {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val row = Tables.lineitem(spark, sf).agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).collect().head
    val exact = row.getAs[Long]("exact").toDouble
    val approx = row.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL error too large: exact=$exact approx=$approx")
  }

  test("approx_percentile close to exact percentile on events.value") {
    val row = Tables.events(spark, sf).agg(
      expr("percentile(value, 0.5)").as("exact_p50"),
      expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"),
      expr("percentile(value, 0.95)").as("exact_p95"),
      expr("approx_percentile(value, 0.95, 10000)").as("approx_p95")).collect().head
    def rel(e: Double, a: Double) = math.abs(a - e) / math.max(math.abs(e), 1e-9)
    assert(rel(row.getDouble(0), row.getDouble(1)) < 0.05)
    assert(rel(row.getDouble(2), row.getDouble(3)) < 0.05)
  }
}
