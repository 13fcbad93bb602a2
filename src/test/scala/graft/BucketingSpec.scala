package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** SURVEY §5: pre-bucketed fact tables join co-located — the shuffle
  * happens once at write time and every subsequent join on the bucket
  * key is exchange-free. At 100 TB this converts the dominant recurring
  * cost of fact⋈fact joins into a one-time layout decision. */
class BucketingSpec extends GraftSuite {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      Tables.orders(spark, sf).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      Tables.lineitem(spark, sf).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bkt")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          spark.table("lineitem_bkt")("l_orderkey") === spark.table("orders_bkt")("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val n = joined.count()
      assert(n == Tables.lineitem(spark, sf).count(), "join lost rows")
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val nShuffles = plan.collect { case s: ShuffleExchangeLike => s }.size
      assert(nShuffles == 0,
        s"bucketed join should be exchange-free, found $nShuffles shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
