package graft

// scratch: does Dataset.count() prune away aggregate computation for
// 1-row-output queries (flattering the bench)? Times count() vs a
// collect-style action for suspect shapes, and prints the optimized
// count() plan so the pruning is visible rather than inferred.
import org.apache.spark.sql.SparkSession

object CountPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin",
        (sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "0") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q06_forecast_revenue", "q16_scalar_subquery", "q37_table_profile",
        "q44_promo_share", "q25_disjunctive_revenue")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count(); fn(spark, sfDir).collect() // warm
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val tCount = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, sfDir).collect()
      val tCollect = (System.nanoTime() - t1) / 1e9
      println(f"$n%-28s count $tCount%6.3f s   collect $tCollect%6.3f s   ratio ${tCollect / tCount}%5.2f")
    }
    spark.stop()
  }
}
