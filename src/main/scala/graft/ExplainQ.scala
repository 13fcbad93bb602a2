// scratch: dump formatted plan for queries. sbt "runMain graft.ExplainQ d02_ngram_jaccard"
// SPARK_GRAFT_SF_DIR picks the data (default sf0.01); the plan is printed
// AFTER an execution so AQE's final physical choices are visible.
package graft
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = ToolConf(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      // shuffled-hash-over-SMJ parity with Bench (rationale there)
      .config("spark.sql.join.preferSortMergeJoin",
        (sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "0") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // collect() (results are gated-small) runs df's OWN QueryExecution so
      // the printed plan is AQE-final; count() would plan a separate query
      // and leave this one isFinalPlan=false
      df.collect()
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
