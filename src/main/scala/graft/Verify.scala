package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional 3rd arg: comma-separated query-name filter (local iteration).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // scan-task sizing parity with Bench (see Bench.scala's A/B note)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION", "128m"))
      // broadcast sizing parity with Bench (see Bench.scala): the gate
      // must execute the same plans the bench times
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BCAST", "10485760"))
      // shuffled-hash-over-SMJ parity with Bench (rationale there)
      .config("spark.sql.join.preferSortMergeJoin",
        (sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "0") == "1").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferFiltersFromGenerate re-inlines the full generator expression
      // into a pre-Generate filter; for the interpreted higher-order-fn
      // shingle/minhash arrays that re-runs tokenization per row (~5x
      // slower at sf0.1). The rule only prunes empty arrays — safe to drop.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Shared-intermediate oracle forms for the heavy family (r14) —
    // consumed by scripts/check_heavy.py for the docs16x gate; the
    // driver's own gate keeps reading oracle_sql.json unchanged.
    val shared = {
      val prel = OracleShared.prelude
        .map { case (n, s) => s"[${q(n)}, ${q(s)}]" }.mkString("[", ",", "]")
      val qs = OracleShared.queries
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      val dir = OracleShared.direct.map(q).mkString("[", ",", "]")
      s"""{"prelude": $prel, "queries": $qs, "direct": $dir}"""
    }
    Files.writeString(Paths.get(s"$outDir/oracle_shared.json"), shared)
    spark.stop()
  }
}
