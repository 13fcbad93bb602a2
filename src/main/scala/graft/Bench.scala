package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Verify.scala: Generate-inferred filters re-run tokenization
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup at the smallest SF so measured times reflect
    // steady-state execution, not whichever query runs first; sorted
    // order keeps run-to-run timings comparable.
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // INTERLEAVED timing passes (all queries once, then all again, ×3),
    // per-query min. Back-to-back min-of-2 let a single transient
    // contention window on a shared box poison BOTH samples of whatever
    // ran inside it (a 0.6 s query once recorded 16.8 s); interleaving
    // separates a query's samples by a full suite pass (~30 s), so the
    // min survives any noise window shorter than that.
    val passes = Seq.fill(3)(queries.map { case (name, fn) => name -> timed(fn) })
    val results = queries.map { case (name, _) =>
      name -> passes.map(_.toMap.apply(name)).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Optional baseline ledger (scripts/bench_baseline.py): when present,
    // also emit per-query graft/baseline ratios so "within 2x of
    // baseline" is a versioned, reproducible comparison.
    val sfName = sfDir.reverse.takeWhile(_ != '/').reverse
    val ledger = Seq(".", "/root/repo")
      .map(d => new java.io.File(d, s"BASELINE_duckdb_$sfName.json"))
      .find(_.exists()).getOrElse(new java.io.File("/nonexistent"))
    val ratioFields = if (!ledger.exists()) "" else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(ledger)
      val base = root.get("queries")
      val ratios = results.flatMap { case (name, sec) =>
        Option(base.get(name)).map(b => name -> sec / b.asDouble())
      }
      val rs = ratios.map { case (k, v) => s"\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val baseTotal = root.get("total").asDouble()
      s""","baseline_engine":${root.get("engine")},"baseline_total":$baseTotal""" +
        s""","total_vs_baseline":${f"${total / baseTotal}%.4f"},"vs_baseline":$rs"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$ratioFields}""")
    spark.stop()
  }
}
