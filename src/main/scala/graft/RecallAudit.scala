package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality ARTIFACT emitter (round 14, verdict item 6): the recall
  * audits (s04/s07/s11/s16/s17/s24) compute per-path recall every round
  * but only spec-assert THRESHOLDS — a quality regression that stays
  * above the floor is invisible in the round artifacts. This main runs
  * every audit path at the given SF dir and writes ONE small JSON
  * (default `RECALL.json` in the cwd) with, per path: recall@3
  * (micro-averaged hits/total over the audited queries), the query
  * count, and the knob setting that produced it — plus a corpus
  * fingerprint (vector count + Σ vec_id) so a recall delta can be told
  * apart from a corpus change. Knob strings are built from the SAME
  * constants the operators default to (AnnSignBits, autoNLists,
  * PqSubspaces, S19Probes…) — the artifact cannot claim a knob the code
  * doesn't use.
  *
  * Usage: runMain graft.RecallAudit [sfDir] [outFile]
  * (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored, Bench's rule). */
object RecallAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "RECALL.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val json = audit(spark, sfDir)
      val w = new java.io.PrintWriter(out)
      try w.println(json) finally w.close()
      println(json)
    } finally spark.stop()
  }

  /** One audit pass → the JSON line (factored from main for the spec). */
  def audit(spark: SparkSession, sfDir: String): String = {
    import operators.Similarity._
    // per-query audits share the (k_exact, n_hit) schema — micro-average
    def micro(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("k_exact")), sum(col("n_hit"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def entry(name: String, knob: String, df: DataFrame): String = {
      val (nq, kTotal, nHits) = micro(df)
      val recall = if (kTotal > 0) nHits.toDouble / kTotal else 0.0
      s""""$name":{"recall_at_3":${f"$recall%.4f"},"n_queries":$nq,"knob":"$knob"}"""
    }
    val nLists = autoNLists(spark, sfDir)
    val entries = scala.collection.mutable.ListBuffer[String]()
    entries += entry("lsh_s02", s"bits=$AnnSignBits,multiProbe=true",
      s04AnnRecall(spark, sfDir))
    entries += entry("ivf_s03", s"nLists=$nLists,nProbe=2",
      s07IvfRecall(spark, sfDir))
    entries += entry("pq_s09", s"m=$PqSubspaces,k=$PqCodebookSize",
      s11PqRecall(spark, sfDir))
    entries += entry("sq8_s15", "int8-dot vs exact float-IP top-3",
      s17Sq8Recall(spark, sfDir))
    val pca = s16PcaRecall(spark, sfDir)
    Seq(8, 16, 32).foreach { sl =>
      entries += entry(s"pca_s14_sl$sl", s"kDims=16,shortlist=$sl",
        pca.filter(col("shortlist") === sl))
    }
    // s24 emits aggregates already (variant, k_total, n_hits, recall_ppm)
    s24GraphRecall(spark, sfDir).collect().foreach { r =>
      val variant = r.getString(r.fieldIndex("variant"))
      val nq = r.getLong(r.fieldIndex("n_queries"))
      val kT = r.getLong(r.fieldIndex("k_total"))
      val nH = r.getLong(r.fieldIndex("n_hits"))
      val recall = if (kT > 0) nH.toDouble / kT else 0.0
      val knob =
        if (variant.startsWith("ivf")) s"nLists=$nLists,nProbe=$S19Probes"
        else s"nLists=$nLists,nProbe=$S19Probes,refineRounds=1"
      entries +=
        s""""graph_$variant":{"recall_at_3":${f"$recall%.4f"},"n_queries":$nq,"knob":"$knob"}"""
    }
    val emb = Tables.embeddings(spark, sfDir)
      .agg(count(lit(1)), sum(col("vec_id"))).head()
    s"""{"sf":"$sfDir","corpus":{"n_vectors":${emb.getLong(0)},""" +
      s""""sum_vec_id":${emb.getLong(1)}},""" +
      s""""recall_k":3,"paths":{${entries.mkString(",")}}}"""
  }
}
