package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data pipeline: the "switch to graft" user story in
  * one call. Chains the gated primitives — quality scoring, language
  * filtering, exact dedup canonical-pick, fingerprint split — into the
  * standard corpus-cleaning flow. Everything stays one declarative plan:
  * Catalyst fuses the map-side stages (tokenize→score→filter→fingerprint)
  * into a single scan pass, and the only shuffles are the dup-group
  * window and the output split — the same plan a hand-fused pipeline
  * would want at 100 TB. */
object Pipelines {

  /** Clean + split: drop short/low-quality docs, keep requested langs,
    * collapse exact dups to their canonical doc, assign train/val/test.
    * Returns the cleaned corpus with `quality`, `fingerprint`, `split`. */
  def cleanCorpus(spark: SparkSession, dir: String,
      langs: Seq[String] = Seq("en", "es", "de", "fr", "zh"),
      minTokens: Int = 10, minQuality: Double = 0.3): DataFrame = {
    val toks: Column = TF.tokens(col("text"))
    val nTok: Column = size(col("toks"))
    val quality: Column =
      least(nTok / 100.0, lit(1.0)) * 0.5 + (TF.stopwordHits(col("toks")) / nTok) * 0.5
    val norm: Column = lower(regexp_replace(trim(col("text")), "\\s+", " "))
    val bucket: Column = pmod(col("fingerprint"), lit(100L))
    val w = Window.partitionBy(col("dup_group"))

    Tables.documents(spark, dir)
      .filter(col("lang").isin(langs: _*))
      .withColumn("toks", toks)
      .filter(nTok >= minTokens)
      .withColumn("quality", round(quality, 4))
      .filter(coalesce(col("quality") >= minQuality, lit(false)))
      .withColumn("dup_group", md5(norm))
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
      .filter(col("is_canonical"))
      .withColumn("fingerprint", graft.functions.NativeFunctions.polyFingerprint(col("toks")))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .select("doc_id", "lang", "source", "text", "quality", "fingerprint", "split")
  }
}
