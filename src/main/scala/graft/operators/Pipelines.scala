package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF, TextSql => TS}
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

  /** p03: the [[cleanCorpus]] composition, GATED — per-(lang, split)
    * doc and source counts after the full clean → dedup → split chain.
    * Integer-only output, so the gate pins the whole pipeline (filter
    * thresholds, canonical pick, fingerprint buckets) with zero
    * float-rounding surface. This is the "switch to graft" flagship
    * verified end-to-end against the oracle, not just spec-pinned. */
  def p03CleanCorpus(spark: SparkSession, dir: String): DataFrame =
    cleanCorpus(spark, dir)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang", "split")

  val oracle: Map[String, String] = {
    val toks = TS.toks
    val quality =
      s"""round(least(len($toks) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
            * CAST(0.5 AS DOUBLE)
          + (${TS.markerHits(toks, TF.stopwords)} / len($toks))
            * CAST(0.5 AS DOUBLE), 4)"""
    Map(
      "p03_clean_corpus" ->
        s"""WITH q AS (
              SELECT doc_id, lang, source, text
              FROM documents
              WHERE lang IN ('en', 'es', 'de', 'fr', 'zh')
                AND len($toks) >= 10
                AND $quality >= 0.3),
            c AS (
              SELECT doc_id, lang, source, text
              FROM q
              QUALIFY doc_id = min(doc_id) OVER (PARTITION BY
                md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))),
            s AS (
              SELECT lang, source,
                CASE WHEN (${TS.polyFingerprint(toks)}) % 100 < 80 THEN 'train'
                     WHEN (${TS.polyFingerprint(toks)}) % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split
              FROM c)
            SELECT lang, split, COUNT(*) AS n_docs,
              COUNT(DISTINCT source) AS n_sources
            FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    )
  }
}
