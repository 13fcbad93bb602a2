package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF, TextSql => TS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators — the reproducibility
  * layer of a training-data pipeline. Both key off the portable document
  * fingerprint (polynomial hash mod 1e9+7, SURVEY §6) rather than rand():
  * the same document lands in the same sample/split on every engine,
  * every run, every cluster size — and membership is a pure map-side
  * predicate, so sampling 100 TB is a filtered scan, not a shuffle. */
object Sampling {

  private def withFp(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("fp", graft.functions.NativeFunctions.polyFingerprint(col("toks")))

  /** p01: stratified 10% sample — per-language totals vs sampled counts
    * (fingerprint % 100 < 10). The output audits the per-stratum rate. */
  def p01StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    withFp(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(pmod(col("fp"), lit(100L)) < 10, 1L).otherwise(0L)).as("n_sampled"))
      .orderBy("lang")

  /** p02: train/val/test split by fingerprint bucket (80/10/10) —
    * assignment counts per (lang, split). */
  def p02HashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(col("fp"), lit(100L))
    withFp(spark, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")
  }

  val oracle: Map[String, String] = {
    val fp = TS.polyFingerprint(TS.toks)
    Map(
      "p01_stratified_sample" ->
        s"""SELECT lang, COUNT(*) AS n_total,
            CAST(SUM(CASE WHEN ($fp) % 100 < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
            FROM documents GROUP BY lang ORDER BY lang""",
      "p02_hash_split" ->
        s"""SELECT lang,
            CASE WHEN ($fp) % 100 < 80 THEN 'train'
                 WHEN ($fp) % 100 < 90 THEN 'val'
                 ELSE 'test' END AS split,
            COUNT(*) AS n_docs
            FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    )
  }
}
