package graft

import graft.operators.{Dedup, Pipelines, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** The pure-SQL drive of the operator library (GraftExtensions table
  * functions): every invocation below goes through `spark.sql` ONLY —
  * the Scala calls exist solely as the equality oracle. */
class SqlSurfaceSpec extends GraftSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("graft_clean_corpus: the cleaning pipeline drives from SQL alone") {
    val sql = rows(spark.sql(s"SELECT * FROM graft_clean_corpus('$sf')"))
    assert(sql == rows(Pipelines.cleanCorpus(spark, sf)))
    assert(sql.nonEmpty)
  }

  test("graft_filtered_knn / graft_knn_graph: similarity search drives from SQL alone") {
    assert(rows(spark.sql(s"SELECT * FROM graft_filtered_knn('$sf')")) ==
      rows(Similarity.s18FilteredKnn(spark, sf)))
    assert(rows(spark.sql(s"SELECT * FROM graft_knn_graph('$sf')")) ==
      rows(Similarity.s19KnnGraph(spark, sf)))
  }

  test("TVF knob arguments: a pure-SQL user tunes k/thresholds (round 12)") {
    // explicit k, pinned ≡ the Scala call at the same knob — and
    // genuinely deeper than the default (not a silently-ignored arg)
    val knn5 = rows(spark.sql(s"SELECT * FROM graft_filtered_knn('$sf', 5)"))
    assert(knn5 == rows(Similarity.s18FilteredKnn(spark, sf, 5)))
    assert(knn5.size > rows(spark.sql(
      s"SELECT * FROM graft_filtered_knn('$sf')")).size,
      "k = 5 must return deeper result lists than the default 3")
    assert(rows(spark.sql(s"SELECT * FROM graft_knn_graph('$sf', 5)")) ==
      rows(Similarity.s19KnnGraph(spark, sf, 5)))
    // cleaning thresholds from SQL: same rows as the Scala knobs
    assert(rows(spark.sql(s"SELECT * FROM graft_clean_corpus('$sf', 40, 0.5)")) ==
      rows(Pipelines.cleanCorpus(spark, sf, Pipelines.CleanLangs, 40, 0.5)))
    // arity range is validated loudly
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_filtered_knn('$sf', 5, 7)").collect()
    }
    assert(ex.getMessage.contains("1 to 2"))
    // a non-integer knob is refused, not coerced
    val ex2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_filtered_knn('$sf', 'five')").collect()
    }
    assert(ex2.getMessage.contains("integer literal"))
  }

  test("graft_release_datasheet: the staged release's datasheet drives from SQL alone") {
    val work = java.nio.file.Files.createTempDirectory("sqlrel").toString
    // Scala call first: stages the release artifacts; the SQL read then
    // serves from the same workDir (p20's resume contract)
    val scala = rows(Pipelines.p21ReleaseDatasheet(spark, sf, work))
    assert(scala.nonEmpty)
    assert(rows(spark.sql(
      s"SELECT * FROM graft_release_datasheet('$sf', '$work')")) == scala)
  }

  test("graft_score_sample / graft_corpus_datasheet: curation reports drive from SQL alone") {
    assert(rows(spark.sql(s"SELECT * FROM graft_score_sample('$sf')")) ==
      rows(Sampling.p13ScoreSample(spark, sf)))
    assert(rows(spark.sql(s"SELECT * FROM graft_corpus_datasheet('$sf')")) ==
      rows(Pipelines.p21CorpusDatasheet(spark, sf)))
  }

  test("graft_d18_probe: the nightly dedup probe drives from SQL alone") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val arrivals = docs.filter(col("doc_id") % 3 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("sqld18").toString
    Dedup.d18BuildIndex(base, s"$root/index")
    arrivals.write.parquet(s"$root/arrivals")
    val sql = rows(spark.sql(
      s"SELECT * FROM graft_d18_probe('$root/index', '$root/arrivals')"))
    assert(sql == rows(Dedup.d18FromIndex(spark, s"$root/index", arrivals)))
    assert(sql.nonEmpty, "fixture must surface cross-side pairs")
    // the df caps ride through as trailing knobs (round 12)
    assert(rows(spark.sql(
      s"SELECT * FROM graft_d18_probe('$root/index', '$root/arrivals', 3, 3)")) ==
      rows(Dedup.d18FromIndex(spark, s"$root/index", arrivals, 3L, 3L)))
  }

  test("graft_benchmark_decontam: the ad-hoc decontamination check drives from SQL alone") {
    // an external "published eval suite": half quoted verbatim from the
    // corpus (must flag), half synthetic-clean (must not)
    val bench = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 120)
      .limit(8)
      .select((col("doc_id") * 2).as("bench_id"),
        substring(col("text"), 5, 100).as("text"))
      .unionByName(spark.range(4).select(
        (col("id") * 2 + 1).as("bench_id"),
        concat(lit("synthetic question "), col("id"),
          lit(" with vocabulary no corpus document contains whatsoever"))
          .as("text")))
    val root = java.nio.file.Files.createTempDirectory("sqld16").toString
    bench.write.parquet(s"$root/bench")
    val benchDf = spark.read.parquet(s"$root/bench")
      .select(col("bench_id"), col("text"))
    val sql = rows(spark.sql(
      s"SELECT * FROM graft_benchmark_decontam('$sf', '$root/bench')"))
    assert(sql == rows(Dedup.d16BenchmarkDecontam(spark, sf, benchDf, 0.3, 0L)),
      "SQL surface diverged from the Scala production entry")
    assert(sql.nonEmpty)
    // knobs ride through: tau + the broadcast-Bloom prefilter
    assert(rows(spark.sql(
      s"SELECT * FROM graft_benchmark_decontam('$sf', '$root/bench', 0.1, 4096)")) ==
      rows(Dedup.d16BenchmarkDecontam(spark, sf, benchDf, 0.1, 4096L)),
      "knob form diverged from the Scala call at the same knobs")
  }

  test("table functions COMPOSE with plain SQL: joins, filters, aggregates") {
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    // the cleaned corpus joined back against the raw table, all in SQL
    val got = spark.sql(
      s"""SELECT c.split, COUNT(*) AS n, SUM(length(d.text)) AS raw_chars
         |FROM graft_clean_corpus('$sf') c JOIN docs_v d USING (doc_id)
         |GROUP BY c.split ORDER BY c.split""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Pipelines.cleanCorpus(spark, sf)
      .groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, s"composed SQL diverged: $got vs $want")
    // argument validation fails loudly, not silently
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM graft_clean_corpus(42)").collect()
    }
    assert(ex.getMessage.contains("string literal"))
  }
}
