package graft

import org.apache.spark.sql.functions._

/** Pins the invariants the docs-at-scale gate's honesty rests on
  * (ScaleGen.generateDocs — DEPLOY.md "Document-sections gate at
  * docs4x"). If replication ever silently broke disjointness or the
  * embedding roll stopped being a permutation, the 4x gate would
  * degrade into measuring synthetic-input pathology (N-way exact-dup
  * cliques) instead of the operators — these specs make that loud.
  */
class ScaleGenSpec extends GraftSuite {
  import spark.implicits._

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen-docs").toString
    ScaleGen.generateDocs(spark, sf, dir, 3)
    dir
  }

  test("docs replicas: key spaces shifted collision-free, rows 3x") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val rep = spark.read.parquet(s"$out/documents.parquet")
    assert(rep.count() === 3 * base.count())
    assert(rep.select("doc_id").distinct().count() === rep.count())
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.select("vec_id").distinct().count() === emb.count())
    // the vec_id = doc_id contract survives replication: every vector's
    // id resolves to a document in the SAME replica
    val orphans = emb.join(rep, emb("vec_id") === rep("doc_id"), "left_anti")
    assert(orphans.count() === 0, "vectors detached from their documents")
  }

  test("docs replicas are token-disjoint but whitespace-identical") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val rep = spark.read.parquet(s"$out/documents.parquet")
    // distinct token multiplicity: every token value lives in exactly
    // one replica, so corpus-wide distinct tokens = 3x base distinct
    def distinctTokens(df: org.apache.spark.sql.DataFrame): Long = df
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).distinct().count()
    assert(distinctTokens(rep) === 3 * distinctTokens(base))
    // whitespace skeleton (every non-whitespace run erased) is preserved
    // byte-for-byte — the newline/paragraph structure d15/t20/t24/t11
    // depend on survives replication
    val baseWs = base.select((col("doc_id") % lit(1L << 62)).as("k"),
      regexp_replace(col("text"), "\\S+", "").as("ws"))
    val stride = base.agg(max(col("doc_id"))).as[Long].head() + 1L
    val repWs = rep.select(pmod(col("doc_id"), lit(stride)).as("k"),
      regexp_replace(col("text"), "\\S+", "").as("ws"))
    val mismatch = repWs.join(baseWs.withColumnRenamed("ws", "base_ws"), "k")
      .filter(col("ws") =!= col("base_ws")).count()
    assert(mismatch === 0)
  }

  test("embedding roll is a coordinate permutation: within-replica dot products exact") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    // vec_id shifts by the DOCUMENT stride (vec_id = doc_id keyspace)
    val stride = spark.read.parquet(s"$sf/documents.parquet")
      .agg(max(col("doc_id"))).as[Long].head() + 1L
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    // pick two fixed base vectors; for each replica the rolled pair's
    // dot product must equal the base pair's BIT-FOR-BIT (same addends
    // in rotated order is NOT enough for floats — the roll keeps the
    // element-wise pairing, so the addend multiset AND the summation
    // order of functions.aggregate are both rotations; compare against
    // a rotation-insensitive exact reference: sum of exact products as
    // BigDecimal)
    def vec(df: org.apache.spark.sql.DataFrame, id: Long): Array[Float] =
      df.filter(col("vec_id") === id).select("embedding")
        .as[Array[Float]].head()
    val ids = base.select("vec_id").orderBy("vec_id").as[Long].take(2)
    def exactDot(a: Array[Float], b: Array[Float]): BigDecimal =
      a.zip(b).map { case (x, y) =>
        BigDecimal(x.toDouble) * BigDecimal(y.toDouble) }.sum
    val baseDot = exactDot(vec(base, ids(0)), vec(base, ids(1)))
    (0 until 3).foreach { i =>
      val d = exactDot(vec(emb, ids(0) + i * stride), vec(emb, ids(1) + i * stride))
      assert(d === baseDot, s"replica $i dot product drifted")
    }
    // and the roll really moved coordinates for i>0 (not a no-op copy)
    assert(!vec(emb, ids(0) + stride).sameElements(vec(base, ids(0))))
  }
}
