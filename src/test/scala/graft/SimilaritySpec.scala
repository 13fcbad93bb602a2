package graft

import graft.operators.Similarity

class SimilaritySpec extends GraftSuite {

  /** The driver-side reference cosine every similarity spec recomputes
    * against: float→double per element, one left-fold — the engine's
    * native accumulation order. ONE definition, so a change to the
    * reference math cannot silently fork the specs. */
  private def driverCos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark/DuckDB `round` semantics (HALF_UP on the exact double). */
  private def rnd(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("s01 returns exactly 5 ranked neighbors per query, cosine descending") {
    val rows = Similarity.s01KnnBrute(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == Similarity.NumQueries)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q: ${rs.length} neighbors")
      val cos = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"query $q not descending")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q), s"query $q returned itself")
    }
  }

  test("signBucket degrades gracefully on short vectors (no ANSI crash)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 64-dim uses all 8 bits; 40-dim can only resolve bits 0-3 (indices up
    // to 2*3+33=39); 10-dim resolves none -> bucket 0. Mirrors DuckDB's
    // out-of-bounds list index -> NULL -> CASE gives 0.
    val vecs = Seq(
      (64, (1 to 64).map(i => (if (i % 2 == 0) i else -i).toFloat).toArray),
      (40, (1 to 40).map(_.toFloat).toArray),
      (10, (1 to 10).map(_.toFloat).toArray))
    val out = vecs.toDF("dim", "embedding")
      .select(col("dim"), graft.functions.VectorFunctions.signBucket(col("embedding")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(64) >= 0 && out(64) < 256)
    assert(out(40) < 16, s"40-dim should only set bits 0-3, got ${out(40)}")
    assert(out(10) == 0L, s"10-dim should bucket to 0, got ${out(10)}")
  }

  test("s04 recall audit covers every query with recall in [0,1]") {
    val rows = Similarity.s04AnnRecall(spark, sf).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      assert(r.getAs[Long]("k_exact") == 3)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= 3)
    }
  }

  test("s02 ANN results are true neighbors (bucket-mates, never self)") {
    val rows = Similarity.s02AnnLsh(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("s05 multi-table recall dominates single-table s02 and never beats exact") {
    def top3Set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .filter(_.getAs[Long]("rk") <= 3L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = top3Set(Similarity.s01KnnBrute(spark, sf))
    val single = top3Set(Similarity.s02AnnLsh(spark, sf))
    val multi = top3Set(Similarity.s05AnnMultiTable(spark, sf))
    assert(multi.nonEmpty)
    // recall amplification: L tables' candidate union can only grow the
    // hit set — table 0 IS s02's hash, so s02-without-probe candidates
    // are a subset; compare recall against the full (probed) s02
    assert((multi & exact).size >= (single & exact).size,
      s"multi-table recall ${(multi & exact).size} < single-table ${(single & exact).size}")
    val exactTop1 = Similarity.s01KnnBrute(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    Similarity.s05AnnMultiTable(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .foreach(r => assert(
        r.getAs[Double]("cosine") <= exactTop1(r.getAs[Long]("query_id")) + 1e-9))
  }

  test("s03 IVF results are structurally valid and never beat exact top-1") {
    val exact = Similarity.s01KnnBrute(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    val rows = Similarity.s03AnnIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      rs.filter(_.getAs[Long]("rk") == 1L)
        .foreach(r => assert(r.getAs[Double]("cosine") <= exact(q) + 1e-9))
    }
  }

  test("s02 top-1 matches s01 when the exact best neighbor shares the bucket") {
    // ANN top-1 must never beat the exact top-1
    val exact = Similarity.s01KnnBrute(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    Similarity.s02AnnLsh(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .foreach { r =>
        val q = r.getAs[Long]("query_id")
        assert(r.getAs[Double]("cosine") <= exact(q) + 1e-9)
      }
  }

  test("s07 IVF recall audit matches a driver-side recomputation") {
    def top3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .filter(_.getAs[Long]("rk") <= 3L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = top3(Similarity.s01KnnBrute(spark, sf))
    val ivf = top3(Similarity.s03AnnIvf(spark, sf))
    val rows = Similarity.s07IvfRecall(spark, sf).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("k_exact") == 3)
      val expectHits = exact.filter(_._1 == q).count(ivf.contains)
      assert(r.getAs[Long]("n_hit") == expectHits,
        s"query $q: audit says ${r.getAs[Long]("n_hit")} hits, recompute says $expectHits")
      assert(math.abs(r.getAs[Double]("recall") - expectHits / 3.0) < 1e-3)
    }
  }

  test("s11 PQ recall audit matches a driver-side recomputation") {
    def top3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .filter(_.getAs[Long]("rk") <= 3L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = top3(Similarity.s01KnnBrute(spark, sf))
    val pq = top3(Similarity.s09PqAnn(spark, sf))
    val rows = Similarity.s11PqRecall(spark, sf).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("k_exact") == 3)
      val expectHits = exact.filter(_._1 == q).count(pq.contains)
      assert(r.getAs[Long]("n_hit") == expectHits,
        s"query $q: audit says ${r.getAs[Long]("n_hit")} hits, recompute says $expectHits")
      assert(math.abs(r.getAs[Double]("recall") - expectHits / 3.0) < 1e-3)
    }
  }

  test("s08 coreset: greedy selection invariants and assignment totals") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val k = Similarity.CoresetK
    val rows = Similarity.s08KcenterCoreset(spark, sf).collect()
    assert(rows.length == k)
    assert(rows.map(_.getAs[Long]("center_rank")).toSeq == (0L until k.toLong))
    val centerIds = rows.map(_.getAs[Long]("center_id"))
    assert(centerIds.distinct.length == k, "repeated center")
    // every corpus vector lands on exactly one center
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == corpus)
    // independent recomputation of the greedy farthest-point sequence
    // from the same stride sample (plain O(n·k) loops, no shared code):
    // each selected point must have the minimal max-cosine to the
    // already-selected set, i.e. be a genuine farthest point.
    val stride = math.max(1L, corpus / 4096)
    val sample = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val sel = centerIds.map(id => unit(sample(id)))
    assert(sel.head.zip(unit(sample(sample.keys.min))).forall {
      case (a, b) => math.abs(a - b) < 1e-12 }, "seed is not the min-id sample")
    for (i <- 1 until k) {
      val chosen = sel(i)
      val prior = sel.take(i)
      def maxCosTo(p: Array[Double]) = prior.map(c => cos(p, c)).max
      val chosenScore = maxCosTo(chosen)
      sample.values.foreach { v =>
        assert(maxCosTo(unit(v)) >= chosenScore - 1e-9,
          s"step $i chose a non-farthest point")
      }
    }
    // coverage is monotone: each later center's worst-member cosine is a
    // per-center stat, but the SAMPLE's k-center radius must not grow as
    // centers are added
    val radii = (1 to k).map { i =>
      val prior = sel.take(i)
      sample.values.map(v => prior.map(c => cos(unit(v), c)).max).min
    }
    assert(radii.zip(radii.tail).forall { case (a, b) => b >= a - 1e-12 },
      s"coverage cosine decreased: $radii")
  }

  test("s09 PQ: codes valid, ADC reconstructs exactly, quantization error bounded") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val m = Similarity.PqSubspaces
    val k = Similarity.PqCodebookSize
    // drop the persisted codes table so this run exercises build AND
    // serve (the second call below reads the published index)
    Similarity.dropIvfIndex(spark, sf, s"pq$m", k,
      Tables.parquetRowCount(spark, sf, "embeddings"))
    val rows = Similarity.s09PqAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    val again = Similarity.s09PqAnn(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "PQ must be deterministic")
    // per query exactly 3 ranked rows, never self
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    // driver recompute: encode every vector + ADC against every query —
    // the reported (neighbor, distance) rows must reconstruct exactly
    val (books, dsub) = Similarity.pqCodebooks(spark, sf, m, k)
    val all = Tables.embeddings(spark, sf).orderBy("vec_id")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    def code(v: Array[Double], mm: Int): Int =
      books(mm).zipWithIndex
        .map { case (c, j) => (sq(v.slice(mm * dsub, (mm + 1) * dsub), c), j) }
        .minBy { case (d, j) => (d, j) }._2
    val codes = all.map { case (id, v) => id -> (0 until m).map(code(v, _)) }.toMap
    val queries = all.filter(_._1 < Similarity.NumQueries).toMap
    def adc(q: Array[Double], id: Long): Double =
      (0 until m).map { mm =>
        sq(q.slice(mm * dsub, (mm + 1) * dsub), books(mm)(codes(id)(mm)))
      }.sum
    rows.foreach { r =>
      val want = adc(queries(r.getLong(0)), r.getAs[Long]("neighbor_id"))
      assert(math.abs(r.getAs[Double]("adc_dist") - want) < 1e-3,
        s"ADC diverged for $r: want $want")
    }
    // quantization honesty: over the reported rows, the ADC estimate must
    // track the TRUE distance within 50% mean relative error — the bound
    // a 16-centroid/8-dim-subspace codebook comfortably meets, and the
    // property that makes ADC ranking meaningful at all
    val byId = all.toMap
    val relErrs = rows.map { r =>
      val t = sq(queries(r.getLong(0)), byId(r.getAs[Long]("neighbor_id")))
      val a = r.getAs[Double]("adc_dist")
      if (t > 0) math.abs(a - t) / t else 0.0
    }
    assert(relErrs.sum / relErrs.length < 0.5,
      s"mean ADC relative error too high: ${relErrs.sum / relErrs.length}")
  }

  test("s10 IVF-PQ: equals s03 at full rescore; bounded rescore stays inside probed lists") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    // build from scratch: drop the combined index so the run covers the
    // publish path before the serve path
    val autoL = Similarity.autoNLists(spark, sf) // the no-knob default
    Similarity.dropIvfIndex(spark, sf, s"ivfpq${autoL}x${Similarity.PqSubspaces}",
      Similarity.PqCodebookSize,
      Tables.parquetRowCount(spark, sf, "embeddings"))
    // the equality limit: rescore covering every probed member makes the
    // ADC shortlist a no-op, so IVF-PQ must reproduce s03 EXACTLY
    val full = Similarity.s10IvfPqAnn(spark, sf, autoL, 2,
      Similarity.PqSubspaces, Similarity.PqCodebookSize,
      rescore = 1000000).collect()
    val s03 = Similarity.s03AnnIvf(spark, sf).collect()
    assert(full.map(_.toString).toSeq == s03.map(_.toString).toSeq,
      "full-rescore IVF-PQ must equal s03")
    // default (bounded rescore): deterministic, 3 per query, and every
    // reported neighbor is a member of a probed list for its query
    val d1 = Similarity.s10IvfPqAnn(spark, sf).collect()
    val d2 = Similarity.s10IvfPqAnn(spark, sf).collect()
    assert(d1.map(_.toString).toSeq == d2.map(_.toString).toSeq)
    d1.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    // containment: every bounded-rescore neighbor must be a member of a
    // list its query actually probed — recomputed from the index tables
    val (assigned, centDf) = Similarity.s03Index(spark, sf, autoL)
    val probed = assigned.select(col("list_id"), col("vec_id"))
      .join(Similarity.ivfProbes(assigned, centDf, nProbe = 2)
        .select(col("list_id"), col("query_id")), Seq("list_id"))
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    d1.foreach { r =>
      assert(probed.contains((r.getLong(0), r.getAs[Long]("neighbor_id"))),
        s"neighbor outside the probed lists: $r")
    }
  }

  test("persisted IVF index: index-served results are identical to fresh fit") {
    import graft.operators.Similarity
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    // s03 family: drop, build fresh, then serve from disk — identical
    val autoL = Similarity.autoNLists(spark, sf)
    Similarity.dropIvfIndex(spark, sf, "s03", autoL, n)
    val fresh = Similarity.s03AnnIvf(spark, sf).collect()
    val path = Similarity.ivfIndexPath(spark, sf, "s03", autoL, n)
    assert(new java.io.File(path, "assigned").exists(),
      s"index not published under $path")
    val served = Similarity.s03AnnIvf(spark, sf).collect()
    assert(fresh.toSeq == served.toSeq, "s03 index-served result diverged from fresh fit")
    // rebuild determinism: drop and refit must reproduce the same index result
    Similarity.dropIvfIndex(spark, sf, "s03", autoL, n)
    val refit = Similarity.s03AnnIvf(spark, sf).collect()
    assert(fresh.toSeq == refit.toSeq, "s03 refit diverged — fit is not deterministic")
    // s06 range family (no-knob entry is footer-auto-sized since r13)
    Similarity.dropIvfIndex(spark, sf, "s06", autoL, n)
    val f6 = Similarity.s06RangeSearch(spark, sf).collect()
    val s6 = Similarity.s06RangeSearch(spark, sf).collect()
    assert(f6.toSeq == s6.toSeq, "s06 index-served result diverged from fresh fit")
  }

  test("persisted index key tracks corpus CONTENT, and stale generations are swept") {
    import graft.operators.Similarity
    val tmp = java.nio.file.Files.createTempDirectory("fp-corpus").toFile
    try {
      org.apache.commons.io.FileUtils.copyFileToDirectory(
        new java.io.File(sf, "embeddings.parquet"), tmp)
      val dir = tmp.toString
      val n = Tables.parquetRowCount(spark, dir, "embeddings")
      val autoL = Similarity.autoNLists(spark, dir)
      Similarity.s03AnnIvf(spark, dir).collect()
      val p1 = Similarity.ivfIndexPath(spark, dir, "s03", autoL, n)
      assert(new java.io.File(p1, "assigned").exists(), s"gen-1 index missing at $p1")
      // equal-cardinality in-place regeneration: same name+size, new
      // mtime — the r7 ADVICE failure mode the fingerprint key closes
      val f = new java.io.File(tmp, "embeddings.parquet")
      assert(f.setLastModified(f.lastModified() + 65000))
      val p2 = Similarity.ivfIndexPath(spark, dir, "s03", autoL, n)
      assert(p1 != p2, "equal-cardinality regeneration must change the index key")
      Similarity.s03AnnIvf(spark, dir).collect()
      assert(new java.io.File(p2, "assigned").exists(), s"gen-2 index missing at $p2")
      assert(!new java.io.File(p1).exists(),
        "superseded index generation must be swept on republish")
      // the key is stable when nothing changed
      assert(p2 == Similarity.ivfIndexPath(spark, dir, "s03", autoL, n))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp)
  }

  test("s06 range search returns every above-threshold pair s01 knows about") {
    val range = Similarity.s06RangeSearch(spark, sf).collect()
    range.foreach { r =>
      assert(r.getAs[Double]("cosine") >= Similarity.RangeTau - 1e-9)
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
    }
    // every s01 top-5 neighbor scoring above tau must appear in the range set
    val rangeSet = range.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    Similarity.s01KnnBrute(spark, sf).collect()
      .filter(_.getAs[Double]("cosine") >= Similarity.RangeTau + 1e-4)
      .foreach { r =>
        val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        assert(rangeSet.contains(k), s"range search missed known neighbor $k")
      }
  }

  private def rangeTriples(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cosine"))).toSet

  test("s06 pruned plan is result-identical to the brute scan (exactness)") {
    // The triangle-inequality prune must be invisible in the output —
    // the guarantee that lets the pruned plan sit under the hash gate.
    val pruned = rangeTriples(Similarity.s06RangeSearch(spark, sf))
    val brute = rangeTriples(Similarity.s06RangeSearchBrute(spark, sf))
    assert(pruned == brute,
      s"pruned\\brute=${(pruned -- brute).take(5)} brute\\pruned=${(brute -- pruned).take(5)}")
  }

  test("s06 triangle bound prunes lists on clustered data, exactly") {
    // The testdata embeddings are near-uniform on the 64-dim sphere
    // (every list's covering radius ≈ 1.27): NO exact method can prune
    // such data — the bound needs dist(q,c) > radius + sqrt(2-2tau),
    // and uniform-sphere distances never reach it. Range search's real
    // workload (contamination sweeps over corpora with near-dup
    // structure) is CLUSTERED, so pruning is demonstrated on a planted
    // clustered corpus; exactness is pinned both there and (above) on
    // the uniform testdata where pruning degrades to zero gracefully.
    val dir = java.nio.file.Files.createTempDirectory("s06spec").toString
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 64L).map { i =>
      val c = (i % 4).toInt
      val v = Array.tabulate(64)(j =>
        (if (j == c) 1f else 0f) + (rnd.nextFloat() - 0.5f) * 0.05f)
      (i, v, s"l$c")
    } :+ ((64L, Array.fill(64)(0f), "zero")) // zero-norm: must be screened
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val nLists = Similarity.RangeLists
    val probed = Similarity.s06Probes(spark, dir, 0.9, nLists).count()
    val full = Similarity.NumQueries.toLong * nLists
    assert(probed < full / 2,
      s"tau=0.9 pruned under half: $probed of $full (query,list) pairs probed")
    // pruned result on the clustered corpus == brute result (tau=0.9):
    // queries sit in clusters 0-3, so each must still find its own
    // cluster-mates through the pruned probe list
    val pruned09 = rangeTriples(
      Similarity.s06RangeSearchPruned(spark, dir, 0.9, nLists))
    assert(pruned09.nonEmpty, "clustered corpus produced no range hits")
    val brute09 = rangeTriples(Similarity.s06RangeSearchBrute(spark, dir))
      .filter(_._3 >= 0.9005) // dodge the rounded-output boundary band
    assert(brute09.subsetOf(pruned09),
      s"pruning dropped true pairs: ${(brute09 -- pruned09).take(5)}")
    // the planted zero-norm vector (NaN cosine everywhere — NaN compares
    // greater than tau, so an unscreened brute scan would count it
    // against every query while no metric index could find it) must be
    // excluded from BOTH plans, not just the pruned one
    assert(!pruned09.exists(_._2 == 64L) && !rangeTriples(
        Similarity.s06RangeSearchBrute(spark, dir)).exists(_._2 == 64L),
      "zero-norm vector leaked into the range result")
  }

  test("s06 ANN variant is an exact-verified subset of the exact range set") {
    val ann = rangeTriples(Similarity.s06RangeSearchAnn(spark, sf))
    val exact = rangeTriples(Similarity.s06RangeSearchBrute(spark, sf))
    assert(ann.subsetOf(exact),
      s"ANN emitted non-range pairs: ${(ann -- exact).take(5)}")
  }

  test("farthestPoints stays index-distinct on duplicate-heavy samples") {
    // s08's stated workload is near-dup-heavy corpora: when the stride
    // sample has fewer distinct directions than k, the greedy argmin
    // must keep returning UNSELECTED indices (duplicates chosen last),
    // never re-emit a chosen index — repeated center_ids would break
    // the s08 output contract pinned above.
    val base = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
      Array(0.0, 0.0, 1.0))
    val pts = base ++ Array.fill(10)(base(0).clone)
    val sel = Similarity.farthestPoints(pts, 8)
    assert(sel.length == 8)
    assert(sel.distinct.length == sel.length, s"repeated index in $sel")
    // the three genuinely distinct directions are exhausted first
    assert(sel.take(3).map(i => pts(i).indexOf(1.0)).toSet == Set(0, 1, 2),
      s"distinct directions not selected first: ${sel.take(3).toList}")
  }

  test("s12 two-level fit: grid covers nLists, assignment is exact within-cell argmin, rebuild deterministic") {
    import org.apache.spark.sql.functions._
    val nLists = 16
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    Similarity.dropIvfIndex(spark, sf, "s03tl", nLists, n)
    val (assigned, centDf, cellDf) = Similarity.twoLevelIndex(spark, sf, nLists)
    val k1 = cellDf.count().toInt
    val k2 = math.ceil(nLists.toDouble / k1).toInt
    assert(k1 == 4, s"⌈√16⌉ cells expected, got $k1")
    val cents = centDf.collect()
      .map(r => r.getAs[Int]("list_id") -> r.getSeq[Float](1).toArray).toMap
    val cells = cellDf.collect()
      .map(r => r.getAs[Int]("l1") -> r.getSeq[Float](1).toArray).toMap
    assert(cents.keys.max < k1 * k2 && cents.size >= k1,
      s"flat grid ids out of range: ${cents.keys.toSeq.sorted}")
    val rows = assigned.collect()
    assert(rows.length == 500 && rows.forall(r => cents.contains(r.getAs[Int]("list_id"))),
      "every vector must land in a materialized list")
    // hierarchical assignment recompute: l1 by cell argmin, then argmin
    // within that cell's codebook — same double math, ties to lower id
    def argminD(v: Array[Float], cs: Seq[(Int, Array[Float])]): Int =
      cs.map { case (id, c) =>
        (id, v.zip(c).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum)
      }.minBy { case (id, d) => (d, id) }._1
    rows.take(64).foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val l1 = argminD(v, cells.toSeq.sortBy(_._1))
      val want = argminD(v, cents.toSeq.filter(c => c._1 / k2 == l1).sortBy(_._1))
      assert(r.getAs[Int]("list_id") == want,
        s"vec ${r.getLong(0)}: assigned ${r.getAs[Int]("list_id")}, recompute $want")
    }
    // rebuild determinism: the fit has no RNG — drop and refit bit-equal
    Similarity.dropIvfIndex(spark, sf, "s03tl", nLists, n)
    val (_, centDf2, _) = Similarity.twoLevelIndex(spark, sf, nLists)
    val again = centDf2.collect()
      .map(r => r.getAs[Int]("list_id") -> r.getSeq[Float](1).toSeq).toMap
    assert(again == cents.map { case (k, v) => k -> v.toSeq },
      "two-level refit diverged — distributed fit is not deterministic")
  }

  test("s12 hierarchical search is structurally valid and never beats exact") {
    val exact = Similarity.s01KnnBrute(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    val rows = Similarity.s12AnnIvf2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      rs.filter(_.getAs[Long]("rk") == 1L)
        .foreach(r => assert(r.getAs[Double]("cosine") <= exact(q) + 1e-9))
    }
    // served-vs-fresh: second call reads the published index, identical
    assert(rows.toSeq == Similarity.s12AnnIvf2(spark, sf).collect().toSeq)
  }

  test("s13 PCA audit matches an independent driver recompute; axes are orthonormal") {
    val rows = Similarity.s13PcaAudit(spark, sf).collect()
    assert(rows.length == 16)
    val evs = rows.sortBy(_.getAs[Int]("component")).map(_.getAs[Double]("eigenvalue"))
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b },
      "spectrum must be non-increasing")
    assert(evs.forall(_ >= 0.0) && rows.map(_.getAs[Double]("cum_pct")).max <= 100.0 + 1e-6)
    // independent recompute: covariance + eigenvalues from first principles
    val e = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = e.length; val d = e.head.length
    val mean = Array.tabulate(d)(j => e.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      e.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    val want = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(d, d, cov.flatten))
      .eigenvalues.toArray.sorted(Ordering[Double].reverse).take(16)
    evs.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-4, s"eigenvalue $i drifted: $got vs $w")
    }
    // the axes behind the audit are orthonormal, and projecting onto all
    // d of them preserves the centered squared norm (rotation, not loss)
    val (mu, axes) = Similarity.pcaAxes(spark, sf, d)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- axes.indices; j <- i until axes.length) {
      val v = dot(axes(i), axes(j))
      assert(math.abs(v - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"axes $i,$j not orthonormal: $v")
    }
    e.take(16).foreach { v =>
      val c = v.zip(mu).map { case (x, m) => x - m }
      val proj = axes.map(a => dot(a, c)).toArray
      assert(math.abs(dot(c, c) - dot(proj, proj)) < 1e-9,
        "full projection must preserve the centered norm")
    }
    // determinism: no RNG anywhere in the fit
    assert(rows.toSeq == Similarity.s13PcaAudit(spark, sf).collect().toSeq)
  }

  test("s14 PCA ANN: structurally valid, equality limit reproduces exact, native projection is a rotation") {
    val exact = Similarity.s01KnnBrute(spark, sf).collect()
    val exactTop1 = exact.filter(_.getAs[Long]("rk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine")).toMap
    val rows = Similarity.s14AnnPca(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3 && rs.forall(_.getAs[Long]("neighbor_id") != q))
      rs.filter(_.getAs[Long]("rk") == 1L)
        .foreach(r => assert(r.getAs[Double]("cosine") <= exactTop1(q) + 1e-9))
    }
    // EQUALITY LIMIT (s10's rescore discipline): a corpus-covering
    // shortlist makes the reduced-space stage a no-op — the exact
    // rescore must then reproduce s01's ranking bit-for-bit
    val full = Similarity.s14AnnPca(spark, sf, kDims = 16, shortlist = 1000000)
      .collect().map(_.toString).toSeq
    val s01Top3 = exact.filter(_.getAs[Long]("rk") <= 3L).map(_.toString).toSeq
    assert(full == s01Top3, "full-shortlist s14 must equal exact top-3")
    // the native projection at kDims = d is a pure rotation: projected
    // euclidean distance equals centered euclidean distance exactly
    import org.apache.spark.sql.functions._
    val (mean, axes) = Similarity.pcaAxes(spark, sf, 64)
    val z = Tables.embeddings(spark, sf).limit(8)
      .select(col("embedding"),
        graft.functions.NativeFunctions.pcaProject(col("embedding"),
          mean.toSeq, axes.map(_.toSeq)).as("z"))
      .collect()
    z.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble).toArray
      val p = r.getSeq[Double](1).toArray
      val cn = v.zip(mean).map { case (x, m) => (x - m) * (x - m) }.sum
      val pn = p.map(x => x * x).sum
      assert(math.abs(cn - pn) < 1e-9, s"projection not norm-preserving: $cn vs $pn")
    }
    assert(rows.toSeq == Similarity.s14AnnPca(spark, sf).collect().toSeq,
      "s14 must be deterministic")
  }

  test("refitIndex: arrival-keyed generations; the newest build sweeps the superseded one") {
    import spark.implicits._
    def emb(seed: Int): Array[Float] =
      Array.tabulate(64)(j => seed * 0.01f + j * 0.001f)
    val a1 = (900000L until 900010L).map(i => (i, emb(1))).toDF("vec_id", "embedding")
    val a2 = (900010L until 900025L).map(i => (i, emb(2))).toDF("vec_id", "embedding")
    val base = Tables.embeddings(spark, sf).count()
    val (as1, _) = Similarity.refitIndex(spark, sf, a1, 16)
    // different arrival CONTENT of different size -> different key; the
    // first generation must have served base + its own arrivals
    assert(as1.count() == base + 10, "first refit must absorb its arrivals")
    val (as2, _) = Similarity.refitIndex(spark, sf, a2, 16)
    assert(as2.count() == base + 15, "second refit must absorb the new arrivals")
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + "/graft_ivf")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirTag = sf.replaceAll("[^A-Za-z0-9._-]", "_")
    val gens = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("s03refit") && n.contains(s"_${dirTag}_n"))
    assert(gens.length == 1 && gens.head.contains("_n" + (base + 15)),
      s"superseded refit generation not swept: ${gens.toSeq}")
    // idempotence of the union dedup: re-absorbing the SAME arrivals
    // (e.g. after a crash between publish and compaction) re-serves the
    // same generation without double-counting
    val (as2again, _) = Similarity.refitIndex(spark, sf, a2, 16)
    assert(as2again.count() == base + 15, "re-absorption must be idempotent")
  }

  test("refitIndex: duplicate arrival vec_ids resolve to one deterministic survivor") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def emb(seed: Int): Array[Float] =
      Array.tabulate(64)(j => seed * 0.01f + j * 0.001f)
    // the SAME vec_id twice in one arrivals batch (a revision landing
    // twice) — both copies carry arrival priority, so only the content
    // tie-break decides; the survivor must be scan-order independent
    val dupId = 910000L
    val rows = Seq((dupId, emb(3)), (dupId, emb(4)), (910001L, emb(5)))
    val fwd = rows.toDF("vec_id", "embedding")
    val rev = rows.reverse.toDF("vec_id", "embedding")
    def servedDup(arrivals: org.apache.spark.sql.DataFrame): Seq[Float] = {
      val (assigned, _) = Similarity.refitIndex(spark, sf, arrivals, 16)
      val got = assigned.filter(col("vec_id") === dupId).collect()
      assert(got.length == 1, "dedup must leave exactly one row per vec_id")
      got.head.getSeq[Float](got.head.fieldIndex("embedding"))
    }
    val first = servedDup(fwd)
    // same content, reversed scan order: the order-independent arrivals
    // fingerprint maps both to one key, but force a REBUILD so the
    // dedup itself (not the cache) is what's being tested
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + "/graft_ivf")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirTag = sf.replaceAll("[^A-Za-z0-9._-]", "_")
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("s03refit") &&
        p.getName.contains(s"_${dirTag}_n"))
      .foreach(fs.delete(_, true))
    val second = servedDup(rev)
    assert(first == second,
      "duplicate-arrival survivor depends on scan order — tie-break not deterministic")
    // and the survivor is the documented rule: max (pri, xxhash64(emb))
    val expect = Seq(emb(3), emb(4)).maxBy(e =>
      Seq(e).toDF("e").select(xxhash64(col("e"))).head().getLong(0))
    assert(first == expect.toSeq, "survivor is not the max-hash arrival")
  }

  test("s15 SQ8: codes in range, driver recompute exact, ranking tracks the true inner product") {
    import org.apache.spark.sql.functions._
    val scale = Similarity.sq8Scale(spark, sf)
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // driver recompute of the whole operator: encode (same round rule),
    // integer dot, (dot desc, id) top-3 per query
    def enc(v: Array[Float]): Array[Int] =
      v.map(x => graft.functions.Sq8Util.roundHalfAway(x.toDouble * scale))
    val codes = vecs.map { case (id, v) => id -> enc(v) }.toMap
    assert(codes.values.flatten.forall(c => c >= -127 && c <= 127),
      "codes must fit int8")
    val queries = vecs.filter(_._1 < Similarity.NumQueries)
    val expected = queries.flatMap { case (qid, qv) =>
      val qc = codes(qid)
      vecs.filter(_._1 != qid)
        .map { case (nid, _) =>
          (nid, codes(nid).zip(qc).map { case (a, b) => a.toLong * b.toLong }.sum)
        }
        .sortBy { case (nid, d) => (-d, nid) }.take(3).zipWithIndex
        .map { case ((nid, d), i) => (qid, (i + 1).toLong, nid, d) }
    }.toSeq
    val got = Similarity.s15Sq8Mips(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "s15 diverged from the driver recompute")
    // quantization-noise bound: SQ8 top-3 must overlap the EXACT float
    // inner-product top-3 (one global scale => no reweighting; measured
    // overlap is 100% at the test SFs, pinned at >= 2/3 per query)
    queries.foreach { case (qid, qv) =>
      val exactTop = vecs.filter(_._1 != qid)
        .map { case (nid, v) =>
          (nid, v.zip(qv).map { case (a, b) => a.toDouble * b.toDouble }.sum)
        }
        .sortBy { case (nid, d) => (-d, nid) }.take(3).map(_._1).toSet
      val sqTop = got.filter(_._1 == qid).map(_._3).toSet
      assert((sqTop & exactTop).size >= 2,
        s"query $qid: SQ8 top-3 $sqTop vs exact IP top-3 $exactTop")
    }
  }

  test("s15 native encode/dot equal the declarative mirrors on every row") {
    import org.apache.spark.sql.functions._
    val scale = Similarity.sq8Scale(spark, sf)
    val e = Tables.embeddings(spark, sf)
    val encDiff = e.select(
        graft.functions.NativeFunctions.sq8Encode(col("embedding"), scale).as("n"),
        Similarity.sq8EncodeDeclarative(col("embedding"), scale).as("d"))
      .filter(not(col("n") <=> col("d"))).count()
    assert(encDiff == 0L, s"$encDiff rows disagree on SQ8 encode")
    val codes = e.select(col("vec_id"),
      graft.functions.NativeFunctions.sq8Encode(col("embedding"), scale).as("code"))
    val q = codes.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("code").as("qc"))
    val dotDiff = codes.crossJoin(broadcast(q))
      .select(
        graft.functions.NativeFunctions.sq8Dot(col("qc"), col("code")).as("n"),
        Similarity.sq8DotDeclarative(col("qc"), col("code")).as("d"))
      .filter(not(col("n") <=> col("d"))).count()
    assert(dotDiff == 0L, s"$dotDiff pairs disagree on SQ8 dot")
  }

  test("s16 PCA recall sweep matches a driver recompute and is monotone in shortlist") {
    def top3(df: org.apache.spark.sql.DataFrame) = df.collect()
      .filter(_.getAs[Long]("rk") <= 3L)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = top3(Similarity.s01KnnBrute(spark, sf))
    val sweep = Seq(8, 16, 32)
    val rows = Similarity.s16PcaRecall(spark, sf, 16, sweep).collect()
    assert(rows.length == sweep.length * Similarity.NumQueries)
    // per-(shortlist, query) hits recomputed from the two gated sides
    sweep.foreach { sl =>
      val ann = top3(Similarity.s14AnnPca(spark, sf, 16, sl))
      rows.filter(_.getAs[Long]("shortlist") == sl.toLong).foreach { r =>
        val q = r.getAs[Long]("query_id")
        assert(r.getAs[Long]("k_exact") == 3)
        val expectHits = exact.filter(_._1 == q).count(ann.contains)
        assert(r.getAs[Long]("n_hit") == expectHits,
          s"shortlist $sl query $q: ${r.getAs[Long]("n_hit")} vs $expectHits")
      }
    }
    // candidate sets are nested across the sweep (top-8 ⊆ top-16 ⊆
    // top-32 by projected distance), so per-query recall can only rise
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      val recalls = rs.sortBy(_.getAs[Long]("shortlist")).map(_.getAs[Double]("recall"))
      assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
        s"query $q: recall not monotone across the sweep: ${recalls.toSeq}")
    }
  }

  test("s17 SQ8 recall audit matches a driver recompute against the exact float-IP top-3") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // exact float-IP top-3 per query, the native dot's fold order
    // (left-to-right float→double products)
    def ip(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val exact = (0L until Similarity.NumQueries.toLong).flatMap { q =>
      val qv = vecs(q)
      vecs.toSeq.filter(_._1 != q)
        .map { case (nid, v) => (nid, ip(qv, v)) }
        .sortBy { case (nid, d) => (-d, nid) }.take(3)
        .map { case (nid, _) => (q, nid) }
    }.toSet
    // the operator's own reference side agrees with the recompute
    val refSide = Similarity.s17ExactIpTop3(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(refSide == exact, "s17's exact-IP reference diverged from the driver fold")
    val sq = Similarity.s15Sq8Mips(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = Similarity.s17Sq8Recall(spark, sf).collect()
    assert(rows.length == Similarity.NumQueries)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("k_exact") == 3)
      val expectHits = exact.filter(_._1 == q).count(sq.contains)
      assert(r.getAs[Long]("n_hit") == expectHits,
        s"query $q: audit says ${r.getAs[Long]("n_hit")} hits, recompute says $expectHits")
      // the s15 spec's quality bar, now carried by a first-class audit:
      // the integer ranking keeps >= 2 of the exact IP top-3
      assert(r.getAs[Long]("n_hit") >= 2, s"query $q: SQ8 recall below 2/3")
    }
  }

  test("s18: filtered k-NN matches a driver recompute and beats the post-filter trap") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getAs[Number](2).longValue))
    def cos(a: Array[Float], b: Array[Float]): Double = driverCos(a, b)
    val want = (0L until Similarity.NumQueries.toLong).flatMap { q =>
      val qv = vecs.find(_._1 == q).get._2
      vecs.filter(v => v._1 != q && v._3 % 2 == 0)
        .map(v => (v._1, cos(qv, v._2)))
        .sortBy { case (nid, c) =>
          (-BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), i) => (q, i + 1L, nid) }
    }.toSet
    val rows = Similarity.s18FilteredKnn(spark, sf).collect()
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
      r.getAs[Long]("neighbor_id"))).toSet
    assert(got == want, s"filtered top-3 diverged:\nextra ${got -- want}\nmissing ${want -- got}")
    // every result satisfies the predicate
    val evenIds = vecs.filter(_._3 % 2 == 0).map(_._1).toSet
    rows.foreach(r => assert(evenIds(r.getAs[Long]("neighbor_id")),
      "neighbor outside the filter predicate"))
    // the naive form (filter AFTER a top-k) under-fills: for at least
    // one query, s01's unfiltered top-5 keeps fewer than 3 even-label
    // survivors — the correctness trap the pushed-down filter avoids
    val s01Top = Similarity.s01KnnBrute(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val underfilled = s01Top.count { case (_, rs) =>
      rs.count(r => evenIds(r.getAs[Long]("neighbor_id"))) < 3
    }
    assert(underfilled > 0,
      "fixture no longer demonstrates the post-filter under-fill trap")
  }

  test("s20: RRF fusion equals a driver recompute from its two legs") {
    import org.apache.spark.sql.functions._
    // lexical leg: t07's own (gated) output, ranked as the operator does
    val lexRanks = graft.operators.TextAnalysis.t07Bm25Search(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25")))
      .sortBy { case (id, b) => (-b, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // vector leg: exact cosine to vec 0, round-6 ordering, top-20
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = driverCos(a, b)
    val qv = vecs.find(_._1 == Similarity.RrfQueryVec).get._2
    val vecRanks = vecs.filter(_._1 != Similarity.RrfQueryVec)
      .map { case (id, v) =>
        (id, BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, c) => (-c, id) }
      .take(20).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // integer RRF (Long division = floor on positives, both engines' div)
    def leg(r: Option[Long]): Long =
      r.map(rk => Similarity.RrfScale / (Similarity.RrfK + rk)).getOrElse(0L)
    val want = (lexRanks.keySet ++ vecRanks.keySet).toSeq
      .map { id =>
        (id, lexRanks.get(id), vecRanks.get(id),
          leg(lexRanks.get(id)) + leg(vecRanks.get(id))) }
      .sortBy { case (id, _, _, s) => (-s, id) }
      .take(10).zipWithIndex
      .map { case ((id, rl, rv, s), i) => (i + 1L, id, rl, rv, s) }
    val got = Similarity.s20RrfFusion(spark, sf).collect().map { r =>
      (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("rank_lex")).map(_.longValue),
        Option(r.getAs[java.lang.Long]("rank_vec")).map(_.longValue),
        r.getAs[Long]("rrf_score"))
    }.toSeq
    assert(got == want, s"fused ranking diverged:\ngot  $got\nwant $want")
    // the fusion is not degenerate: both legs contribute to the top-10
    assert(got.exists(_._3.isDefined) && got.exists(_._4.isDefined),
      "fixture exercises only one leg")
  }

  // ---- s19 exact k-NN graph + s19b IVF graph ----

  /** Driver-side exact top-3 graph: the same round-6 ordering / round-4
    * output contract as the engine's `ranked`. */
  private def driverExactGraph(): Map[Long, Seq[(Long, Long, Double)]] = {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = driverCos(a, b)
    vecs.map { case (q, qv) =>
      q -> vecs.filter(_._1 != q)
        .map { case (n, nv) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-rnd(c, 6), n) }
        .take(3).zipWithIndex
        .map { case ((n, c), i) => (i + 1L, n, rnd(c, 4)) }.toSeq
    }.toMap
  }

  test("s19 exact graph equals a driver recompute for every corpus vector") {
    val want = driverExactGraph()
    val got = Similarity.s19KnnGraph(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Long]("rk"))
          .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("neighbor_id"),
            r.getAs[Double]("cosine"))).toSeq
      }
    assert(got.keySet == want.keySet, "graph does not cover the corpus")
    got.foreach { case (q, edges) =>
      assert(edges == want(q), s"vector $q: got $edges, want ${want(q)}")
    }
  }

  test("s19b with nProbe = nLists is the exact graph (candidate pool = corpus)") {
    val exact = Similarity.s19KnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val all = Similarity.s19bKnnGraphIvf(spark, sf, nLists = 16, nProbe = 16)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(all == exact,
      s"full-probe IVF graph must equal s19: ${(all diff exact).take(5)} / ${(exact diff all).take(5)}")
  }

  test("s19b default: full coverage, sound edges, locality bonus over the scan floor") {
    val want = driverExactGraph()
    // the no-knob default is footer-auto-sized (r12): pin the SAME
    // denominator for the floor math and the explicit-probe sweep
    val autoL = Similarity.autoNLists(spark, sf)
    val got = Similarity.s19bKnnGraphIvf(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getAs[Long]("rk"))
          .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("neighbor_id"),
            r.getAs[Double]("cosine"))).toSeq
      }
    // coverage: every corpus vector gets a full top-3 (2/16 of the
    // corpus as candidate pool >> 3 at every test SF)
    assert(got.keySet == want.keySet, "IVF graph does not cover the corpus")
    // soundness: EVERY reported edge carries the true cosine of its pair
    // (not just edges that happen to land in the exact top-3)
    import org.apache.spark.sql.functions._
    val vecMap = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def trueCos4(a: Array[Float], b: Array[Float]): Double =
      rnd(driverCos(a, b), 4)
    got.foreach { case (q, edges) =>
      assert(edges.map(_._1) == Seq(1L, 2L, 3L), s"vector $q under-filled: $edges")
      edges.foreach { case (_, n, c) =>
        val t = trueCos4(vecMap(q), vecMap(n))
        assert(c == t, s"vector $q -> $n: reported $c, true $t")
      }
    }
    // the test corpus is the adversarial geometry (true top-1 cosines
    // ~0.37, no cluster structure), so recall tracks the scanned
    // fraction nProbe/nLists — the pinnable signal is the quantizer's
    // LOCALITY BONUS over that random-scan floor, not an absolute bar
    // the corpus geometry owns (measured 0.47 = 3.7x the 2/16 floor)
    def recallAt(nProbe: Int): Double = {
      val g = Similarity.s19bKnnGraphIvf(spark, sf, autoL, nProbe).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
      want.keys.toSeq.map(q => (want(q).map(_._2).toSet & g(q)).size).sum
        .toDouble / (want.size * 3)
    }
    val r2 = {
      val hits = want.keys.toSeq.map { q =>
        (want(q).map(_._2).toSet & got(q).map(_._2).toSet).size
      }.sum
      hits.toDouble / (want.size * 3)
    }
    info(f"s19b recall@3 vs exact graph at nProbe=2: $r2%.4f")
    assert(r2 >= 2.0 * 2.0 / autoL,
      f"recall $r2%.4f shows no locality bonus over the 2/$autoL scan floor")
    // probe sets are nested by construction (argmin-k order), so the
    // candidate pool grows with nProbe and hits can only increase: a
    // deeper probe must never lose recall
    val r4 = recallAt(4)
    info(f"s19b recall@3 at nProbe=4: $r4%.4f")
    assert(r4 >= r2, f"recall must be monotone in nProbe: $r4%.4f < $r2%.4f")
  }

  test("s21 refinement: kept-set cosine dominance over s19b, sound edges, recall never drops") {
    import org.apache.spark.sql.functions._
    val want = driverExactGraph()
    val vecMap = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) =>
          q -> rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("neighbor_id")).toSeq
        }
    val base = neighborSets(Similarity.s19bKnnGraphIvf(spark, sf))
    val ref = neighborSets(Similarity.s21GraphRefine(spark, sf))
    assert(ref.keySet == base.keySet, "refinement must inherit s19b's coverage")
    // the candidate pool is a SUPERSET of the current edges, so the
    // kept top-3's true cosines dominate elementwise (sorted desc);
    // eps covers round-6 tie-ordering in the heap
    ref.keys.foreach { q =>
      val rs = ref(q).map(n => driverCos(vecMap(q), vecMap(n))).sorted.reverse
      val bs = base(q).map(n => driverCos(vecMap(q), vecMap(n))).sorted.reverse
      rs.zip(bs).zipWithIndex.foreach { case ((rc, bc), i) =>
        assert(rc >= bc - 1e-6,
          s"vector $q rank ${i + 1}: refined cosine $rc below base $bc")
      }
      assert(ref(q).size == 3 && ref(q).distinct.size == 3 && !ref(q).contains(q),
        s"vector $q: malformed refined edges ${ref(q)}")
    }
    // recall@3 vs the exact graph: monotone by the dominance above —
    // and on this (adversarial, near-orthogonal) corpus one NN-Descent
    // round recovers a real chunk of s19b's list-boundary misses
    def recall(g: Map[Long, Seq[Long]]): Double =
      want.keys.toSeq.map(q => (want(q).map(_._2).toSet & g(q).toSet).size).sum
        .toDouble / (want.size * 3)
    val (rb, rr) = (recall(base), recall(ref))
    info(f"s21 recall@3: s19b $rb%.4f -> refined $rr%.4f")
    assert(rr >= rb, f"refinement lost recall: $rr%.4f < $rb%.4f")
    // measured on this corpus: 0.4653 -> 0.5927 — pin a conservative
    // slice of that gain (the geometry gives refinement nothing to
    // amplify if this ever regresses to ~zero)
    assert(rr >= rb + 0.05,
      f"one NN-Descent round should recover list-boundary misses: $rb%.4f -> $rr%.4f")
    // edge soundness: every reported cosine is the true pair cosine
    Similarity.s21GraphRefine(spark, sf).collect().foreach { r =>
      val (q, n, c) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"))
      assert(c == rnd(driverCos(vecMap(q), vecMap(n)), 4),
        s"edge $q -> $n carries a wrong cosine $c")
    }
  }

  test("s22 cluster profile matches a driver recompute end to end") {
    import org.apache.spark.sql.functions._
    val nLists = Similarity.autoNLists(spark, sf) // the no-knob default (r12)
    val got = Similarity.s22ClusterProfile(spark, sf).collect()
    val assigned = Similarity.s03Index(spark, sf, nLists)._1
      .select(col("vec_id"), col("list_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // per-list population + majority label (ties -> lowest label)
    val byList = assigned.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    assert(got.map(_.getAs[Long]("n_vectors")).sum == assigned.size,
      "profile must account for every vector")
    // driver term scoring: per-doc distinct whitespace tokens, stopwords
    // and single chars out, tf x log(nLists / cluster-frequency)
    val stop = graft.functions.TextFunctions.stopwords.toSet
    val docToks = docs.view.mapValues(
      _.trim.split("\\s+").toSeq.distinct.filter(t => !stop(t) && t.length > 1)).toMap
    val listTf: Map[(Int, String), Long] = byList.toSeq.flatMap { case (l, vs) =>
      vs.flatMap(v => docToks.getOrElse(v, Seq()).map(t => (l, t)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ncl: Map[String, Long] =
      listTf.keys.toSeq.map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { r =>
      val l = r.getAs[Int]("list_id")
      val members = byList(l)
      assert(r.getAs[Long]("n_vectors") == members.size.toLong, s"list $l size")
      val labCounts = members.groupBy(labels).view.mapValues(_.size).toMap
      val (wantLab, wantN) = labCounts.toSeq.sortBy { case (lab, n) => (-n, lab) }.head
      assert(r.getAs[Int]("top_label") == wantLab && r.getAs[Long]("n_top_label") == wantN.toLong,
        s"list $l majority label: got ${r.getAs[Int]("top_label")}, want $wantLab")
      assert(r.getAs[Long]("label_share_pct") == wantN.toLong * 100 / members.size,
        s"list $l label share")
      val wantTerms = listTf.collect { case ((`l`, t), tf) =>
        (t, tf * math.log(nLists.toDouble / ncl(t))) }
        .toSeq.sortBy { case (t, s) => (-s, t) }.take(3).map(_._1).mkString(" ")
      assert(r.getAs[String]("top_terms") == wantTerms,
        s"list $l terms: got '${r.getAs[String]("top_terms")}', want '$wantTerms'")
    }
  }

  test("s25 label propagation matches a driver recompute of both rounds") {
    import org.apache.spark.sql.functions._
    val graph = driverExactGraph().map { case (q, es) => q -> es.map(_._2) }
    val trueLab = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    var labels = trueLab.keys.filter(_ % Similarity.S25SeedMod == 0)
      .map(v => v -> (trueLab(v), 0)).toMap
    (1 to Similarity.S25Rounds).foreach { r =>
      val cand = graph.keys.filterNot(labels.contains).flatMap { q =>
        val votes = graph(q).flatMap(n => labels.get(n).map(_._1))
        if (votes.isEmpty) None
        else {
          val counts = votes.groupBy(identity).map { case (l, v) => (l, v.size) }
          Some(q -> (counts.minBy { case (l, c) => (-c, l) }._1, r))
        }
      }.toMap
      labels = labels ++ cand
    }
    val want = labels.toSeq.groupBy(_._2._1).map { case (lab, xs) =>
      val seed = xs.count(_._2._2 == 0).toLong
      val prop = xs.count(_._2._2 > 0).toLong
      val corr = xs.count { case (v, (l, r)) => r > 0 && l == trueLab(v) }.toLong
      lab -> (seed, prop, corr, corr * 1000000L / math.max(1L, prop))
    }
    val got = Similarity.s25LabelProp(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n_seed"),
        r.getAs[Long]("n_propagated"), r.getAs[Long]("n_correct"),
        r.getAs[Long]("acc_ppm"))).toMap
    assert(got == want, s"propagation diverged:\ngot  $got\nwant $want")
    // the graph must genuinely spread labels; on THIS corpus labels are
    // random w.r.t. geometry, so accuracy is honestly near-chance —
    // that reading is the audit's purpose, and the structured case is
    // pinned by the planted-fixture test below
    assert(got.values.map(_._2).sum > 0, "no labels propagated")
  }

  test("s25 on a label-clustered space propagates near-perfectly") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // 3 exact clusters in 4-d: every vector of cluster c IS axis c (+ a
    // tiny common floor), so cluster-mates tie at cosine 1 and the
    // (cos DESC, id ASC) order makes each vector's top-3 its three
    // smallest-id mates — every non-seed reaches a seed within 2 hops
    val vecs = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(4)(0.01f)
      base(c) = 1.0f
      (i, base.toSeq, c)
    }
    val e = vecs.map { case (i, _, c) => (i, c) }.toDF("vec_id", "label")
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum *
        b.map(x => x.toDouble * x).sum)
    }
    val g = vecs.flatMap { case (q, qv, _) =>
      vecs.filter(_._1 != q)
        .map { case (n, nv, _) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }.take(3)
        .map { case (n, _) => (q, n) }
    }.toDF("query_id", "neighbor_id")
    val rows = Similarity.s25Of(e, g, Similarity.S25Rounds).collect()
    val prop = rows.map(_.getAs[Long]("n_propagated")).sum
    val corr = rows.map(_.getAs[Long]("n_correct")).sum
    // full coverage: all 24 non-seeds labeled within the 2 rounds
    assert(prop == 24L, s"expected full propagation, got $prop")
    assert(corr == prop,
      s"cluster-pure neighborhoods must propagate perfectly: $corr/$prop")
    assert(rows.forall(_.getAs[Long]("acc_ppm") == 1000000L))
  }

  test("s26 outlier scan matches a driver recompute of the isolation tail") {
    import org.apache.spark.sql.functions._
    val graph = driverExactGraph()
    val lab = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val iso = graph.map { case (q, es) =>
      q -> es.map(e => math.round(e._3 * 10000)).sum
    }
    // Scala Long `/` and Spark `div` both truncate toward zero — the
    // mean recompute matches the engine's convention directly
    val want = iso.toSeq.groupBy { case (q, _) => lab(q) }
      .map { case (l, xs) =>
        l -> (xs.size.toLong,
          xs.count(_._2 < Similarity.S26IsolationMicro).toLong,
          xs.map(_._2).sum / xs.size)
      }
    val got = Similarity.s26KnnOutlier(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_outliers"), r.getAs[Long]("mean_iso_micro"))).toMap
    assert(got == want, s"outlier scan diverged:\ngot  $got\nwant $want")
    // the adversarial corpus has a genuine isolated tail
    assert(got.values.map(_._2).sum > 0, "no outliers flagged")
    // and not everything is an outlier
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum / 2)
  }

  test("s24 graph-recall audit matches a driver recompute; refinement row dominates") {
    val want = driverExactGraph()
    def recallPpm(g: Map[Long, Set[Long]]): (Long, Long, Long) = {
      val kTotal = want.values.map(_.size).sum.toLong
      val hits = want.toSeq.map { case (q, es) =>
        (es.map(_._2).toSet & g.getOrElse(q, Set())).size
      }.sum.toLong
      (want.size.toLong, kTotal, hits)
    }
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ivf = recallPpm(sets(Similarity.s19bKnnGraphIvf(spark, sf)))
    val ref = recallPpm(sets(Similarity.s21GraphRefine(spark, sf)))
    val got = Similarity.s24GraphRecall(spark, sf).collect()
      .map(r => r.getAs[String]("variant") -> (r.getAs[Long]("n_queries"),
        r.getAs[Long]("k_total"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_ppm"))).toMap
    assert(got.keySet == Set("ivf_nprobe2", "refined_1round"))
    Seq(("ivf_nprobe2", ivf), ("refined_1round", ref)).foreach { case (k, (nq, kt, nh)) =>
      assert(got(k) == ((nq, kt, nh, nh * 1000000L / kt)),
        s"$k audit row diverged: got ${got(k)}, want ($nq, $kt, $nh)")
    }
    assert(got("refined_1round")._4 >= got("ivf_nprobe2")._4,
      s"refinement must not lose recall: $got")
  }

  test("persisted k-NN graph: index-served result is identical to a fresh build") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSeq.sorted
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    Similarity.dropIvfIndex(spark, sf, "s19graph", 3, n)
    val fresh = rows(Similarity.s19KnnGraphFresh(spark, sf))
    val served = rows(Similarity.s19KnnGraph(spark, sf)) // builds, then reads
    assert(served == fresh, "s19 index-served graph diverged from fresh build")
    // second call takes the pure read path against the published artifact
    val again = rows(Similarity.s19KnnGraph(spark, sf))
    assert(again == fresh, "s19 re-read of the published graph diverged")
  }

  test("persisted production graph (s19b + refinement): index-served equals fresh; consumers read it") {
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSeq.sorted
    val n = Tables.parquetRowCount(spark, sf, "embeddings")
    val autoL = Similarity.autoNLists(spark, sf)
    Similarity.dropIvfIndex(spark, sf, s"s19bgraph-l${autoL}p2r1", 3, n)
    val fresh = rows(Similarity.s21GraphRefine(spark, sf))
    val served = rows(Similarity.s19bGraphIndex(spark, sf)) // builds, then reads
    assert(served == fresh, "served production graph diverged from a fresh refine")
    assert(rows(Similarity.s19bGraphIndex(spark, sf)) == fresh,
      "re-read of the published production graph diverged")
    // the DEPLOY swap end-to-end: the outlier scan over the persisted
    // production artifact runs and covers every vector per label
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
    val report = Similarity.s26Of(Similarity.s19bGraphIndex(spark, sf), labels)
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("n_vecs")).toMap
    val want = labels.groupBy("label").count().collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    assert(report == want, s"artifact-served outlier scan coverage: $report vs $want")
  }

  test("s26 over the s19b IVF graph: the linear production path") {
    import org.apache.spark.sql.functions._
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label"))
    val got = Similarity.s26Of(
        Similarity.s19bKnnGraphIvf(spark, sf), labels).collect()
      .map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_outliers"), r.getAs[Long]("mean_iso_micro"))).toMap
    val exact = Similarity.s26KnnOutlier(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> (r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_outliers"), r.getAs[Long]("mean_iso_micro"))).toMap
    // same per-label corpus accounting whatever graph is supplied
    assert(got.keySet == exact.keySet &&
      got.map { case (l, v) => l -> v._1 } == exact.map { case (l, v) => l -> v._1 },
      s"IVF-graph scan must cover every vector per label:\ngot $got\nexact $exact")
    // an approximate graph's top-3 cosines are elementwise dominated by
    // the exact top-3, so isolation can only read LOWER and the flagged
    // tail can only GROW — per label
    got.keySet.foreach { l =>
      assert(got(l)._2 >= exact(l)._2,
        s"label $l: IVF graph flagged ${got(l)._2} < exact ${exact(l)._2}")
      assert(got(l)._3 <= exact(l)._3,
        s"label $l: IVF mean isolation ${got(l)._3} above exact ${exact(l)._3}")
    }
  }

  test("s25Of with string labels: dictionary-encoded propagation equals the numeric run decoded") {
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    // the clustered fixture again, labels as the production shape —
    // quality-tier STRINGS (order-preserving vs the numeric codes, so
    // tie-break semantics are identical by construction)
    val vecs = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.fill(4)(0.01f)
      base(c) = 1.0f
      (i, base.toSeq, c)
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum *
        b.map(x => x.toDouble * x).sum)
    }
    val g = vecs.flatMap { case (q, qv, _) =>
      vecs.filter(_._1 != q)
        .map { case (n, nv, _) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }.take(3)
        .map { case (n, _) => (q, n) }
    }.toDF("query_id", "neighbor_id")
    val eNum = vecs.map { case (i, _, c) => (i, c) }.toDF("vec_id", "label")
    val eStr = vecs.map { case (i, _, c) => (i, s"tier_$c") }.toDF("vec_id", "label")
    val numRows = Similarity.s25Of(eNum, g, Similarity.S25Rounds).collect()
      .map(r => s"tier_${r.getAs[Int]("label")}" -> (r.getAs[Long]("n_seed"),
        r.getAs[Long]("n_propagated"), r.getAs[Long]("n_correct"),
        r.getAs[Long]("acc_ppm"))).toMap
    val strRows = Similarity.s25Of(eStr, g, Similarity.S25Rounds).collect()
      .map(r => r.getAs[String]("label") -> (r.getAs[Long]("n_seed"),
        r.getAs[Long]("n_propagated"), r.getAs[Long]("n_correct"),
        r.getAs[Long]("acc_ppm"))).toMap
    assert(strRows == numRows,
      s"string-label propagation diverged from numeric:\ngot  $strRows\nwant $numRows")
    assert(strRows.values.map(_._2).sum == 24L && strRows.values.forall(_._4 == 1000000L))
    // NULL labels are excluded identically on BOTH paths (the string
    // dictionary's equi-join would otherwise drop them silently while
    // the numeric path kept them): poison one seed-residue vector
    val eStrNull = vecs.map { case (i, _, c) =>
      (i, if (i == 0L) null else s"tier_$c")
    }.toDF("vec_id", "label")
    val eNumNull = vecs.map { case (i, _, c) =>
      (i, if (i == 0L) None else Some(c))
    }.toDF("vec_id", "label")
    val sN = Similarity.s25Of(eStrNull, g, Similarity.S25Rounds).collect()
      .map(r => r.getAs[String]("label") -> (r.getAs[Long]("n_seed"),
        r.getAs[Long]("n_propagated"))).toMap
    val nN = Similarity.s25Of(eNumNull, g, Similarity.S25Rounds).collect()
      .map(r => s"tier_${r.getAs[Int]("label")}" -> (r.getAs[Long]("n_seed"),
        r.getAs[Long]("n_propagated"))).toMap
    assert(sN == nN,
      s"NULL-label exclusion must match across paths:\nstring $sN\nnumeric $nN")
    assert(!sN.keySet.exists(_ == null), "NULL must never appear as a report label")
  }

  test("s23 MMR matches an independent driver recompute of the greedy selection") {
    import org.apache.spark.sql.functions._
    val got = Similarity.s23MmrRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("relevance"), r.getAs[Double]("max_sim_selected"),
        r.getAs[Double]("mmr_score")))
    // independent recompute from the raw tables
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    val q = vecs(Similarity.RrfQueryVec)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val pool = vecs.toSeq.filter(_._1 != Similarity.RrfQueryVec)
      .map { case (id, v) => (id, rnd(cos(q, v), 6), v) }
      .sortBy { case (id, c, _) => (-c, id) }.take(20)
    var sel = Seq.empty[(Long, Array[Double])]
    val want = (1 to Similarity.MmrK).map { rk =>
      val scored = pool.filterNot(p => sel.exists(_._1 == p._1)).map { case (id, c, v) =>
        val ms = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
        (id, c, ms, Similarity.MmrLambda * c - (1 - Similarity.MmrLambda) * ms)
      }
      val best = scored.minBy { case (id, _, _, s) => (-s, id) }
      sel :+= ((best._1, pool.find(_._1 == best._1).get._3))
      (rk.toLong, best._1, rnd(best._2, 4), rnd(best._3, 4), rnd(best._4, 4))
    }
    assert(got.toSeq == want, s"MMR selection diverged:\n got  ${got.toSeq}\n want $want")
  }

  test("s23 demotes a planted near-duplicate out of the top ranks and readmits it later") {
    import spark.implicits._
    // query (vec 0) at (1,0,0,0); vecs 1 and 2 are EXACT duplicates at
    // relevance 0.8; vec 3 mirrors them across the query axis (same
    // relevance, mutual cosine 0.28); vecs 4-5 are low-relevance filler
    val rows = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.8f, 0.6f, 0f, 0f), 0),
      (2L, Seq(0.8f, 0.6f, 0f, 0f), 0),
      (3L, Seq(0.8f, -0.6f, 0f, 0f), 0),
      (4L, Seq(0.1f, 0f, 0.9f, 0f), 0),
      (5L, Seq(0.1f, 0f, 0f, 0.9f), 0))
    val dir = java.nio.file.Files.createTempDirectory("s23mmr").toString
    rows.toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")
    val mmr = Similarity.s23MmrRerank(spark, dir).collect()
      .sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id")).toSeq
    // pure relevance would rank (1, 2, 3, ...): the duplicate sits at 2.
    // MMR puts the mirror vector second (novelty beats redundancy) and
    // readmits the duplicate at 3 once its penalty is the worst around
    assert(mmr.take(3) == Seq(1L, 3L, 2L),
      s"MMR should order planted candidates (1, 3, 2), got $mmr")
  }

  test("graft_dot equals the declarative float-IP fold on every pair") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("embedding").as("qv"))
    val diff = e.crossJoin(broadcast(q))
      .select(
        graft.functions.NativeFunctions.dotProduct(col("qv"), col("embedding")).as("n"),
        graft.functions.VectorFunctions.dot(col("qv"), col("embedding")).as("d"))
      .filter(not(col("n") <=> col("d"))).count()
    assert(diff == 0L, s"$diff pairs disagree on graft_dot vs declarative fold")
  }
}
