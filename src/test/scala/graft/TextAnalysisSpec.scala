package graft

import graft.operators.TextAnalysis
import graft.functions.{TextFunctions => TF}

class TextAnalysisSpec extends GraftSuite {

  test("t01 token counts are positive and ws==regex on punctuation-free text") {
    val rows = TextAnalysis.t01TokenCount(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ws_tokens") > 0)
      assert(r.getAs[Long]("n_re_tokens") >= r.getAs[Long]("n_ws_tokens"))
    }
  }

  test("t02 ratios stay in [0,1]") {
    TextAnalysis.t02QualityScore(spark, sf).collect().foreach { r =>
      Seq("punct_ratio", "stop_ratio", "quality").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v out of range")
      }
      assert(r.getAs[Double]("avg_tok_len") > 0)
    }
  }

  test("t03 confusion grid covers every document") {
    val n = TextAnalysis.t03LangId(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(n == Tables.documents(spark, sf).count())
  }

  test("t05 top tokens: doc_freq bounded by corpus size, descending") {
    val rows = TextAnalysis.t05TopTokens(spark, sf).collect()
    assert(rows.length == 25)
    val freqs = rows.map(_.getAs[Long]("doc_freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    assert(freqs.head <= Tables.documents(spark, sf).count())
  }

  test("t22 coverage curve: counts descend, cum share monotone, <= 1e6 ppm") {
    val rows = TextAnalysis.t22TokenCoverage(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val ppm = rows.map(_.getAs[Long]("cum_ppm"))
    assert(ppm.zip(ppm.tail).forall { case (a, b) => b >= a }, "cum share fell")
    assert(ppm.last <= 1000000L && ppm.head > 0L)
  }

  test("t23 frequency spectrum conserves type and occurrence totals") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.t23FreqSpectrum(spark, sf).collect()
    assert(rows.nonEmpty)
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.sameElements(freqs.sorted) && freqs.head >= 1L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_types") >= 1L)
      assert(r.getAs[Long]("mass") ==
        r.getAs[Long]("freq") * r.getAs[Long]("n_types"))
    }
    // conservation against an independent recompute: Σ n_types = |vocab|,
    // Σ mass = total token occurrences
    val tok = Tables.documents(spark, sf)
      .select(explode(TF.tokens(col("text"))).as("t"))
    assert(rows.map(_.getAs[Long]("n_types")).sum ==
      tok.select(countDistinct(col("t"))).head().getLong(0))
    assert(rows.map(_.getAs[Long]("mass")).sum == tok.count())
  }

  test("t24 intra-doc dedup counts the planted repeats and plans join-free") {
    import org.apache.spark.sql.functions._
    val df = TextAnalysis.t24IntraDocDedup(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every 5th non-empty doc gets exactly one planted repeat, so the
    // corpus-wide dup count is at least the planted-doc count (natural
    // chunk repeats can only add)
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
    val planted = docs.filter(pmod(col("doc_id"), lit(5)) === 0).count()
    val dupTotal = rows.map(_.getAs[Long]("dup_lines")).sum
    val affected = rows.map(_.getAs[Long]("docs_affected")).sum
    assert(dupTotal >= planted && planted > 0)
    assert(affected >= planted)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_lines") <= r.getAs[Long]("lines_total"))
      assert(r.getAs[Long]("docs_affected") <= r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // within-doc decision is per-row array arithmetic: no join anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"t24 must be join-free:\n$plan")
  }

  test("t06 bigram counts are positive and bigrams are two tokens") {
    val rows = TextAnalysis.t06BigramCounts(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[String]("bigram").split(" ").length == 2)
    }
  }

  test("t07 BM25: descending positive scores, hits contain a query term") {
    val rows = TextAnalysis.t07Bm25Search(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    Tables.documents(spark, sf).collect()
      .filter(r => hitIds.contains(r.getAs[Long]("doc_id")))
      .foreach { r =>
        val t = r.getAs[String]("text")
        assert(TextAnalysis.searchTerms.exists(t.contains), s"doc without any query term ranked")
      }
  }

  test("p01/p02 sampling: counts partition the corpus deterministically") {
    val p1 = graft.operators.Sampling.p01StratifiedSample(spark, sf).collect()
    assert(p1.map(_.getAs[Long]("n_total")).sum == Tables.documents(spark, sf).count())
    p1.foreach(r => assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total")))
    val p2 = graft.operators.Sampling.p02HashSplit(spark, sf).collect()
    assert(p2.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    val bySplit = p2.groupBy(_.getAs[String]("split")).view.mapValues(_.map(_.getAs[Long]("n_docs")).sum)
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
  }

  test("t12 entropy: per-source stats match a direct Scala recompute") {
    val rows = TextAnalysis.t12EntropyFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text"))
    def entropy(t: String): Double = {
      val counts = t.groupBy(identity).values.map(_.length.toDouble)
      val l = t.length.toDouble
      val log2 = (x: Double) => math.log(x) / math.log(2.0)
      log2(l) - counts.map(c => c * log2(c)).sum / l
    }
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(d => entropy(d._2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val hs = bySource(src)
      assert(r.getAs[Long]("n_docs") == hs.size)
      assert(r.getAs[Long]("n_low_entropy") ==
        hs.count(_ < TextAnalysis.EntropyThreshold))
      assert(math.abs(r.getAs[Double]("mean_entropy") - hs.sum / hs.size) < 2e-3,
        s"source $src mean entropy drifted")
    }
  }

  test("t13 surprisal: per-source stats match a direct Scala recompute") {
    val rows = TextAnalysis.t13UnigramSurprisal(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text"))
      .filter(_._2.trim.nonEmpty)
    val allToks = docs.flatMap(_._2.trim.split("\\s+"))
    val corpus = allToks.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val n = allToks.length.toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    def surprisal(t: String): Double = {
      val toks = t.trim.split("\\s+")
      log2(n) - toks.map(tk => log2(corpus(tk))).sum / toks.length
    }
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(d => surprisal(d._2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ss = bySource(src)
      assert(r.getAs[Long]("n_docs") == ss.size)
      assert(r.getAs[Long]("n_flagged") ==
        ss.count(_ > TextAnalysis.SurprisalThreshold))
      assert(math.abs(r.getAs[Double]("mean_surprisal") - ss.sum / ss.size) < 2e-3,
        s"source $src mean surprisal drifted")
    }
  }

  test("t19 bigram surprisal: per-source stats match a direct Scala recompute") {
    val rows = TextAnalysis.t19BigramSurprisal(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text")
        .trim.split("\\s+").toSeq)
      .filter(_._2.length >= 2)
    def bigrams(toks: Seq[String]) = toks.sliding(2).map(_.mkString(" ")).toSeq
    val cBg = docs.flatMap(d => bigrams(d._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val cU = cBg.toSeq.groupBy(_._1.split(" ", 2).head)
      .view.mapValues(_.map(_._2).sum).toMap
    val vocab = docs.flatMap(_._2).distinct.length
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    def surprisal(toks: Seq[String]): Double = {
      val bgs = bigrams(toks)
      bgs.map { bg =>
        val u = bg.split(" ", 2).head
        log2(cU.getOrElse(u, 0) + vocab.toDouble) - log2(cBg.getOrElse(bg, 0) + 1.0)
      }.sum / bgs.length
    }
    val bySource = docs.groupBy(_._1).view.mapValues(_.map(d => surprisal(d._2)))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ss = bySource(src)
      assert(r.getAs[Long]("n_docs") == ss.size)
      assert(r.getAs[Long]("n_flagged") ==
        ss.count(_ > TextAnalysis.BigramSurprisalThreshold))
      assert(math.abs(r.getAs[Double]("mean_bigram_surprisal") - ss.sum / ss.size)
        < 2e-3, s"source $src mean bigram surprisal drifted")
    }
    // order sensitivity — the property t13's unigram proxy lacks: a
    // reversed token stream keeps every unigram but scrambles bigrams,
    // so its corpus-LM surprisal must rise (unseen transitions hit the
    // +1 smoothing floor).
    // (per-doc it is only a strong tendency on this templated corpus —
    // short docs can reverse onto other templates' common bigrams)
    val sample = docs.filter(_._2.length >= 10).take(20)
    val orig = sample.map(d => surprisal(d._2))
    val rev = sample.map(d => surprisal(d._2.reverse))
    val raised = orig.zip(rev).count { case (o, r) => r > o }
    assert(raised > sample.length / 2,
      s"reversed docs should tend to score higher: only $raised/${sample.length}")
    assert(rev.sum / rev.length > orig.sum / orig.length,
      "mean surprisal of reversed docs must exceed the originals'")
  }

  test("t20 line dedup: per-source counts match a direct Scala recompute") {
    val rows = TextAnalysis.t20LineDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
      .filter(_._3.trim.nonEmpty)
    def docLines(id: Long, text: String): Seq[String] = {
      val toks = text.trim.split("\\s+").toSeq
      val chunks = toks.grouped(10).map(_.mkString(" ")).toSeq
      (if (id % 3 == 0) Seq(TextAnalysis.BoilerplateLines(0)) else Nil) ++
        chunks ++
        (if (id % 7 == 0) Seq(TextAnalysis.BoilerplateLines(1)) else Nil)
    }
    val all = docs.flatMap(d => docLines(d._1, d._3))
    val freq = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // the planted boilerplate is far past the cap; it must be removed
    assert(TextAnalysis.BoilerplateLines.forall(b =>
      freq(b) > TextAnalysis.LineDfCap))
    val bySource = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = bySource(src)
      val perDoc = ds.map { d =>
        val ls = docLines(d._1, d._3)
        (ls.length.toLong, ls.count(l => freq(l) > TextAnalysis.LineDfCap).toLong)
      }
      assert(r.getAs[Long]("n_docs") == ds.length)
      assert(r.getAs[Long]("lines_total") == perDoc.map(_._1).sum)
      assert(r.getAs[Long]("lines_removed") == perDoc.map(_._2).sum,
        s"source $src removed-line count diverged")
      assert(r.getAs[Long]("docs_affected") == perDoc.count(_._2 > 0))
    }
  }

  test("t21 BPE: textbook corpus yields the classic merge sequence; corpus run is deterministic") {
    // Sennrich et al. 2016's worked example: {low:5, lower:2, newest:6,
    // widest:3}. Hand-derived first five merges with lexicographic
    // tie-breaks: (e,s)=9 → es, (es,t)=9 → est, (est,</w>)=9 → est</w>,
    // (l,o)=7 → lo, (lo,w)=7 → low.
    val toy = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = TextAnalysis.bpeMerges(toy, merges = 5)
    val expected = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L))
    assert(got == expected, s"merge sequence diverged: $got")
    // real corpus: invariants + reproducibility
    val a = TextAnalysis.t21BpeVocabTrain(spark, sf).collect()
    val b = TextAnalysis.t21BpeVocabTrain(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "BPE training must be deterministic")
    assert(a.length == 20)
    a.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("merge_rank") == i + 1)
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left") + r.getAs[String]("right"))
      assert(r.getAs[Long]("pair_count") > 0L)
    }
  }

  /** Independent left-to-right BPE fuse (the textbook application pass),
    * written fresh here so the spec does not share code with either the
    * operator's column expression or bpeMerges' internal fuse. */
  private def fuseLtr(word: String, rules: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] =
      word.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))) :+ "</w>"
    for ((l, r) <- rules) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def encodeWords(words: Seq[String],
      rules: Seq[(String, String)]): Map[String, Seq[String]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    words.toDF("w")
      .select(col("w"), TextAnalysis.bpeEncodeWord(col("w"), rules).as("enc"))
      .collect()
      .map { r =>
        val syms = r.getString(1).split(TextAnalysis.BpeSep).filter(_.nonEmpty).toSeq
        r.getString(0) -> syms
      }.toMap
  }

  test("t25: column-expression merge application equals the driver fuse symbol-for-symbol") {
    // textbook corpus incl. the self-overlap trap [a,a,a,...] where a
    // separator-consuming replace would fuse every SECOND pair only
    val toy = Array("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "aaa" -> 2L, "aaaa" -> 1L, "aaaaa" -> 1L)
    val rules = TextAnalysis.bpeMerges(toy, merges = 8).map(m => (m._2, m._3))
    val got = encodeWords(toy.map(_._1).toSeq, rules)
    for ((w, _) <- toy)
      assert(got(w) == fuseLtr(w, rules), s"word '$w' fused differently")
    // real corpus digest: every top word must agree too
    val wc = TextAnalysis.bpeWordCounts(spark, sf, topWords = 4096)
    val corpusRules = TextAnalysis.bpeMerges(wc, merges = 20).map(m => (m._2, m._3))
    val gotCorpus = encodeWords(wc.map(_._1).toSeq, corpusRules)
    for ((w, _) <- wc)
      assert(gotCorpus(w) == fuseLtr(w, corpusRules), s"corpus word '$w' fused differently")
  }

  test("t25: applying the first k-1 merges reproduces merge k's trained pair count") {
    // the t21-consistency pin: re-tokenizing the training digest with a
    // rule prefix must reproduce the pair frequency each merge was
    // trained on (incl. overlapping adjacencies, weighted by word freq)
    val wc = TextAnalysis.bpeWordCounts(spark, sf, topWords = 4096)
    val trained = TextAnalysis.bpeMerges(wc, merges = 20)
    val rules = trained.map(m => (m._2, m._3))
    for (k <- Seq(1, 5, 10, 20)) {
      val (_, l, r, _, trainedCount) = trained(k - 1)
      val enc = encodeWords(wc.map(_._1).toSeq, rules.take(k - 1))
      val recount = wc.map { case (w, c) =>
        val syms = enc(w)
        c * syms.indices.dropRight(1).count(i => syms(i) == l && syms(i + 1) == r)
      }.sum
      assert(recount == trainedCount,
        s"merge $k ($l,$r): recounted $recount vs trained $trainedCount")
    }
  }

  test("t25: per-source token/byte report matches an independent recompute") {
    import org.apache.spark.sql.functions._
    val wc = TextAnalysis.bpeWordCounts(spark, sf, topWords = 4096)
    val rules = TextAnalysis.bpeMerges(wc, merges = 20).map(m => (m._2, m._3))
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .select("source", "text", "toks").collect()
    val bySource = docs.groupBy(_.getAs[String]("source"))
    val rows = TextAnalysis.t25BpeTokenize(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == bySource.keySet)
    for ((src, ds) <- bySource) {
      val words = ds.map(_.getSeq[String](2).size.toLong).sum
      val toks = ds.map(_.getSeq[String](2).map(w => fuseLtr(w, rules).length.toLong).sum).sum
      val bytes = ds.map(_.getAs[String]("text").getBytes("UTF-8").length.toLong).sum
      val r = rows(src)
      assert(r.getAs[Long]("n_docs") == ds.length)
      assert(r.getAs[Long]("words_total") == words, s"$src words diverged")
      assert(r.getAs[Long]("bpe_tokens") == toks, s"$src BPE token count diverged")
      assert(r.getAs[Long]("bytes_total") == bytes, s"$src bytes diverged")
      assert(r.getAs[Long]("milli_bytes_per_token") == bytes * 1000 / toks)
    }
  }

  test("t14 gopher rules: per-source flag counts match a direct Scala recompute") {
    val rows = TextAnalysis.t14GopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    // Mirror the query's deterministic structure-planting, then apply the
    // seven Gopher rules over the rebuilt text in plain Scala.
    def flags(id: Long, text: String): Seq[Boolean] = {
      val toks = text.trim.split("\\s+")
      val nChunks = ((toks.length + 9) / 10.0).floor.toLong
      val bmod = 1 + id % 4
      val emod = 2 + id % 4
      val nHash = if (id % 7 == 0) (1 + id % 12).toInt else 0
      val body = (1L to nChunks).map { j =>
        (if ((id + j) % bmod == 0) "- " else "") +
          toks.slice((j.toInt - 1) * 10, j.toInt * 10).mkString(" ") +
          (if ((id * 3 + j) % emod == 0) "..." else "")
      }
      val lines = if (nHash > 0) body :+ Seq.fill(nHash)("#").mkString(" ") else body
      val ftext = lines.mkString("\n")
      val words = ftext.trim.split("\\s+")
      val nW = words.length.toDouble
      val nL = lines.length.toDouble
      val sym = ftext.count(_ == '#') + "\\.\\.\\.".r.findAllIn(ftext).length
      val meanLen = words.map(_.length.toLong).sum / nW
      Seq(
        words.length < TextAnalysis.GopherMinWords ||
          words.length > TextAnalysis.GopherMaxWords,
        meanLen < 3.0 || meanLen > 10.0,
        sym / nW > 0.1,
        lines.count(_.startsWith("- ")) / nL >= 0.9,
        lines.count(_.endsWith("...")) / nL > 0.3,
        words.count(_.exists(c => c >= 'a' && c <= 'z')) / nW < 0.8,
        words.distinct.count(TF.stopwords.contains) < 2)
    }
    val expect = docs.groupBy(_._2).view.mapValues { ds =>
      val fs = ds.map(d => flags(d._1, d._3))
      (ds.size.toLong, (0 until 7).map(i => fs.count(_(i)).toLong),
        fs.count(f => !f.exists(identity)).toLong)
    }.toMap
    val flagCols = Seq("n_f_words", "n_f_wordlen", "n_f_symbol", "n_f_bullet",
      "n_f_ellipsis", "n_f_alpha", "n_f_stopword")
    rows.foreach { r =>
      val (nDocs, perFlag, nPass) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nDocs)
      flagCols.zip(perFlag).foreach { case (c, want) =>
        assert(r.getAs[Long](c) == want, s"${r.getAs[String]("source")} $c")
      }
      assert(r.getAs[Long]("n_pass") == nPass)
    }
    // the corpus must actually exercise the rules: each structural flag
    // fires somewhere, and some docs still pass
    Seq("n_f_bullet", "n_f_ellipsis", "n_f_words").foreach { c =>
      assert(rows.map(_.getAs[Long](c)).sum > 0, s"$c never fires")
    }
    assert(rows.map(_.getAs[Long]("n_pass")).sum > 0)
  }

  test("p06 token-budget mix: shares, clamps, and realized tokens track the budget") {
    import graft.operators.Sampling
    val rows = Sampling.p06TokenBudgetMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = Sampling.MixTokenBudget
    val share = budget / rows.length
    rows.foreach { r =>
      assert(r.getAs[Long]("share") == share)
      val ppm = r.getAs[Long]("rate_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      // the integer rate is exactly (share*1e6) div tok_total, clamped
      assert(ppm == math.min(1000000L, share * 1000000L / r.getAs[Long]("tok_total")))
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_total"))
    }
    // an undersized source must clamp to keep-everything
    val clamped = Sampling.p06TokenBudgetMix(spark, sf, budget = 100L * 1000 * 1000)
      .collect()
    clamped.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") == 1000000L)
      assert(r.getAs[Long]("tok_kept") == r.getAs[Long]("tok_total"))
    }
    // realized mix lands near the budget (fingerprint uniformity; each
    // source contributes ~share tokens, sampled at doc granularity)
    val kept = rows.map(_.getAs[Long]("tok_kept")).sum.toDouble
    assert(kept > 0.5 * budget && kept < 1.5 * budget,
      s"kept $kept tokens against budget $budget")
  }

  test("p08 quality sample: tiers match a driver recompute; keep rates ride the tier") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    val rows = Sampling.p08QualitySample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tier = r.getAs[Long]("tier")
      assert(tier >= 0L && tier <= 3L)
      assert(r.getAs[Long]("keep_ppm") == Sampling.QualityKeepPpm(tier.toInt))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tok_kept") <= r.getAs[Long]("tok_total"))
      if (tier == 3L) assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs"),
        "tier-3 docs must all keep")
      if (tier == 0L) assert(r.getAs[Long]("n_kept") == 0L, "tier-0 docs must drop")
    }
    // independent recompute of the tier assignment + kept counts
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("fp",
        graft.functions.NativeFunctions.polyFingerprint(col("toks")))
      .select("source", "toks", "fp").collect()
    val stop = graft.functions.TextFunctions.stopwords.toSet
    val want = docs.map { r =>
      val toks = r.getSeq[String](1)
      val n = toks.size.toLong
      val sumLen = toks.map(_.length.toLong).sum
      val nAlpha = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nStop = toks.distinct.count(stop).toLong
      val tier = (if (3 * n <= sumLen && sumLen <= 10 * n) 1 else 0) +
        (if (5 * nAlpha >= 4 * n) 1 else 0) + (if (nStop >= 2) 1 else 0)
      val kept = r.getLong(2) % 1000000L < Sampling.QualityKeepPpm(tier)
      ((r.getString(0), tier.toLong), (1L, if (kept) 1L else 0L, n, if (kept) n else 0L))
    }.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).reduce((a, b) =>
        (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    }
    val got = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("tier")) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("tok_total"), r.getAs[Long]("tok_kept"))).toMap
    assert(got == want, s"p08 audit diverged:\ngot  $got\nwant $want")
  }

  test("p09 epoch mix: repeat arithmetic exact, cap respected, both branches covered") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    def check(rows: Array[org.apache.spark.sql.Row], maxEpochs: Long): Unit =
      rows.foreach { r =>
        val full = r.getAs[Long]("full_epochs")
        assert(full >= 0L && full <= maxEpochs)
        if (full >= maxEpochs) assert(r.getAs[Long]("partial_ppm") == 0L,
          "capped sources must not schedule a partial pass")
        assert(r.getAs[Long]("tok_planned") ==
          full * r.getAs[Long]("tok_total") + r.getAs[Long]("partial_tok"))
        assert(r.getAs[Long]("partial_tok") <= r.getAs[Long]("tok_total"))
      }
    check(Sampling.p09EpochMix(spark, sf).collect(), Sampling.MaxEpochs)
    // repeat branch: a budget far above the corpus caps every source
    val capped = Sampling.p09EpochMix(spark, sf, budget = 1000L * 1000 * 1000,
      maxEpochs = 4L).collect()
    assert(capped.nonEmpty)
    capped.foreach { r =>
      assert(r.getAs[Long]("full_epochs") == 4L)
      assert(r.getAs[Long]("tok_planned") == 4L * r.getAs[Long]("tok_total"))
    }
    check(capped, 4L)
    // partial branch: a small budget leaves full_epochs = 0 and realizes
    // the fingerprint-sampled pass; recompute one source driver-side
    val partial = Sampling.p09EpochMix(spark, sf, budget = 1000L,
      maxEpochs = 4L).collect()
    check(partial, 4L)
    assert(partial.forall(_.getAs[Long]("full_epochs") == 0L))
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .withColumn("fp", graft.functions.NativeFunctions.polyFingerprint(col("toks")))
      .select(col("source"), col("fp"), size(col("toks")).cast("long").as("n"))
      .collect()
    partial.foreach { r =>
      val src = r.getAs[String]("source")
      val want = docs.filter(_.getString(0) == src)
        .filter(d => d.getLong(1) % 1000000L < r.getAs[Long]("partial_ppm"))
        .map(_.getLong(2)).sum
      assert(r.getAs[Long]("partial_tok") == want,
        s"$src partial pass diverged: got ${r.getAs[Long]("partial_tok")} want $want")
    }
  }

  test("p07 epoch shuffle: reproducible, epoch re-permutes, shards range-ordered") {
    import graft.operators.Sampling
    val e1 = Sampling.p07EpochShuffle(spark, sf, epoch = 1L).collect()
    val e1b = Sampling.p07EpochShuffle(spark, sf, epoch = 1L).collect()
    assert(e1.map(_.toString).toSeq == e1b.map(_.toString).toSeq,
      "same epoch must reproduce the identical layout")
    // docs conserved across shards
    val n = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text"))) > 0).count()
    assert(e1.map(_.getAs[Long]("n_docs")).sum == n)
    // range binning: consecutive shards' key ranges are disjoint and
    // ascending — concatenating shards replays the permuted order
    val rows = e1.sortBy(_.getAs[Long]("shard"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"),
          s"shard key ranges overlap: $a vs $b")
      case _ =>
    }
    // a different epoch is a different permutation: the per-shard doc
    // counts cannot all agree (the multiplier changes, not an offset)
    val e2 = Sampling.p07EpochShuffle(spark, sf, epoch = 2L).collect()
    val c1 = e1.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    val c2 = e2.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(c1 != c2, "epoch 2 must re-permute the shard assignment")
    // rough balance under the LCG key (no shard 10x over the mean)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= 10 * (n / counts.length.max(1) + 1),
      s"shard skew: max=${counts.max} over ${counts.length} shards of ~${n / counts.length.max(1)}")
  }

  test("t15 HLL: registers and estimate match a direct Scala recompute, error within theory") {
    val rows = TextAnalysis.t15HllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = TextAnalysis.HllBuckets
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(s: String): Long = synchronized {
      md.reset()
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_))
          .mkString.take(15), 16)
    }
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text"))
    val shingles = docs.flatMap { case (src, text) =>
      val toks = text.trim.split("\\s+")
      (0 to toks.length - 3).map(i => src -> toks.slice(i, i + 3).mkString(" "))
    }
    shingles.groupBy(_._1).foreach { case (src, ss) =>
      val regs = Array.fill(m)(0)
      ss.foreach { case (_, s) =>
        val v = hash60(s)
        val b = (v % m).toInt
        val w = v >>> 8
        val rho = if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(b)) regs(b) = rho
      }
      val bigS = regs.map(r => 1L << (53 - r)).sum
      val zeros = regs.count(_ == 0)
      val raw = TextAnalysis.HllAlphaNumer / bigS.toDouble
      val est = if (zeros > 0 && raw <= 2.5 * m)
        TextAnalysis.HllLinearCount(zeros - 1) else raw
      val row = rows.find(_.getAs[String]("source") == src).get
      assert(row.getAs[Long]("hll_s") == bigS, s"$src register sum")
      assert(row.getAs[Long]("zero_regs") == zeros.toLong)
      assert(row.getAs[Long]("hll_est_x1000") == math.floor(est * 1000.0).toLong)
      val exact = row.getAs[Long]("n_distinct_exact").toDouble
      assert(math.abs(est / exact - 1.0) < 0.25,
        s"$src estimate $est vs exact $exact outside 25%")
    }
  }

  test("p04 mixture: temperature flattening upweights rare sources, all-integer output") {
    val rows = graft.operators.Sampling.p04MixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == n)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("sample_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
    }
    // tau=0.5: sampling rate must be (weakly) monotone DECREASING in
    // source size — the whole point of temperature flattening
    val bySize = rows.sortBy(_.getAs[Long]("n_total"))
    bySize.sliding(2).foreach {
      case Array(small, big) =>
        assert(small.getAs[Long]("sample_ppm") >= big.getAs[Long]("sample_ppm"),
          s"rate not flattened: ${small} vs ${big}")
      case _ =>
    }
    // realized sample lands near the 20% target (fingerprint uniformity)
    val sampled = rows.map(_.getAs[Long]("n_sampled")).sum.toDouble
    assert(sampled > 0.08 * n && sampled < 0.40 * n,
      s"sampled $sampled of $n — far from the 20% target")
  }

  test("t16 tf-idf: scores recompute from (tf, df, N) and come out ordered") {
    val n = Tables.documents(spark, sf)
      .filter("length(trim(text)) > 0").count().toDouble
    val rows = TextAnalysis.t16TfidfKeywords(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (tf, df) = (r.getAs[Long]("tf"), r.getAs[Long]("df"))
      assert(tf >= 1L && df >= 1L && df <= n.toLong)
      val expect = tf * (math.log(n / df) / math.log(2.0))
      assert(math.abs(r.getAs[Double]("tfidf") - expect) < 1e-3,
        s"tfidf drifted for ${r.getAs[String]("term")}")
    }
    val scores = rows.map(_.getAs[Double]("tfidf"))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("p05 packing: chunk layout conserves docs and tokens per source") {
    import org.apache.spark.sql.functions.{col, length => slen, size => ssize, split, trim => strim, sum => ssum}
    val truth = Tables.documents(spark, sf)
      .filter(slen(strim(col("text"))) > 0)
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        ssum(ssize(split(strim(col("text")), "\\s+")).cast("long")).as("tok"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("tok"))).toMap
    val rows = graft.operators.Sampling.p05PackChunks(spark, sf).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val (nDocs, nTok) = truth(src)
      assert(rs.map(_.getAs[Long]("n_docs")).sum == nDocs,
        s"$src lost documents in packing")
      assert(rs.map(_.getAs[Long]("n_tokens")).sum == nTok,
        s"$src lost tokens in packing")
      val chunks = rs.map(_.getAs[Long]("chunk")).sorted
      assert(chunks.head == 0L, s"$src does not start at chunk 0")
      assert(chunks.distinct.length == chunks.length)
      // doc ranges of consecutive chunks never interleave
      val ordered = rs.sortBy(_.getAs[Long]("chunk"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
            s"$src chunk doc ranges interleave")
        case _ =>
      }
    }
  }

  test("t17 hashed classifier: logits are mean-centered and flags match sign") {
    val rows = TextAnalysis.t17HashedClassifier(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf)
      .filter("length(trim(text)) > 0").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
      // pseudo-weights are uniform on [-0.5, 0.5): per-source means must
      // hover near 0 (a wide miss means the hash mixing is broken)
      assert(math.abs(r.getAs[Double]("mean_logit")) < 0.2,
        s"${r.getAs[String]("source")} mean logit far from center")
    }
    // and the flag fraction is sane overall, not degenerate 0%/100%
    val flagged = rows.map(_.getAs[Long]("n_flagged")).sum.toDouble / nDocs
    assert(flagged > 0.05 && flagged < 0.95, s"degenerate flag rate $flagged")
  }

  test("t17 weighted variant: broadcast weight join, value parity when weights := hash") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // weight table := the hash weights, computed through the SAME column
    // expressions t17 uses (no hand-replicated hash math to drift), then
    // collected into a small local table so the audited plan's only new
    // node is the broadcast join itself
    val wRows = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select(explode(TF.tokens(col("text"))).as("t")).distinct()
      .select(col("t"), ((TF.tokenVal(col("t")) * lit(TextAnalysis.ClfA)
        + lit(TextAnalysis.ClfB)) % lit(TF.HashMod)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val weights = wRows.toDF("t", "w")
    val base = TextAnalysis.t17HashedClassifier(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_flagged"), r.getAs[Double]("mean_logit"))).toSeq
    val weighted = TextAnalysis.t17WeightedClassifier(spark, sf, weights)
    val got = weighted.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_flagged"), r.getAs[Double]("mean_logit"))).toSeq
    assert(got == base, s"weighted(hash) must equal t17: got=$got base=$base")
    // plan shape: t17's pipeline plus exactly one broadcast hash join for
    // the weight lookup; the doc aggregation stays partial-aggregable
    weighted.collect()
    val s = weighted.queryExecution.executedPlan.toString
    // (the join shows once per perDoc consumer — totals branch + main
    // branch — exactly like t17's own duplicated agg subtree)
    assert("BroadcastHashJoin".r.findAllIn(s).nonEmpty,
      s"weight lookup must be a broadcast hash join:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"weight join must not shuffle the token stream:\n$s")
    // OOV tokens score 0: an empty weight table still covers every doc
    val oov = TextAnalysis.t17WeightedClassifier(spark, sf,
      Seq.empty[(String, Long)].toDF("t", "w")).collect()
    assert(oov.map(_.getAs[Long]("n_docs")).sum ==
      base.map(_._2).sum, "OOV-only scoring must not drop docs")
  }

  test("t18 url filter: domain partition matches planting, blocklist exact") {
    val rows = TextAnalysis.t18UrlFilter(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total,
      "every doc must resolve to exactly one registered domain")
    assert(rows.map(_.getAs[String]("domain")).toSet ==
      TextAnalysis.UrlDomains.toSet,
      "subdomain stripping must recover exactly the planted domain pool")
    rows.foreach { r =>
      val expectBlocked =
        TextAnalysis.UrlBlocklist.contains(r.getAs[String]("domain"))
      assert((r.getAs[Long]("blocked") == 1L) == expectBlocked,
        s"${r.getAs[String]("domain")} blocklist decision wrong")
    }
    // the planting rotation distributes docs near-evenly over 5 domains
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= total / UrlSkewTolerance,
      s"planting rotation skewed: ${counts.toSeq}")
  }
  private val UrlSkewTolerance = 4L

  test("t10 PII scrub: detected counts match the planting rules, zero residual") {
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val rows = TextAnalysis.t10PiiScrub(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_residual") == 0L),
      "redaction left PII behind")
    // planting rules: email at id%3==0 plus a second at id%9==0,
    // ip at id%2==0, phone at id%5==0
    assert(rows.map(_.getAs[Long]("n_emails")).sum ==
      ids.count(_ % 3 == 0) + ids.count(_ % 9 == 0))
    assert(rows.map(_.getAs[Long]("n_ips")).sum == ids.count(_ % 2 == 0))
    assert(rows.map(_.getAs[Long]("n_phones")).sum == ids.count(_ % 5 == 0))
  }

  test("t11 repetition fractions are valid and match a direct recompute") {
    val rows = TextAnalysis.t11RepetitionFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val frac = r.getAs[Double]("avg_dup_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_docs"))
    }
    // ground truth on the raw text
    val bySource = Tables.documents(spark, sf).select("source", "text").collect()
      .map { r =>
        val toks = r.getAs[String]("text").trim.split("\\s+")
        val grams = toks.sliding(3).map(_.mkString(" ")).toSeq
        (r.getAs[String]("source"), 1.0 - grams.distinct.size.toDouble / grams.size)
      }.groupBy(_._1)
    rows.foreach { r =>
      val fr = bySource(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_docs") == fr.length)
      assert(math.abs(r.getAs[Double]("avg_dup_frac") - fr.sum / fr.length) < 1e-3)
    }
  }

  test("t04 fingerprints are stable and mostly distinct") {
    val fps = TextAnalysis.t04Fingerprint(spark, sf).collect()
      .map(_.getAs[Long]("fingerprint"))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
    // vocabulary-soup corpus: distinct texts should yield distinct prints
    assert(fps.distinct.length > fps.length * 9 / 10)
  }

  test("t26 PMI collocations match a direct Scala recompute and honor the count floor") {
    val rows = TextAnalysis.t26PmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val docs = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split("\\s+").toSeq).filter(_.length >= 2)
    val cBg = docs.flatMap(_.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cT = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nBg = cBg.values.sum.toDouble
    val nUni = cT.values.sum.toDouble
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    def pmi(bg: String): Double = {
      val Array(u, w) = bg.split(" ", 2)
      log2(cBg(bg).toDouble) + 2 * log2(nUni) - log2(nBg) -
        log2(cT(u).toDouble) - log2(cT(w).toDouble)
    }
    rows.foreach { r =>
      val bg = r.getAs[String]("bigram")
      assert(r.getAs[Long]("n") == cBg(bg), s"count mismatch for '$bg'")
      assert(r.getAs[Long]("n") >= TextAnalysis.PmiMinCount,
        s"hapax floor violated: '$bg' n=${r.getAs[Long]("n")}")
      assert(math.abs(r.getAs[Double]("pmi") - pmi(bg)) < 2e-3,
        s"PMI drifted for '$bg': ${r.getAs[Double]("pmi")} vs ${pmi(bg)}")
    }
    // the list is the global top: no eligible bigram outside it scores
    // strictly above the last returned row (rounded, bigram tie-break)
    val floor = rows.map(r => (r.getAs[Double]("pmi"), r.getAs[String]("bigram"))).min
    val better = cBg.filter(_._2 >= TextAnalysis.PmiMinCount).keys
      .map(bg => (math.rint(pmi(bg) * 1000) / 1000, bg))
      .count(p => p._1 > floor._1 || (p._1 == floor._1 && p._2 < floor._2))
    assert(better <= 24, s"$better eligible bigrams rank above the returned floor")
  }

  test("t27 URL dedup collapses tracking-param mirrors to canonical groups, vs a driver recompute") {
    val rows = TextAnalysis.t27UrlDedup(spark, sf).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_canonical"),
          r.getAs[Long]("n_dup_docs"))).toMap
    assert(rows.nonEmpty)
    // recompute from the planting rule: canonical = (domain, item id)
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val subs = Seq("www", "m", "cdn")
    val byDom = ids.groupBy(id =>
      TextAnalysis.UrlDomains(((id / 3) % TextAnalysis.UrlDomains.size).toInt))
    byDom.foreach { case (dom, ds) =>
      val (u, c, d) = rows(dom)
      assert(u == ds.length, s"$dom url count")
      val canon = ds.map(_ / 3).distinct.length
      assert(c == canon, s"$dom canonical count: $c vs $canon")
      assert(d == ds.length - canon, s"$dom dup accounting")
    }
    // canonicalization is the ONLY collapse: raw URLs are all distinct
    // (unique utm param), so dups exist iff a group has >= 2 docs
    assert(rows.values.map(_._3).sum > 0, "planting must create canonical dups")
    assert(subs.length == 3) // the subdomain rotation the canonical strips
  }

  test("t28 classifier training separates the weak labels; exported table tracks the model") {
    import org.apache.spark.sql.functions._
    // audit accounting + both classes present
    val audit = TextAnalysis.t28TrainQualityClassifier(spark, sf).collect()
    assert(audit.nonEmpty)
    val (nDocs, nWeak, nAgree) = (
      audit.map(_.getAs[Long]("n_docs")).sum,
      audit.map(_.getAs[Long]("n_weak_pos")).sum,
      audit.map(_.getAs[Long]("n_agree")).sum)
    assert(nWeak > 0 && nWeak < nDocs,
      s"weak labels must be non-degenerate: $nWeak of $nDocs")
    // self-fit on unigram-expressible rules must beat chance by a wide
    // margin (threshold, not exact value — LBFGS last-ulp varies)
    assert(nAgree.toDouble / nDocs >= 0.75,
      s"classifier agrees on only $nAgree/$nDocs")
    val scored = TextAnalysis.t28Scored(spark, sf).collect()
    val acc = scored.count(r => r.getAs[Long]("weak") == r.getAs[Long]("pred"))
    assert(acc == nAgree, "audit rollup must match the per-doc scoring")
    // deployment bridge: the quantized top-K token table scored through
    // the EXISTING gated t17 operator reproduces the corpus totals
    val (weights, interceptQ) = TextAnalysis.t28ExportWeights(spark, sf)
    assert(weights.count() > 0 &&
      weights.collect().exists(_.getAs[Long]("w") != 0L),
      "exported table must carry signal")
    val t17Rows = TextAnalysis.t17WeightedClassifier(spark, sf, weights).collect()
    assert(t17Rows.nonEmpty &&
      t17Rows.map(_.getAs[Long]("n_docs")).sum > 0,
      "t17 must score with the trained table")
    // export fidelity: per-doc integer table scores must rank docs the
    // way the model's own raw scores do — compare sign-of-score
    // agreement between the quantized-table sum and the model prediction
    val tokW = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .join(broadcast(weights), Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = scored.map(r => r.getLong(0) -> r.getAs[Long]("pred")).toMap
    val both = byDoc.keys.filter(tokW.contains).toSeq
    val agree = both.count { id =>
      val tablePred = if (tokW(id) + interceptQ > 0) 1L else 0L
      tablePred == byDoc(id)
    }
    assert(agree.toDouble / both.size >= 0.7,
      s"quantized table diverged from the model: $agree/${both.size}")
  }

  test("t29: vocab growth curve is monotone and its 100% point is the exact corpus totals") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.t29VocabGrowth(spark, sf).collect()
      .map(r => (r.getAs[Long]("pct"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("vocab")))
    assert(rows.nonEmpty && rows.last._1 == 100L)
    // nested subsets => every column non-decreasing in the threshold
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4,
          s"growth curve not monotone between $a and $b")
      case _ =>
    }
    // the 100% point IS the whole corpus — recompute exactly
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val nDocs = docs.count()
    val occ = docs.agg(sum(size(col("toks")).cast("long"))).head().getLong(0)
    val vocab = docs.select(explode(col("toks")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    assert(rows.last == ((100L, nDocs, occ, vocab)),
      s"100% point ${rows.last} != corpus totals ($nDocs, $occ, $vocab)")
    // Heaps: vocabulary grows sub-linearly — the curve must be concave
    // enough that half the corpus already carries well over half the
    // final vocabulary (measured ~0.8+; pinned loosely)
    val half = rows.find(_._1 == 50L).get
    assert(half._4 * 10 >= vocab * 6,
      s"50% subset carries only ${half._4}/$vocab of the vocabulary")
  }

  test("t31: source drift matches a driver recompute; a disjoint-vocab source maximizes drift") {
    // independent integer recompute of the full statistic on the sf corpus
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val st = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { case (src, text) =>
      text.trim.split("\\s+").foreach(t => st((src, t)) = st.getOrElse((src, t), 0L) + 1)
    }
    val srcTotal = st.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val corpTok = st.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val corpTotal = srcTotal.values.sum
    val want = srcTotal.keys.map { src =>
      val present = st.collect { case ((`src`, t), n) => (t, n) }
      val l1 = present.map { case (t, n) =>
        math.abs(n * 1000000L / srcTotal(src) - corpTok(t) * 1000000L / corpTotal)
      }.sum
      val mass = present.map { case (t, _) => corpTok(t) * 1000000L / corpTotal }.sum
      src -> (docs.count(_._1 == src).toLong, srcTotal(src), l1 + (1000000L - mass))
    }.toMap
    val got = TextAnalysis.t31SourceDrift(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("l1_ppm"))).toMap
    assert(got == want, s"drift diverged:\n got  $got\n want $want")
    // planted fixture: a source sharing the corpus blend vs one with a
    // fully DISJOINT vocabulary — drift must separate them decisively
    import spark.implicits._
    import org.apache.spark.sql.functions.{length, lit}
    val blend = (1 to 20).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, "a", blend), (2L, "a", blend), (3L, "b", blend),
      (4L, "weird", (1 to 20).map(i => s"alien$i").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("t31drift").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en")).withColumn("n_chars", length($"text"))
      .write.parquet(s"$dir/documents.parquet")
    val fx = TextAnalysis.t31SourceDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("l1_ppm")).toMap
    assert(fx("weird") > fx("a") && fx("weird") > fx("b"),
      s"disjoint-vocab source must drift most: $fx")
    // a fully-disjoint source: every own token at ppm_c = its corpus
    // share, plus the full absent mass — 1.5e6 at a 1/4 doc share
    assert(fx("weird") > 1200000L, s"disjoint source drift too low: ${fx("weird")}")
  }

  test("t32: code detection matches a driver recompute; flags exactly the planted class") {
    import org.apache.spark.sql.functions._
    val snippet = TextAnalysis.CodeSnippet
    val symSet = "{}();=<>#/".toSet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.nonEmpty)
    val model = docs.map { case (id, src, text) =>
      val t = if (id % TextAnalysis.CodePlantMod == TextAnalysis.CodePlantRem)
        text + snippet * (text.length / 64 + 1) else text
      val sym = t.count(symSet)
      (id, src, sym.toLong * 1000000L / t.length)
    }
    val perSource = model.groupBy(_._2).map { case (src, xs) =>
      src -> (xs.size.toLong,
        xs.count(_._3 >= TextAnalysis.CodeFlagPpm).toLong,
        xs.map(_._3).sum)
    }
    val got = TextAnalysis.t32CodeDetect(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_code"),
          r.getAs[Long]("code_share_ppm"), r.getAs[Long]("mean_sym_ppm"))).toMap
    perSource.foreach { case (src, (nd, nc, ppmSum)) =>
      val g = got(src)
      assert(g == ((nd, nc, nc * 1000000L / nd, ppmSum / nd)),
        s"$src diverged: got $g want ($nd, $nc, ...)")
    }
    // the flag is DECISIVE: every planted doc flags, nothing else does
    val planted = model.filter(_._1 % TextAnalysis.CodePlantMod ==
      TextAnalysis.CodePlantRem)
    assert(planted.nonEmpty)
    assert(planted.forall(_._3 >= 2 * TextAnalysis.CodeFlagPpm),
      "planted snippet density must clear the threshold with 2x margin")
    assert(got.values.map(_._2).sum == planted.size.toLong,
      "flag set must be exactly the planted class")
    // and the PRODUCTION entry on the unplanted corpus flags zero:
    // prose carries none of the code-symbol class
    val natural = TextAnalysis.t32CodeDetectOf(
      Tables.documents(spark, sf).filter(length(col("text")) > 0)).collect()
    assert(natural.map(_.getAs[Long]("n_code")).sum == 0L)
  }

  test("t30: novelty scan matches a driver df-recompute; exact dups score zero novelty") {
    import org.apache.spark.sql.functions._
    val P = 1000000007L
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.trim.split("\\s+").length >= 3)
      .map { case (id, src, text) =>
        val tv = text.trim.split("\\s+").map(dTokenVal)
        val sh = tv.sliding(3).map(w =>
          (w(0) * 1000003L + w(1) * 31L + w(2)) % P).toSeq.distinct
        (id, src, sh)
      }
    val dfOf = docs.flatMap(_._3).groupBy(identity).map { case (h, xs) => h -> xs.size }
    val perSource = docs.map { case (_, src, sh) =>
      val uniq = sh.count(h => dfOf(h) == 1)
      val flagged = uniq.toLong * 1000000L / sh.size < TextAnalysis.NoveltyFlagPpm
      (src, sh.size.toLong, uniq.toLong, flagged)
    }.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.size.toLong, xs.count(_._4).toLong,
        xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val got = TextAnalysis.t30NoveltyScan(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_flagged"),
          r.getAs[Long]("sh_total"), r.getAs[Long]("sh_unique"),
          r.getAs[Long]("novelty_ppm"))).toMap
    perSource.foreach { case (src, (nd, nf, st, su)) =>
      val g = got(src)
      assert((g._1, g._2, g._3, g._4) == ((nd, nf, st, su)),
        s"$src diverged: got $g want ($nd,$nf,$st,$su)")
      assert(g._5 == su * 1000000L / st)
    }
    // the corpus's planted exact-dup docs share EVERY shingle with
    // their twin, so at least one source must carry flagged docs
    assert(got.values.map(_._2).sum > 0, "exact dups must surface as low-novelty")
  }

  // ─────────────── p13: classifier-score-tiered sampling ────────────────

  /** Driver tokenVal — TF.tokenVal's formula, codepoint semantics. */
  private def dTokenVal(w: String): Long =
    w.codePointCount(0, w.length).toLong * 961L +
      w.codePointAt(0).toLong * 31L + w.codePointBefore(w.length).toLong

  /** Independent driver recompute of the whole p13 tail from per-doc
    * (doc_id, source, fp, n_tok, score) rows: stride sample, quartile
    * cut scores, tier, keep decision, rollup. */
  private def p13DriverRollup(perDoc: Seq[(Long, String, Long, Long, Long)])
      : (Map[(String, Long), (Long, Long, Long, Long)], (Long, Long, Long)) = {
    val n = perDoc.size.toLong
    val stride = math.max(1L, n / 4096)
    // the stride class anchors at the minimum doc_id's remainder (non-
    // empty by construction on any id space) — p13Boundaries' rule
    val anchor = perDoc.map(_._1).min % stride
    val sample = perDoc.filter(_._1 % stride == anchor).map(d => (d._5, d._1)).sorted
    val ns = sample.length
    def bnd(k: Int): Long = sample(math.max(0, ns * k / 4 - 1))._1
    val bs = (bnd(1), bnd(2), bnd(3))
    val keepPpm = graft.operators.Sampling.QualityKeepPpm
    val rows = perDoc.map { case (_, src, fp, nTok, score) =>
      val tier = Seq(bs._1, bs._2, bs._3).count(score > _)
      val ppm = keepPpm(tier)
      val kept = fp % 1000000L < ppm
      ((src, tier.toLong), (1L, if (kept) 1L else 0L, nTok, if (kept) nTok else 0L))
    }
    val rolled = rows.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).reduce((a, b) =>
        (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    }
    (rolled, bs)
  }

  /** Per-doc (doc_id, source, fp, n_tok) with driver-split tokens. fp
    * comes from the native expression (pinned separately in
    * NativeExprSpec); everything downstream is recomputed here. */
  private def p13DocBase(): Seq[(Long, String, Long, Long, Seq[String])] = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        graft.functions.NativeFunctions.polyFingerprint(col("toks")).as("fp"),
        col("text"))
      .collect().toSeq.map { r =>
        val toks = r.getString(3).trim.split("\\s+").toSeq
        (r.getLong(0), r.getString(1), r.getLong(2), toks.size.toLong, toks)
      }
  }

  test("p13: hashed-score tiering matches the driver recompute (boundaries and rollup)") {
    val perDoc = p13DocBase().map { case (id, src, fp, nTok, toks) =>
      val score = toks.map(t =>
        (dTokenVal(t) * TextAnalysis.ClfA + TextAnalysis.ClfB) % TF.HashMod).sum
      (id, src, fp, nTok, score)
    }
    val (expected, bs) = p13DriverRollup(perDoc)
    val gotB = graft.operators.Sampling.p13Boundaries(
      graft.operators.Sampling.p13ScoredHashed(spark, sf), perDoc.size.toLong,
      perDoc.map(_._1).min)
    assert(gotB == bs, s"cut scores diverged: $gotB vs $bs")
    val got = graft.operators.Sampling.p13ScoreSample(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tier")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("tok_total"), r.getAs[Long]("tok_kept"))).toMap
    assert(got == expected, "hashed-score rollup diverged from driver recompute")
  }

  test("p13b: trained-table tiering closes the DCLM loop and matches the driver recompute") {
    val (weights, interceptQ) = TextAnalysis.t28ExportWeights(spark, sf)
    val wMap = weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wMap.values.exists(_ != 0L), "trained table must carry signal")
    val perDoc = p13DocBase().map { case (id, src, fp, nTok, toks) =>
      val score = toks.map(wMap.getOrElse(_, 0L)).sum + interceptQ
      (id, src, fp, nTok, score)
    }
    val (expected, bs) = p13DriverRollup(perDoc)
    val gotB = graft.operators.Sampling.p13Boundaries(
      graft.operators.Sampling.p13ScoredTrained(spark, sf), perDoc.size.toLong,
      perDoc.map(_._1).min)
    assert(gotB == bs, s"trained cut scores diverged: $gotB vs $bs")
    val got = graft.operators.Sampling.p13bTrainedSample(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tier")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("tok_total"), r.getAs[Long]("tok_kept"))).toMap
    assert(got == expected, "trained-score rollup diverged from driver recompute")
    // the trained tiering must actually separate: the top tier's keep
    // rate is 100% while the bottom tier drops everything (DCLM shape)
    val keepPpm = graft.operators.Sampling.QualityKeepPpm
    assert(keepPpm(3) == 1000000L && keepPpm(0) == 0L)
    assert(got.keys.exists(_._2 == 3L) && got.keys.exists(_._2 == 0L),
      "corpus must populate both extreme tiers")
  }
}
