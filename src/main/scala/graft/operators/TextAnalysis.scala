package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF, TextSql => TS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.C — text-analysis operators over the documents table.
  *
  * All four are map-side column pipelines (scan → project → optional agg):
  * at 100 TB each is embarrassingly parallel with zero or one shuffle, and
  * every expression is codegen'd (no UDFs). Oracle SQL lives alongside each
  * operator and reuses the [[graft.functions.TextSql]] fragments so hash
  * arithmetic matches DuckDB exactly.
  */
object TextAnalysis {

  private def docsWithTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("toks", TF.tokens(col("text")))

  /** t01: token counting — whitespace tokens and BPE-ish regex tokens. */
  def t01TokenCount(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("n_re_tokens"))
      .orderBy("doc_id")

  /** t02: quality scoring — length/punctuation/stopword-ratio heuristics.
    * Ratios are computed raw, combined, then rounded once at the output
    * edge (both engines see identical double op order). */
  def t02QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nTok: Column = size(col("toks"))
    val stopRatio: Column = TF.stopwordHits(col("toks")) / nTok
    val punctRatio: Column =
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))) /
        length(col("text"))
    val sumTokLen: Column =
      aggregate(transform(col("toks"), t => length(t)), lit(0), (a, x) => a + x)
    val quality: Column = least(nTok / 100.0, lit(1.0)) * 0.5 + stopRatio * 0.5
    docsWithTokens(spark, dir).select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stop_ratio"),
      round(sumTokLen / nTok, 4).as("avg_tok_len"),
      round(quality, 4).as("quality"))
      .orderBy("doc_id")
  }

  /** t03: language-ID heuristic — marker-token hits per language, argmax
    * with deterministic tie-break order en > es > de, 'und' when no hits.
    * Output is the (actual, predicted) confusion grid. */
  def t03LangId(spark: SparkSession, dir: String): DataFrame = {
    val en = TF.markerHits(col("toks"), "en")
    val es = TF.markerHits(col("toks"), "es")
    val de = TF.markerHits(col("toks"), "de")
    val pred = when(en === 0 && es === 0 && de === 0, "und")
      .when(en >= es && en >= de, "en")
      .when(es >= de, "es")
      .otherwise("de")
    docsWithTokens(spark, dir)
      .select(col("lang"), pred.as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }

  /** t04: document fingerprinting — polynomial rolling hash over token
    * values (Rabin–Karp), mod 1e9+7, via the native codegen'd
    * [[graft.functions.PolyFingerprintExpr]] (value-identical to the
    * declarative [[TF.polyFingerprint]] fold; NativeExprSpec proves it). */
  def t04Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir)
      .select(col("doc_id"),
        graft.functions.NativeFunctions.polyFingerprint(col("toks")).as("fingerprint"))
      .orderBy("doc_id")

  /** t05: corpus heavy hitters — top-25 tokens by document frequency.
    * Explode → two-level agg; the explode and both aggs are map-partial
    * first, so at 100 TB the shuffle carries one row per (token, partial
    * count), not one per occurrence. */
  def t05TopTokens(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir)
      .select(col("doc_id"), explode(array_distinct(col("toks"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(25)

  /** t06: bigram counts — the n-gram LM statistic. Same partial-agg
    * shape as t05; bigrams are built positionally off the token array. */
  def t06BigramCounts(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir)
      .filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("toks")) - lit(1)),
        i => concat_ws(" ", element_at(col("toks"), i), element_at(col("toks"), i + lit(1)))))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(25)

  /** Query terms for t07 (all in the corpus vocabulary). */
  val searchTerms: Seq[String] = Seq("spark", "window", "hash")

  /** t07: BM25 scored search — rank documents against a term query.
    * k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1). Two tiny shuffles
    * (df per term, score per doc) plus broadcast scalars; the corpus
    * scan itself is one pass. At 100 TB the df/avgdl statistics come
    * from the same aggregation, just precomputed once and reused across
    * queries. */
  def t07Bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val terms = spark.createDataFrame(searchTerms.map(Tuple1.apply)).toDF("term")
    val docs = docsWithTokens(spark, dir)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("double").as("dl"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs.crossJoin(broadcast(terms))
      .select(col("doc_id"), col("dl"), col("term"),
        size(filter(col("toks"), t => t === col("term"))).cast("double").as("tf"))
    val df_ = tf.filter(col("tf") > 0).groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(df_), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("score",
        col("idf") * col("tf") * (lit(1.2) + 1.0) /
          (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("bm25"))
      .filter(coalesce(col("bm25") > 0.0, lit(false)))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Query tokens for t08 — a mix of frequent, rare, and absent. */
  val cmsQueryTokens: Seq[String] =
    Seq("the", "spark", "window", "hash", "fast", "merge", "zzz_absent")

  /** t08: count-min sketch heavy-hitter counts — the sketch path for
    * token statistics at corpus scale ([[graft.functions.CmsSketch]]:
    * one 32 KB buffer per partition crosses the wire instead of a
    * per-token shuffle). Point estimates for a fixed query set are
    * compared against exact counts; est ≥ exact always, with overcount
    * bounded by collisions (deterministic: counters are pure sums). */
  def t08CmsCounts(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketch
    val toks = docsWithTokens(spark, dir).select(explode(col("toks")).as("token"))
    val sketch = toks.agg(CmsSketch.cms(col("token")).as("sk"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
    val qdf = spark.createDataFrame(cmsQueryTokens.map { t =>
      val tv = CmsSketch.tokenValString(t)
      val i = (0 until CmsSketch.Depth).map(d =>
        d * CmsSketch.Width + CmsSketch.bucket(d, tv) + 1) // element_at is 1-based
      (t, i(0), i(1), i(2), i(3))
    }).toDF("token", "i0", "i1", "i2", "i3")
    qdf.crossJoin(sketch)
      .select(col("token"), least(
        element_at(col("sk"), col("i0")), element_at(col("sk"), col("i1")),
        element_at(col("sk"), col("i2")), element_at(col("sk"), col("i3"))).as("est"))
      .join(exact, Seq("token"), "left")
      .na.fill(0, Seq("exact"))
      .select(col("token"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy("token")
  }

  /** t09: lexical diversity per source — type-token ratio (distinct
    * tokens / total tokens) and vocabulary size, the quick corpus-
    * quality screen for TEMPLATED/low-diversity sources. Two partial-
    * aggregable counts after one explode; at corpus scale the group
    * count is |sources| and everything before the shuffle is map-side. */
  def t09LexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir)
      .select(col("source"), explode(col("toks")).as("token"))
      .groupBy(col("source"))
      .agg(countDistinct(col("token")).as("vocab"),
        count(lit(1)).as("n_tokens"))
      .withColumn("ttr", round(col("vocab") / col("n_tokens"), 6))
      .orderBy("source")

  /** PII patterns for t10 — conservative regex subset valid in BOTH
    * Java regex (Spark) and RE2 (DuckDB). */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val phoneRe = "\\+1-\\d{3}-\\d{4}"

  /** t10: PII detection + redaction — the scrub pass every training-data
    * pipeline runs before a corpus ships. The synthetic corpus carries no
    * natural PII, so (r05-style) the query first plants emails / IPv4s /
    * phone numbers deterministically from doc_id — at varying per-doc
    * multiplicities — then DETECTS them by regex, REDACTS them with
    * typed placeholders, and proves the redacted text has zero residual
    * matches. Everything is codegen'd string expressions over one scan:
    * at 100 TB this is map-side work with a |sources|-row shuffle. */
  def t10PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = concat(
      col("text"),
      when(pmod(id, lit(3)) === 0,
        format_string(" contact user%d@example.com", pmod(id, lit(1000)))).otherwise(""),
      when(pmod(id, lit(9)) === 0, lit(" escalate to admin@corp.example.org")).otherwise(""),
      when(pmod(id, lit(2)) === 0,
        format_string(" from 10.%d.%d.%d", pmod(id, lit(256)),
          pmod(id * 7, lit(256)), pmod(id * 13, lit(256)))).otherwise(""),
      when(pmod(id, lit(5)) === 0,
        format_string(" call +1-555-0%03d", pmod(id, lit(1000)))).otherwise(""))
    def hits(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val scrubbed = regexp_replace(
      regexp_replace(regexp_replace(planted, emailRe, "<EMAIL>"),
        ipRe, "<IP>"), phoneRe, "<PHONE>")
    Tables.documents(spark, dir)
      .select(col("source"), planted.as("pt"), scrubbed.as("st"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(hits(col("pt"), emailRe)).as("n_emails"),
        sum(hits(col("pt"), ipRe)).as("n_ips"),
        sum(hits(col("pt"), phoneRe)).as("n_phones"),
        sum(hits(col("st"), emailRe) + hits(col("st"), ipRe) +
          hits(col("st"), phoneRe)).as("n_residual"))
      .orderBy("source")
  }

  /** Flag threshold for t11: docs whose duplicate-trigram fraction
    * exceeds this are repetition-contaminated (Gopher-style filter). */
  val RepetitionThreshold = 0.2

  /** t11: within-document repetition filter — fraction of duplicated
    * 3-grams per doc (1 − distinct/total), the Gopher/MassiveText rule
    * that catches boilerplate and degenerate generation loops that
    * cross-document dedup (d02/d03) never sees. Map-side per-doc column
    * math, one |sources|-row shuffle; the mean aggregates UNROUNDED
    * fractions (rounding once at the edge — engine rounding ties
    * otherwise flip the 4th decimal). */
  def t11RepetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val total = (size(toks) - 2).cast("long")
    val grams = transform(sequence(lit(1), size(toks) - lit(2)),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + lit(1)),
        element_at(toks, i + lit(2))))
    val dupFrac = (total - size(array_distinct(grams)).cast("long")) /
      total.cast("double")
    docsWithTokens(spark, dir)
      .filter(size(toks) >= 3)
      .select(col("source"), dupFrac.as("dup_frac"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_frac") > RepetitionThreshold, 1L).otherwise(0L)).as("n_flagged"),
        round(avg(col("dup_frac")), 4).as("avg_dup_frac"))
      .orderBy("source")
  }

  /** Entropy flag threshold in bits/char: the sf0.01 corpus spans
    * H ∈ [3.68, 4.23] with ~5% of docs under 3.9 — low-entropy docs are
    * the repetitive/templated tail a Shannon filter (C4/Gopher-family
    * quality rule) screens out. */
  val EntropyThreshold = 3.9

  /** t12: character-entropy quality filter — per-doc Shannon entropy
    * H = log2(L) − Σ c·log2(c) / L over character counts (the algebraic
    * form needs only two plain aggregates per doc: Σc and Σ c·log2 c —
    * no per-doc normalization pass). Flags docs under
    * [[EntropyThreshold]] bits/char and reports per-source counts +
    * mean. Shape at 100 TB: explode chars → (doc, char) count →
    * per-doc entropy → per-source rollup; every stage is a
    * partial-aggregable groupBy (the (doc,char) key is the only wide
    * shuffle and it combines map-side to ≤ |alphabet| rows per doc).
    *
    * Float determinism: the per-doc Σ c·log2(c) is folded over the
    * SORTED count list (collect_list → sort_array → ordered fold, ≤
    * |alphabet| elements/doc — p04's rule), NOT a sum() whose
    * accumulation order is partition/arrival dependent — so a doc's H
    * is bit-stable across runs and the engines differ only by the ULP
    * gap of their log2 implementations (ties among equal counts
    * contribute identical terms, so sorting by count alone is
    * order-complete). That residual gap is mitigated, not eliminated:
    * the threshold flag and the round(mean, 3) are safe as long as no
    * doc's H sits within ~1e-13 of the threshold and no source mean
    * within ~1e-13 of a half-boundary (t07's ln-based BM25 runs the
    * same risk class; measured spacing here is ≥ 1e-4). Empty docs are
    * excluded on BOTH sides (Spark's sequence(1,0) would descend where
    * DuckDB's generate_series(1,0) is empty). */
  def t12EntropyFilter(spark: SparkSession, dir: String): DataFrame =
    t12EntropyFilter(spark, dir, EntropyThreshold)

  def t12EntropyFilter(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    val pos = graft.Tables.documents(spark, dir)
      .filter(length(col("text")) >= 1) // sequence(1, len) must ascend
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), length(col("text")))).as("i"),
        col("text"))
      .select(col("doc_id"), col("source"),
        col("text").substr(col("i"), lit(1)).as("ch"))
    val cnt = pos.groupBy(col("doc_id"), col("source"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val sumCLogC = aggregate(sort_array(collect_list(col("c"))), lit(0.0),
      (acc, c) => acc + c.cast("double") * log2(c))
    val ent = cnt.groupBy(col("doc_id"), col("source"))
      .agg((log2(sum(col("c"))) - sumCLogC / sum(col("c"))).as("h"))
    ent.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("h") < threshold, 1L).otherwise(0L)).as("n_low_entropy"),
        round(avg(col("h")), 3).as("mean_entropy"))
      .orderBy("source")
  }

  /** Surprisal flag threshold in bits/token: the corpus sits at
    * 4.88–5.76 with the 99th percentile ≈ 5.1 — docs above 5.05 are the
    * unusual-vocabulary tail a CCNet-style LM filter quarantines. */
  val SurprisalThreshold = 5.05

  /** t13: unigram surprisal — the perplexity-proxy quality filter of the
    * CCNet/CC-Net-family pipelines, with the corpus itself as the LM:
    * per doc, −(1/n)·Σ log2 p(tok) = log2(N) − Σ m·log2(c) / n over
    * corpus token counts c and per-doc multiplicities m. High surprisal
    * = vocabulary unlike the corpus (noise, wrong language, garbled
    * text); low = boilerplate. Shape at 100 TB (r15): the corpus is
    * tokenized ONCE — the exploded stream repartitions on the token,
    * the (doc, source, t) multiplicity aggregate runs exchange-free on
    * that clustering (hash(t) satisfies the grouping — subset rule),
    * and the corpus count c lands on each row as a window
    * `sum(m) over (partition by t)` with no join (the r14 count-join
    * form re-derived the count table from a second scan+tokenize pass:
    * self-join attribute dedup broke ReuseExchange, the docs16x
    * AQE-final plan carried two Generate subtrees). N is a scan-only
    * `sum(size(tokens))` broadcast scalar — no explode. The per-doc
    * fold runs over the SORTED term list (t12's float-determinism rule
    * — the per-doc term count is bounded by doc length, never corpus
    * size). Σm and N are integers — exact; only log2's engine ULP gap
    * remains, mitigated by threshold distance and edge rounding (§6). */
  def t13UnigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    t13UnigramSurprisal(spark, dir, SurprisalThreshold)

  def t13UnigramSurprisal(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    val nonEmpty = graft.Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
    val tok = nonEmpty
      .select(col("doc_id"), col("source"), explode(TF.tokens(col("text"))).as("t"))
      .repartition(col("t"))
    // hash(t) clustering satisfies the (doc, source, t) grouping, so the
    // multiplicity aggregate and the corpus-count window below share the
    // ONE exchange above — and c ≡ the old tok.groupBy(t).count() because
    // Σ m over a token's rows counts exactly its instances
    val dt = tok.groupBy(col("doc_id"), col("source"), col("t"))
      .agg(count(lit(1)).as("m"))
      .withColumn("c", sum(col("m")).over(Window.partitionBy(col("t"))))
    // N without a second tokenize-explode pass: trimmed non-empty docs
    // contribute size(tokens) instances each — same integer as sum(c)
    val tot = nonEmpty
      .agg(sum(size(TF.tokens(col("text")))).as("n_corpus"))
    val termFold = aggregate(
      sort_array(collect_list(col("m").cast("double") * log2(col("c")))),
      lit(0.0), (acc, v) => acc + v)
    val perDoc = dt
      .groupBy(col("doc_id"), col("source"))
      .agg(termFold.as("s_sum"), sum(col("m")).as("n_toks"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("source"),
        (log2(col("n_corpus")) - col("s_sum") / col("n_toks")).as("surprisal"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("surprisal") > threshold, 1L).otherwise(0L)).as("n_flagged"),
        round(avg(col("surprisal")), 3).as("mean_surprisal"))
      .orderBy("source")
  }

  /** Gopher rule thresholds (Rae et al. 2021 §A1.1, MassiveText quality
    * rules): word count ≥ [[GopherMinWords]], mean word length within
    * [3, 10], symbol-to-word ratio ≤ 0.1, < 90% bulleted lines, ≤ 30%
    * ellipsis-terminated lines, ≥ 80% words with an alphabetic char,
    * ≥ 2 distinct stopwords present. Measured corpus spacing to every
    * boundary is ≥ 1/|doc| (all ratios are small-denominator rationals),
    * so flags are engine-stable. */
  val GopherMinWords = 50
  val GopherMaxWords = 100000

  /** t14: Gopher/MassiveText quality-rule bundle — the document-structure
    * rules (bullets, ellipses, symbols) plus the word-level rules (count,
    * mean length, alpha fraction, stopword presence) every LLM corpus
    * pass applies before training. The synthetic corpus is single-line
    * symbol-free prose, so (t10-precedent) the query first PLANTS
    * structure deterministically from doc_id — 10-token lines, per-line
    * bullet prefix with modulus 1+doc_id%4 (modulus 1 = the fully
    * bulleted listicle the rule exists to catch), per-line ellipsis
    * suffix with modulus 2+doc_id%4, and a trailing '#'-run line on
    * every 7th doc — then MEASURES all seven rules for real on the
    * rebuilt document. Shape at 100 TB: one scan, all column expressions
    * (chunking/decoration is transform over sequence — codegen'd, no
    * UDF), one |sources|-row shuffle. Ratios are int/int divisions and
    * threshold literals identical in both engines (IEEE-identical flag
    * decisions; no float accumulation anywhere). */
  def t14GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val toks = col("toks")
    val nChunks = TF.chunkCount(toks, 10)
    val bmod = lit(1) + pmod(id, lit(4))
    val emod = lit(2) + pmod(id, lit(4))
    val nHash = when(pmod(id, lit(7)) === 0, lit(1) + pmod(id, lit(12)))
      .otherwise(lit(0)).cast("int")
    val lines0 = transform(sequence(lit(1L), nChunks), j =>
      concat(
        when(pmod(id + j, bmod) === 0, lit("- ")).otherwise(lit("")),
        TF.tokenChunk(toks, j, 10),
        when(pmod(id * 3 + j, emod) === 0, lit("...")).otherwise(lit(""))))
    val linesCol = concat(lines0,
      when(nHash > 0, array(array_join(array_repeat(lit("#"), nHash), " ")))
        .otherwise(array().cast("array<string>")))
    val structured = docsWithTokens(spark, dir)
      .select(id, col("source"), linesCol.as("lines"))
      .withColumn("ftext", array_join(col("lines"), "\n"))
      .withColumn("words", split(trim(col("ftext")), "\\s+"))
    val nWords = size(col("words")).cast("long")
    val nLines = size(col("lines")).cast("long")
    val symCount =
      (length(col("ftext")) - length(regexp_replace(col("ftext"), "#", ""))).cast("long") +
        size(regexp_extract_all(col("ftext"), lit("\\.\\.\\."), lit(0))).cast("long")
    val meanWordLen =
      aggregate(transform(col("words"), w => length(w).cast("long")), lit(0L),
        (a, x) => a + x).cast("double") / nWords
    val bulletFrac =
      size(filter(col("lines"), l => l.startsWith("- "))).cast("double") / nLines
    val ellFrac =
      size(filter(col("lines"), l => l.endsWith("..."))).cast("double") / nLines
    val alphaFrac =
      size(filter(col("words"), w => w.rlike("[a-z]"))).cast("double") / nWords
    val nStop = size(array_intersect(array_distinct(col("words")),
      array(TF.stopwords.map(lit): _*)))
    val flagged = structured.select(col("source"),
      (nWords < GopherMinWords || nWords > GopherMaxWords).as("f_words"),
      (meanWordLen < 3.0 || meanWordLen > 10.0).as("f_wordlen"),
      (symCount.cast("double") / nWords > 0.1).as("f_symbol"),
      (bulletFrac >= 0.9).as("f_bullet"),
      (ellFrac > 0.3).as("f_ellipsis"),
      (alphaFrac < 0.8).as("f_alpha"),
      (nStop < 2).as("f_stopword"))
    def cnt(c: String): Column = sum(when(col(c), 1L).otherwise(0L)).as(s"n_$c")
    flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        cnt("f_words"), cnt("f_wordlen"), cnt("f_symbol"), cnt("f_bullet"),
        cnt("f_ellipsis"), cnt("f_alpha"), cnt("f_stopword"),
        sum(when(!col("f_words") && !col("f_wordlen") && !col("f_symbol") &&
          !col("f_bullet") && !col("f_ellipsis") && !col("f_alpha") &&
          !col("f_stopword"), 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source")
  }

  /** t15 HLL parameters: 2^8 = 256 registers (standard error
    * 1.04/√m ≈ 6.5%); the 60-bit portable hash (d11's md5-prefix idiom)
    * splits into an 8-bit register index and a 52-bit rank field. */
  val HllBuckets = 256

  /** α·m²·2^53 — the HLL bias constant times the register count squared,
    * pre-scaled by 2^53 so the register sum Σ 2^(53−M_j) stays an exact
    * BIGINT (order-independent, no float accumulation). Computed once
    * here and interpolated into the oracle SQL as the same double
    * literal, so the final estimate is one IEEE divide in both engines. */
  val HllAlphaNumer: Double = {
    val m = HllBuckets.toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * 9007199254740992.0
  }

  /** Linear-counting lookup m·ln(m/V) for V = 1..m — HLL's small-range
    * correction (raw estimate ≤ 2.5m with empty registers). Precomputed
    * here and embedded as the SAME double literals in the oracle SQL, so
    * neither engine evaluates ln() at query time (ln is the one libm
    * call whose last ulp is not guaranteed to agree across engines). */
  val HllLinearCount: IndexedSeq[Double] = {
    val m = HllBuckets.toDouble
    (1 to HllBuckets).map(v => m * math.log(m / v))
  }

  /** t15: HyperLogLog distinct-shingle count per source — the cardinality
    * sketch every corpus-stats pass uses where exact COUNT(DISTINCT) is
    * unaffordable (counting distinct word-3-grams is the shingle-space
    * size that drives minhash dedup tuning). Registers come from the
    * engine-portable md5-prefix hash (low 8 bits → register, remaining
    * 52 bits → rank via `53 − bitlength`, Flajolet et al. 2007), so
    * DuckDB computes the IDENTICAL sketch and the gate checks the
    * estimate itself, not just shape. The register sum is kept as the
    * exact integer Σ 2^(53−M_j) (fits BIGINT: ≤ 256·2^53 = 2^61) — the
    * float ops are one α·m²·2^53 / S divide plus the [[HllLinearCount]]
    * lookup on the small-range branch, IEEE-identical in both engines,
    * reported ×1000-floored. Shape at 100 TB: registers are
    * partial-aggregable max() rows capped at m per source per partition —
    * the shuffle carries ≤ |sources|·256 rows regardless of corpus size.
    * The exact countDistinct column exists purely as the accuracy
    * reference at test SFs (it is the thing the sketch REPLACES at
    * scale). */
  def t15HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val sh = docsWithTokens(spark, dir)
      .filter(size(col("toks")) >= 3) // sequence(1, n-2) descends for n < 3
      .select(col("source"), explode(transform(
        sequence(lit(1), size(col("toks")) - lit(2)),
        i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("t"))
    val v = conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long")
    val hashed = sh.select(col("source"), col("t"),
      pmod(v, lit(HllBuckets.toLong)).as("bucket"),
      shiftright(v, 8).as("w"))
    val rho = when(col("w") === 0L, lit(53))
      .otherwise(lit(53) - length(bin(col("w")))).cast("int")
    val regs = hashed.groupBy(col("source"), col("bucket"))
      .agg(max(rho).as("m_reg"))
    val hll = regs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr("shiftleft(1L, 53 - m_reg)")).as("s_present"))
      .select(col("source"),
        (lit(HllBuckets.toLong) - col("n_present")).as("zero_regs"),
        (col("s_present") +
          (lit(HllBuckets.toLong) - col("n_present")) * lit(1L << 53)).as("hll_s"))
    val exact = hashed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("t")).as("n_distinct_exact"))
    val rawEst = lit(HllAlphaNumer) / col("hll_s").cast("double")
    val est = when(col("zero_regs") > 0L && rawEst <= lit(2.5 * HllBuckets),
      element_at(array(HllLinearCount.map(lit): _*), col("zero_regs").cast("int")))
      .otherwise(rawEst)
    exact.join(broadcast(hll), "source")
      .select(col("source"), col("n_shingles"), col("n_distinct_exact"),
        col("hll_s"), col("zero_regs"),
        floor(est * lit(1000.0)).cast("long").as("hll_est_x1000"))
      .orderBy("source")
  }

  /** t16: TF-IDF keyword extraction — the classic distinctive-term score
    * tf·log2(N/df), the screen every corpus-exploration pass runs to see
    * WHAT a source contains (and the weighting BM25/t07 generalizes).
    * Reported: the corpus-wide top-20 (doc, term) cells by score — the
    * most document-specific vocabulary in the corpus. Shape at 100 TB:
    * explode → (doc, term) partial-agg shuffle for tf, then df as a
    * PARTITION-WIDE WINDOW COUNT over the term (r15, q16's rule: the
    * r14 `tf.groupBy(t)` + join-back form hit Spark's self-join
    * attribute dedup, ReuseExchange missed, and the docs16x AQE-final
    * plan tokenized the corpus TWICE and broadcast the 1.86M-row tf
    * aggregate — 256 MiB, built single-threaded on the driver — to
    * probe the 2.5k-row df table from the duplicated subtree; the
    * window is one term-keyed exchange + partition sort on rows already
    * collapsed to one per (doc, term), 3.8 s → measured in
    * OPTIMIZATION_r15 §B.4); the corpus doc count joins as a broadcast
    * scalar; the top-20 is TakeOrdered (per-partition heap), never a
    * full sort. Score uses log2 on integer ratios only (t13's
    * engine-parity precedent), ties broken totally by (doc_id, term). */
  def t16TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val nonEmpty = graft.Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
    val tok = nonEmpty
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("t"))
    val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    // df ≡ the old tf.groupBy(t).count() join-back: tf carries exactly
    // one row per (doc, term), so count(*) over (partition by t) IS the
    // document frequency, landed on every row without a join
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("t"))))
    // count the filtered docs WITHOUT re-exploding: trimmed non-empty
    // text always yields >= 1 token, so this equals countDistinct(doc_id)
    // over tok but costs a plain scan instead of a second tokenize pass
    val nDocs = nonEmpty.agg(count(lit(1)).as("n_docs"))
    withDf
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("t").as("term"), col("tf"), col("df"),
        round(col("tf").cast("double") *
          (log2(col("n_docs")) - log2(col("df"))), 4).as("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("term"))
      .limit(20)
  }

  /** Domain pool for t18's deterministic URL planting: three content
    * hosts and two list-blocked ones (the RefinedWeb/CCNet "URL
    * filtering" stage needs both classes present to have anything to
    * filter). */
  val UrlDomains: Seq[String] =
    Seq("news.example", "wiki.example", "blog.example",
      "spam-mill.example", "adfarm.example")
  val UrlBlocklist: Seq[String] = Seq("spam-mill.example", "adfarm.example")

  /** t18: URL extraction + domain blocklist filter — the FIRST stage of
    * the RefinedWeb/CCNet-family web pipelines (cheap URL-level triage
    * before any text is tokenized). The synthetic corpus carries no
    * URLs, so (t10/t14 precedent) each doc PLANTS one deterministically
    * from doc_id — subdomain and domain both rotate so the
    * registered-domain normalization (strip subdomains, keep the last
    * two labels) is exercised for real — then the query extracts the
    * host with the same regex a production pass uses, normalizes, and
    * applies the blocklist. Output: per registered domain, doc count
    * and the keep/drop decision. Shape at 100 TB: extraction and
    * normalization are per-row regex column ops (codegen), the
    * blocklist is a literal IN-list (a broadcast join once it is a
    * table), one |domains|-group aggregate. */
  def t18UrlFilter(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sub = element_at(array(Seq("www", "m", "cdn").map(lit): _*),
      (pmod(id, lit(3)) + 1).cast("int"))
    val dom = element_at(array(UrlDomains.map(lit): _*),
      (pmod(id, lit(UrlDomains.size)) + 1).cast("int"))
    val planted = concat(col("text"),
      format_string(" https://%s.%s/p/%d", sub, dom, id))
    // END-anchored: the planted URL is the document's final suffix, so
    // anchoring at $ measures IT even when the document text itself
    // contains a lowercase https:// URL (a first-match extract would
    // silently grab the text's URL instead — the [^\s]* tail cannot
    // cross the space before the planted suffix).
    val host = regexp_extract(planted, "https://([a-z0-9.-]+)/[^\\s]*$", 1)
    val regDomain = regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1)
    Tables.documents(spark, dir)
      .select(regDomain.as("domain"))
      .withColumn("blocked",
        when(col("domain").isin(UrlBlocklist: _*), 1L).otherwise(0L))
      .groupBy(col("domain"), col("blocked"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("domain")
  }

  /** t27: URL CANONICALIZATION dedup — the web-pipeline stage between
    * t18's domain triage and content dedup: the same page arrives under
    * many raw URLs (mirror subdomains, tracking params, fragments), and
    * collapsing to a canonical URL (registered domain + path — strip
    * subdomain, query string, fragment) removes refetch duplicates
    * before any byte of content is compared. Planting (t18's rule,
    * extended): every doc carries one URL whose subdomain rotates %3 and
    * whose tracking param is unique per doc, while item path and domain
    * repeat per ⌊doc_id/3⌋ — so raw URLs are all distinct and
    * canonicalization genuinely collapses ~3-doc groups. Output per
    * registered domain: raw URLs, canonical URLs, docs a keep-first pass
    * would drop. Shape at 100 TB: extraction + canonicalization are
    * per-row regex column ops (codegen), then one |domains|-group
    * count + count(DISTINCT canonical) aggregate — the distinct is the
    * only shuffle and keys on the canonical string. */
  def t27UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val sub = element_at(array(Seq("www", "m", "cdn").map(lit): _*),
      (pmod(id, lit(3)) + 1).cast("int"))
    val dom = element_at(array(UrlDomains.map(lit): _*),
      (pmod(expr("doc_id DIV 3"), lit(UrlDomains.size)) + 1).cast("int"))
    val planted = concat(col("text"),
      format_string(" https://%s.%s/item/%d?utm_source=%d#s",
        sub, dom, expr("doc_id DIV 3"), id))
    // END-anchored extraction (t18's rule): the planted URL is the final
    // suffix, so $-anchoring measures it even if the document text
    // itself contains a lowercase URL — a first-match extract would
    // silently canonicalize the wrong URL.
    val host = regexp_extract(planted, "https://([a-z0-9.-]+)/[^\\s]*$", 1)
    val regDomain = regexp_extract(host, "([a-z0-9-]+\\.[a-z]+)$", 1)
    val path = regexp_extract(planted,
      "https://[a-z0-9.-]+(/[^?#\\s]*)[^\\s]*$", 1)
    Tables.documents(spark, dir)
      .select(regDomain.as("domain"), concat(regDomain, path).as("canonical"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canonical")).as("n_canonical"),
        (count(lit(1)) - countDistinct(col("canonical"))).as("n_dup_docs"))
      .orderBy("domain")
  }

  /** Bigram-surprisal flag threshold in bits/bigram: the corpus sits at
    * 4.7–5.6 across SFs with thin tails; 5.17 lands in a measured gap of
    * ≥ 0.0047 at every test SF (flags 1/1/31 docs at sf0.001/0.01/0.1) —
    * per-doc cross-engine drift is ULP-scale (~1e-12), far inside it. */
  val BigramSurprisalThreshold = 5.17

  /** t19: bigram-LM surprisal — the conditional-perplexity quality
    * filter (the CCNet "LM perplexity" stage proper, one order up from
    * t13's unigram proxy): train an add-one-smoothed bigram LM on the
    * corpus itself and score each doc's mean −log2 p(w|u) =
    * log2(c(u)+V) − log2(c(u,w)+1), bits per bigram. Repetitive
    * boilerplate scores low; vocabulary-shifted or shuffled text scores
    * high — and unlike t13 it is word-ORDER sensitive (a shuffled doc
    * keeps its unigram surprisal but not its bigram surprisal).
    *
    * Shape at 100 TB: bigram and context counts are partial-aggregable
    * shuffles on derived keys (the model "training" IS the aggregation);
    * scoring joins the per-doc bigram multiset to the two count tables
    * by equi-key (AQE broadcasts the model while it is small — a 100 TB
    * corpus's bigram table shuffles, exactly like a real LM train).
    * Engine parity: every log2 argument is an integer (counts + V,
    * counts + 1), the per-doc fold runs over the SORTED term list
    * (t12/t13's float-determinism rule), and flags sit
    * [[BigramSurprisalThreshold]]-distant from every doc. */
  def t19BigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    t19BigramSurprisal(spark, dir, BigramSurprisalThreshold)

  def t19BigramSurprisal(spark: SparkSession, dir: String,
      threshold: Double): DataFrame = {
    val docs = docsWithTokens(spark, dir).filter(size(col("toks")) >= 2)
    val bg = docs.select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(1), size(col("toks")) - lit(1)),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + lit(1))))).as("bg"))
    val cBg = bg.groupBy(col("bg")).agg(count(lit(1)).as("c_uw"))
    // context count c(u) = Σ_w c(u,w), derived off the (tiny) bigram
    // count table, not a second pass over the corpus.
    val cU = cBg.groupBy(substring_index(col("bg"), " ", 1).as("u"))
      .agg(sum(col("c_uw")).as("c_u"))
    val vocab = docs.select(explode(col("toks")).as("t"))
      .agg(count_distinct(col("t")).as("vocab"))
    val db = bg.groupBy(col("doc_id"), col("source"), col("bg"))
      .agg(count(lit(1)).as("m"))
    val termFold = aggregate(
      sort_array(collect_list(col("m").cast("double")
        * (log2(col("c_u") + col("vocab")) - log2(col("c_uw") + lit(1L))))),
      lit(0.0), (acc, v) => acc + v)
    val perDoc = db.join(cBg, "bg")
      .join(cU, substring_index(col("bg"), " ", 1) === cU("u"))
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"), col("source"))
      .agg(termFold.as("s_sum"), sum(col("m")).as("n_bg"))
      .select(col("doc_id"), col("source"),
        (col("s_sum") / col("n_bg")).as("surprisal"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("surprisal") > threshold, 1L).otherwise(0L)).as("n_flagged"),
        round(avg(col("surprisal")), 3).as("mean_bigram_surprisal"))
      .orderBy("source")
  }

  /** t20: a line occurring more than this many times corpus-wide is
    * boilerplate and removed. CCNet drops lines duplicated a handful of
    * times; the planted boilerplate sits at df ≈ N/3 and N/7, organic
    * lines at 1–2, so the cap separates them by orders of magnitude at
    * every SF. */
  val LineDfCap = 4L

  /** Boilerplate lines t20 plants (the corpus is synthetic prose with no
    * natural nav/footer text — t10/t14/t18 precedent: plant
    * deterministically from doc_id, then MEASURE for real). */
  val BoilerplateLines: Seq[String] = Seq(
    "subscribe to our newsletter for updates and exclusive daily offers",
    "all rights reserved unauthorized reproduction of this page is prohibited")

  /** t20: line-level deduplication — the CCNet paragraph/line dedup
    * stage: hash every LINE of every document, count occurrences
    * corpus-wide, and strip lines that repeat more than [[LineDfCap]]
    * times (nav bars, cookie banners, footers — the boilerplate that
    * survives doc-level dedup because every PAGE differs while its
    * FURNITURE repeats). Documents are chunked into 10-token lines
    * (t14's rule); docs with doc_id%3==0 get a planted subscription
    * line and %7==0 a rights footer, then everything is measured for
    * real. Output audits the pass per source: docs, lines, removed
    * lines, affected docs — all integers.
    *
    * Shape at 100 TB (r15): documents are chunked ONCE and the
    * corpus-wide line count lands on each line row as a window
    * `count(*) over (partition by line)` — one line-keyed exchange +
    * partition sort, no join. The r14 count-table join re-derived the
    * frequency table from a second chunk+explode pass (self-join
    * attribute dedup broke ReuseExchange) and the docs16x AQE-final
    * plan broadcast the RAW 507k-row exploded lines side (144 MiB,
    * built single-threaded on the driver) to probe it — the no-stats
    * planner under-estimates explode output. The same maxDf-style cap
    * logic as d02's inverted index applies if a pathological line
    * dominates (the window count is partial-agg-free but line groups
    * are bounded by the line's corpus frequency, and the rollup needs
    * only the >LineDfCap flag). Per-doc and per-source rollups
    * partial-aggregate. */
  def t20LineDedup(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val toks = col("toks")
    val lines0 = transform(sequence(lit(1L), TF.chunkCount(toks, 10)),
      j => TF.tokenChunk(toks, j, 10))
    val empty = array().cast("array<string>")
    val linesCol = concat(
      when(pmod(id, lit(3)) === 0, array(lit(BoilerplateLines(0)))).otherwise(empty),
      lines0,
      when(pmod(id, lit(7)) === 0, array(lit(BoilerplateLines(1)))).otherwise(empty))
    val lines = docsWithTokens(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(id, col("source"), explode(linesCol).as("line"))
    // c ≡ the old lines.groupBy(line).count() join-back: count(*) over
    // the line's partition counts exactly its corpus instances
    val perDoc = lines
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("line"))))
      .groupBy(id, col("source"))
      .agg(count(lit(1)).as("lt"),
        sum(when(col("c") > LineDfCap, 1L).otherwise(0L)).as("lr"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("lt")).as("lines_total"),
        sum(col("lr")).as("lines_removed"),
        sum(when(col("lr") > 0, 1L).otherwise(0L)).as("docs_affected"))
      .orderBy("source")
  }

  /** t21: BPE vocabulary training — the first K merge rules of a
    * byte-pair-encoding tokenizer trained on the corpus (Sennrich et
    * al. 2016). BPE trains on the WORD-FREQUENCY table, not the running
    * text, so the 100 TB-heavy step is exactly one partial-aggregable
    * word-count shuffle; the merge loop then iterates on the bounded
    * top-`topWords` vocabulary — driver math on a ≤4096-row digest, the
    * s03 sample-fit precedent, NOT a driver loop over the corpus (the
    * frequency tail it truncates is the same tail real BPE trainers
    * cap). Deterministic end to end: pair-frequency ties break
    * lexicographically, so the merge list reproduces on any
    * engine/cluster/partitioning. Rows-only in the gate (an iterative
    * argmax has no single-query SQL mirror); the textbook merge
    * sequence and the invariants are spec-pinned. */
  def t21BpeVocabTrain(spark: SparkSession, dir: String): DataFrame =
    t21BpeVocabTrain(spark, dir, merges = 20, topWords = 4096)

  def t21BpeVocabTrain(spark: SparkSession, dir: String, merges: Int,
      topWords: Int): DataFrame = {
    import spark.implicits._
    bpeMerges(bpeWordCounts(spark, dir, topWords), merges)
      .toDF("merge_rank", "left", "right", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** The bounded word-frequency digest BPE trains on (t21) and t25
    * re-trains before applying: ONE partial-aggregable word-count
    * shuffle, then a ≤`topWords`-row driver collect (s03 sample-fit
    * precedent — never a corpus collect). */
  private[graft] def bpeWordCounts(spark: SparkSession, dir: String,
      topWords: Int): Array[(String, Long)] = {
    import spark.implicits._
    docsWithTokens(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topWords)
      .as[(String, Long)].collect()
  }

  /** The merge loop: words as end-marked symbol sequences; per round,
    * count symbol pairs weighted by word frequency, take the most
    * frequent (ties lexicographic), fuse it everywhere left-to-right.
    * Stops early when no pair remains (fully merged vocabulary). */
  private[graft] def bpeMerges(wc: Array[(String, Long)],
      merges: Int): Seq[(Int, String, String, String, Long)] = {
    // split by CODE POINT, not by UTF-16 unit — String.split("") halves
    // surrogate pairs, corrupting symbols for any non-BMP character
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
          :+ "</w>", c)
      }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 1
    while (rank <= merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) rank = merges + 1
      else {
        val ((l, r), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, l + r, cnt))
        words = words.map { case (syms, c) =>
          val ns = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              ns += l + r; i += 2
            } else { ns += syms(i); i += 1 }
          }
          (ns.toArray, c)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Separator for the string encoding of a BPE symbol sequence: every
    * symbol is delimited by U+0001 on both sides ("⌁l⌁o⌁w⌁</w>⌁").
    * U+0001 (rendered ⌁ below) never appears in whitespace-split tokens, and a literal
    * "</w>" inside a token encodes as FOUR delimited codepoints — never
    * confusable with the single end-marker symbol. */
  private[graft] val BpeSep = "\u0001"

  /** One word → its separator-encoded symbol string AFTER applying the
    * merge `rules` in rank order. Pure column expressions end to end:
    * the base split is one codepoint regex, and each merge rule is one
    * `regexp_replace` whose pattern consumes `⌁l⌁r` and LOOKS AHEAD at
    * (without consuming) the trailing separator — so the regex engine's
    * left-to-right non-overlapping scan lands on exactly the fuse
    * positions of the textbook left-to-right merge pass (the trailing
    * separator stays available as the next match's leading separator;
    * a consuming pattern would skip every second fuse in an adjacent
    * run like [a,a,a,a]). Symbol-for-symbol agreement with the driver
    * loop in [[bpeMerges]] is spec-pinned. */
  private[graft] def bpeEncodeWord(word: Column,
      rules: Seq[(String, String)]): Column = {
    import java.util.regex.{Matcher, Pattern}
    val base = concat(
      regexp_replace(word, "(?s)(.)", BpeSep + "$1"),
      lit(BpeSep + "</w>" + BpeSep))
    rules.foldLeft(base) { case (c, (l, r)) =>
      regexp_replace(c,
        Pattern.quote(BpeSep + l + BpeSep + r) + "(?=" + Pattern.quote(BpeSep) + ")",
        Matcher.quoteReplacement(BpeSep + l + r))
    }
  }

  /** A whole token array → one encoded string (word encodings
    * concatenated; the ⌁⌁ junctions can never match a merge pattern, so
    * words fuse independently — one regex pass per rule per DOC instead
    * of per word). Symbol count = #separators − #words, since each
    * word's encoding carries (symbols + 1) separators. */
  private[graft] def bpeEncodeDoc(toks: Column,
      rules: Seq[(String, String)]): Column =
    array_join(transform(toks, w => bpeEncodeWord(w, rules)), "")

  /** t25: APPLY the trained tokenizer — t21 trains the merge list; this
    * tokenizes the corpus with it, the step a training-data pipeline
    * actually ends in (token ids/counts, not merge tables). Train on
    * the bounded digest (one word-count shuffle + driver merge loop,
    * t21 exactly), then fold the ≤`merges`-row rule list into the
    * codegen'd [[graft.functions.BpeApplyUtil.encodeDoc]] expression —
    * application is purely map-side (no join, no state; one compiled
    * pass per doc instead of one regex pass per RULE, so cost is flat
    * in the rule count — spec-pinned at 20 vs 200 rules), and the only
    * shuffle is the |sources|-row rollup. The declarative regex chain
    * [[bpeEncodeWord]]/[[bpeEncodeDoc]] remains as the parity mirror. Reports the numbers that size a training
    * run: BPE token count, words, UTF-8 bytes, and exact integer
    * milli-bytes-per-token (bytes·1000 div tokens — the compression
    * ratio that converts corpus bytes to token budget). Rows-only in
    * the gate (the merge list is corpus-dependent, so no static SQL
    * mirror exists); the application itself is spec-pinned
    * symbol-for-symbol against the driver fuse loop, and the reported
    * counts against an independent recomputation. */
  def t25BpeTokenize(spark: SparkSession, dir: String): DataFrame =
    t25BpeTokenize(spark, dir, merges = 20, topWords = 4096)

  def t25BpeTokenize(spark: SparkSession, dir: String, merges: Int,
      topWords: Int): DataFrame = {
    val rules = bpeMerges(bpeWordCounts(spark, dir, topWords), merges)
      .map(m => (m._2, m._3))
    val enc = docsWithTokens(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("enc",
        graft.functions.NativeFunctions.bpeApply(col("toks"), rules))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_bpe",
        (length(col("enc")) - length(translate(col("enc"), BpeSep, "")))
          .cast("long") - col("n_words"))
    enc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("words_total"),
        sum(col("n_bpe")).as("bpe_tokens"),
        sum(octet_length(col("text")).cast("long")).as("bytes_total"))
      .withColumn("milli_bytes_per_token",
        expr("bytes_total * 1000 div bpe_tokens"))
      .orderBy("source")
  }

  /** t22: vocabulary COVERAGE curve — for the top-k corpus tokens by
    * occurrence count, the cumulative share of ALL token occurrences
    * they cover: the Zipf-law statistic that sizes a tokenizer
    * vocabulary (t21's budget question: "how many entries until X% of
    * the stream is in-vocab?") and flags boilerplate-skewed corpora
    * (a too-steep curve = a few tokens dominate). One explode +
    * partial-aggregable token-count shuffle (same shape as t05, which
    * counts DOC frequency — this is occurrence mass); the grand total
    * re-aggregates the grouped rows (|vocab|, not |corpus| — q31's
    * scalar precedent) and joins back broadcast; top-k selection is a
    * TakeOrdered heap, and the cumulative sum runs on k rows. Share is
    * reported in exact integer ppm (cum·10⁶ div total — Spark `div` ≡
    * DuckDB `//`), so the gate has no float boundary at all. The
    * product is computed in decimal(38,0): DuckDB's windowed SUM is
    * already HUGEINT, and a Long cum·10⁶ would wrap past ~9.2e12 total
    * token occurrences — below the corpus scale this op targets. */
  def t22TokenCoverage(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val counts = docsWithTokens(spark, dir)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // constant-partitioned ON PURPOSE: this window runs over the k
    // already-limited rows, and the partition key marks it as
    // intentionally single-partition — the "no partition defined"
    // warning then uniquely flags ACCIDENTAL unpartitioned windows in
    // the logs (r8 verdict's log-hygiene rule). NON-FOLDABLE on
    // purpose: Spark 4's EliminateWindowPartitions folds a literal key
    // away (which put the warning back); `cnt % 1` is constant 0 but
    // column-derived, so it survives optimization.
    val w = Window.partitionBy(col("cnt") % 1).orderBy(col("cnt").desc, col("token"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank").cast("long").as("rank"), col("token"), col("cnt"),
        expr("cast(cum as decimal(38,0)) * 1000000 div total").as("cum_ppm"))
      .orderBy("rank")
  }

  /** t23: token frequency SPECTRUM — the counts-of-counts statistic
    * (for each occurrence count f, how many distinct token types occur
    * exactly f times, and the occurrence mass they carry). This is the
    * Good-Turing input (N₁/N estimates unseen-type mass — how much of
    * the stream a tokenizer/LM will meet as NOVEL types), the Zipf-fit
    * health check (a sane corpus has a long n_types tail at low f; a
    * boilerplate-heavy one shows spikes at high f), and the companion
    * to t22's top-k view (t22: who dominates; t23: the whole shape).
    * Shape at 100 TB: the same explode + partial-agg token-count
    * shuffle as t05/t22, then a SECOND shuffle over |vocab| rows keyed
    * by count — vocabulary-sized, not corpus-sized. All-integer output
    * (mass = f·n_types ≤ total occurrences, no overflow, no float
    * boundary anywhere). */
  def t23FreqSpectrum(spark: SparkSession, dir: String): DataFrame =
    docsWithTokens(spark, dir)
      .select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_types"))
      .select(col("freq"), col("n_types"),
        (col("freq") * col("n_types")).as("mass"))
      .orderBy("freq")

  /** t24: INTRA-document line dedup — the RefinedWeb/CCNet step that
    * precedes corpus-wide line dedup (t20): repeated lines WITHIN one
    * page (scripted templates, chat transcripts, scraped pagination)
    * inflate token counts and train the LM on loops. Where t20 needs a
    * corpus-wide line-frequency shuffle, the within-doc decision is
    * pure per-row ARRAY arithmetic: dup lines = len(lines) −
    * len(distinct lines) — map-side, embarrassingly parallel, no
    * corpus state; the only shuffle is the |sources|-group rollup.
    * Lines are the shared 10-token chunking (t14/t20 single-sourced
    * arithmetic); every 5th doc repeats its first line as a planted
    * intra-doc dup (t10/t20 planting precedent). All-integer output. */
  def t24IntraDocDedup(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    // lines0 is materialized as its own column BEFORE the plant: the
    // chunk build is referenced twice below and an inline alias would
    // re-evaluate the whole transform per reference (the tokenVals
    // convention, TextFunctions.scala)
    docsWithTokens(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("lines0",
        transform(sequence(lit(1L), TF.chunkCount(col("toks"), 10)),
          j => TF.tokenChunk(col("toks"), j, 10)))
      .withColumn("lines", concat(col("lines0"),
        when(pmod(id, lit(5)) === 0, slice(col("lines0"), 1, 1))
          .otherwise(array().cast("array<string>"))))
      .select(col("source"), size(col("lines")).cast("long").as("lt"),
        size(array_distinct(col("lines"))).cast("long").as("nd"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("lt")).as("lines_total"),
        sum(col("lt") - col("nd")).as("dup_lines"),
        sum(when(col("lt") > col("nd"), 1L).otherwise(0L)).as("docs_affected"))
      .orderBy("source")
  }

  /** Hashed-classifier mixing constants (t17): an LCG step over the
    * portable token value. Any fixed (A, B) gives a deterministic
    * pseudo-weight stream; A is the MT19937 seed-scrambling multiplier,
    * B an odd offset. */
  val ClfA = 1812433253L
  val ClfB = 2545602959L

  /** t17: hashed linear-classifier scoring — the "model-based quality
    * filter" slot of the CCNet/GPT-3-family pipelines (a fasttext-style
    * linear model over hashed bag-of-words features), expressed as pure
    * column arithmetic so model inference runs INSIDE whole-stage
    * codegen: no UDF, no model server, no per-row JNI. The weight of a
    * token is a deterministic hash w(t) = (val(t)·A + B) mod P, the doc
    * logit is mean(w)/P − 0.5 ∈ [−0.5, 0.5) — a stand-in weight vector
    * with the exact execution shape of a trained one (swap the hash for
    * a broadcast weight table to deploy real weights —
    * [[t17WeightedClassifier]] — at an unchanged doc-shuffle shape).
    * Engine parity: the aggregation core Σ w(t) is ALL-INTEGER (exact
    * in any order — no sorted-fold needed, unlike t12/t13's float
    * folds), and the flag — doc mean weight above the CORPUS mean
    * weight — is a cross-multiplication carried in DECIMAL(38,0), so
    * the keep/drop gate has no float boundary AND no silent Long wrap:
    * products reach w_sum·tot_n ≤ (n·P)·N ≈ 10³⁴ at a 10-T-token
    * corpus, past 2⁶³ (where Spark would wrap where DuckDB raises) but
    * comfortably inside decimal-38 exactness; the DuckDB mirror
    * cross-multiplies in HUGEINT (int128) for the same guarantee. The
    * reported logit is the only float, one divide at the edge. Shape at
    * 100 TB: explode → one partial-aggregable (doc) shuffle → a 1-row
    * corpus total broadcast back → per-source rollup. */
  def t17HashedClassifier(spark: SparkSession, dir: String): DataFrame = {
    val tok = graft.Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"), explode(TF.tokens(col("text"))).as("t"))
    val w = (TF.tokenVal(col("t")) * lit(ClfA) + lit(ClfB)) % lit(TF.HashMod)
    classifierRollup(tok.withColumn("w", w))
  }

  /** Shared scoring tail of t17 and [[t17WeightedClassifier]]: per-doc
    * integer weight sums, corpus totals broadcast back, decimal
    * cross-multiplied above-mean flag, per-source rollup. */
  private def classifierRollup(tokW: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val perDoc = tokW
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("w")).as("w_sum"), count(lit(1)).as("n_toks"))
    // corpus totals: the flag compares each doc's MEAN weight to the
    // corpus mean weight by cross-multiplication — exact in any order.
    // (The small fixed vocabulary makes the corpus mean a biased
    // constant, so an absolute threshold like logit > 0 would flag ~94%
    // of docs — a degenerate signal.)
    val tot = perDoc.agg(sum(col("w_sum")).as("tot_w"),
      sum(col("n_toks")).as("tot_n"))
    perDoc.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("source"),
        (col("w_sum").cast("double") / col("n_toks").cast("double") /
          lit(TF.HashMod.toDouble) - lit(0.5)).as("logit"),
        (dec(col("w_sum")) * dec(col("tot_n")) > dec(col("tot_w")) * dec(col("n_toks")))
          .as("above_mean"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("above_mean"), 1L).otherwise(0L)).as("n_flagged"),
        round(avg(col("logit")), 4).as("mean_logit"))
      .orderBy("source")
  }

  /** t17 DEPLOYMENT variant: score with a REAL weight table instead of
    * the hash — `weights` is (t: string, w: long), one row per vocab
    * token, broadcast-joined to the exploded token stream (left join:
    * out-of-vocabulary tokens score 0, the linear-model convention).
    * Weights are FIXED-POINT LONGS (quantized), preserving t17's
    * all-integer exactness argument end to end — the standard trick for
    * codegen'd inference, and what keeps the decimal above-mean flag
    * exact. Plan shape is t17's with ONE added broadcast hash join on
    * the token: same explode, same single doc shuffle, same scalar
    * broadcast — spec-pinned, including value parity with t17 when
    * weights := the hash values. At 100 TB the weight table is
    * |vocab| rows (fasttext-style hashed vocabs keep it bounded) and
    * stays a broadcast build side. */
  def t17WeightedClassifier(spark: SparkSession, dir: String,
      weights: DataFrame): DataFrame = {
    val tok = graft.Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"), explode(TF.tokens(col("text"))).as("t"))
    val tokW = tok.join(broadcast(weights), Seq("t"), "left")
      .withColumn("w", coalesce(col("w"), lit(0L)))
    classifierRollup(tokW)
  }

  /** t26's hapax guard: PMI's textbook failure mode is that a pair seen
    * once scores log2(N) — the rarest junk tops the list. Requiring
    * c(u,w) ≥ 5 is the classic collocation-extraction floor. */
  val PmiMinCount = 5L

  /** t26: PMI COLLOCATIONS — the corpus-level association miner
    * (Church & Hanks' pointwise mutual information): score each bigram
    * by log2(p(u,w) / (p(u)·p(w))) and report the top multiword units.
    * The training-data uses: tokenizer vocab candidates (a high-PMI
    * pair is one unit — "new york"), boilerplate phrase discovery, and
    * a quality signal (template text repeats low-PMI pairs).
    *
    * Shape at 100 TB: bigram and unigram counts are the SAME two
    * partial-aggregable shuffles t06/t13 run; both corpus totals derive
    * from the count tables (no extra corpus pass) and ride one
    * broadcast 1-row join; the scoring joins are equi-joins of the
    * bigram table to the unigram table (AQE broadcasts the model while
    * small, shuffles when not — an LM-scale vocab is still ≪ the
    * corpus). Engine parity: every log2 argument is an INTEGER count
    * (the t19 rule), the sum is written in one fixed left-to-right
    * order in both engines, and the ordering key is the ROUNDED score
    * with bigram tie-break. */
  def t26PmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithTokens(spark, dir).filter(size(col("toks")) >= 2)
    val bg = docs.select(
      explode(transform(sequence(lit(1), size(col("toks")) - lit(1)),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + lit(1))))).as("bg"))
    val cBg = bg.groupBy(col("bg")).agg(count(lit(1)).as("c_uw"))
    val uni = docs.select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c_t"))
    val totals = cBg.agg(sum(col("c_uw")).as("n_bg"))
      .crossJoin(uni.agg(sum(col("c_t")).as("n_uni")))
    cBg.filter(col("c_uw") >= PmiMinCount)
      .withColumn("u", substring_index(col("bg"), " ", 1))
      .withColumn("w", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("t").as("u"), col("c_t").as("c_u")), Seq("u"))
      .join(uni.select(col("t").as("w"), col("c_t").as("c_w")), Seq("w"))
      .crossJoin(broadcast(totals))
      .select(col("bg").as("bigram"), col("c_uw").as("n"),
        round(log2(col("c_uw")) + lit(2) * log2(col("n_uni"))
          - log2(col("n_bg")) - log2(col("c_u")) - log2(col("c_w")), 3)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(25)
  }

  /** t29: VOCABULARY GROWTH curve (Heaps' law) — how fast the distinct
    * vocabulary grows as the corpus grows, the other half of t22's
    * tokenizer-sizing question ("how big will the vocab be at 10× the
    * data" vs t22's "how much stream do k entries cover"). Nested
    * corpus subsets come from the deterministic fingerprint bucket
    * (p01/p02's portable key): S_f = docs with fp%100 < f, f ∈
    * {10..100} — each subset contains the previous, so the curve is a
    * genuine growth measurement, reproducible on any engine.
    *
    * Per threshold: cumulative docs, token occurrences, and DISTINCT
    * vocabulary. All-integer. Shape at 100 TB: the vocab side is one
    * explode + min-bucket-per-token partial-agg shuffle (|vocab| rows
    * out); the doc/occurrence side partial-aggregates per bucket
    * (≤100 rows); BOTH tiny tables fan out to their thresholds with a
    * sequence-explode (no unpartitioned window, no nested-loop join)
    * and partial-aggregate again. Nothing corpus-sized moves twice. */
  def t29VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = docsWithTokens(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("bucket",
        pmod(graft.functions.NativeFunctions.polyFingerprint(col("toks")),
          lit(100L)))
    // thresholds a bucket-b row belongs to: f ∈ {⌊b/10⌋·10+10, …, 100}
    val fOf = explode(sequence(
      (expr("bucket div 10") + 1) * 10, lit(100L), lit(10L))).as("f")
    val perBucket = docs
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("b_docs"),
        sum(size(col("toks")).cast("long")).as("b_occ"))
      .select(col("bucket"), col("b_docs"), col("b_occ"))
    val docSide = perBucket.select(col("b_docs"), col("b_occ"), fOf)
      .groupBy(col("f"))
      .agg(sum(col("b_docs")).as("n_docs"), sum(col("b_occ")).as("n_occurrences"))
    val vocabSide = docs
      .select(col("bucket"), explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(min(col("bucket")).as("bucket"))
      .select(fOf)
      .groupBy(col("f")).agg(count(lit(1)).as("vocab"))
    docSide.join(vocabSide, Seq("f"))
      .select(col("f").as("pct"), col("n_docs"), col("n_occurrences"),
        col("vocab"))
      .orderBy("pct")
  }

  /** Fixed-point scale for t28's exported weights (1e-6 resolution —
    * the quantization step of a deployed integer scoring table). */
  val ClfQuantScale = 1e6

  /** t28's feature space: hashed unigram counts. 2^12 buckets keeps the
    * coefficient vector tiny (32 KB) while leaving collisions rare on
    * the test vocabulary; production fastText-style classifiers use
    * 2^21 with the identical plan. */
  val ClfHashDim = 4096

  /** t28: QUALITY-CLASSIFIER TRAINING — the stage that FILLS t17's
    * weight slot (the DCLM/FineWeb recipe: bootstrap a cheap linear
    * classifier from weak heuristic labels, then score the corpus with
    * it). Weak label = p08's 3-rule integer tier == 3, i.e. a
    * full-quality doc (single-sourced `Sampling.qualityTier` — the
    * classifier trains on exactly the rules the sampler gates on; the
    * full-tier cut is the one that splits this corpus non-degenerately,
    * and DCLM-style training uses high-quality reference docs as the
    * positive class the same way), features = hashed unigram counts
    * (MLlib HashingTF, murmur buckets), model = distributed logistic
    * regression (L-BFGS — the fit is the only iterative stage and it
    * aggregates gradients tree-wise; nothing corpus-sized reaches the
    * driver). Scoring runs back over the corpus distributed; output is
    * the per-source audit — docs, weak positives, classifier positives,
    * agreement — integers plus one readable rate.
    *
    * Rows-only: an iterative LBFGS fit has no SQL mirror, and tree
    * aggregation order makes the last-ulp of coefficients run-varying —
    * so specs pin THRESHOLDS (separation, agreement, export fidelity),
    * never exact values. */
  def t28TrainQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val scored = t28Scored(spark, dir)
    scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("weak")).as("n_weak_pos"),
        sum(col("pred")).as("n_clf_pos"),
        sum(when(col("weak") === col("pred"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_rate",
        round(col("n_agree").cast("double") / col("n_docs"), 4))
      .orderBy("source")
  }

  /** ONE fit per corpus dir, memoized: t28Scored (the audit) and
    * t28ExportWeights (the deployment table) must derive from the SAME
    * model — two independent L-BFGS fits can differ in the last ulp
    * (tree-aggregation order), so separate fits could export a weight
    * table from a different model than the one the audit graded, and
    * would pay the training cost twice per round. The model is a pure
    * coefficient holder (no session reference), so caching across
    * sessions by dir is safe; the cache is test-lifetime only — a real
    * deployment persists the exported weight TABLE, not the model. */
  private val t28ModelCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.ml.classification.LogisticRegressionModel]()

  private[graft] def t28Model(spark: SparkSession,
      dir: String): org.apache.spark.ml.classification.LogisticRegressionModel =
    t28ModelCache.computeIfAbsent(dir, _ => {
      import org.apache.spark.ml.classification.LogisticRegression
      new LogisticRegression().setMaxIter(20).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(t28Features(spark, dir))
    })

  /** Per-doc weak label + model prediction (the audit's input, and the
    * spec's separation probe). */
  private[graft] def t28Scored(spark: SparkSession, dir: String): DataFrame = {
    val feat = t28Features(spark, dir)
    t28Model(spark, dir).transform(feat)
      .select(col("doc_id"), col("source"),
        col("label").cast("long").as("weak"),
        col("prediction").cast("long").as("pred"))
  }

  private[graft] def t28Features(spark: SparkSession, dir: String): DataFrame = {
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(ClfHashDim)
    tf.transform(docsWithTokens(spark, dir)
      .filter(size(col("toks")) >= 1)
      .withColumn("label",
        when(Sampling.qualityTier(col("toks")) >= 3, 1.0).otherwise(0.0))
      .select(col("doc_id"), col("source"), col("toks"), col("label")))
  }

  /** The t17 DEPLOYMENT bridge: export the trained model as the
    * (token, fixed-point weight) table [[t17WeightedClassifier]] scores
    * with — weights for the `topK` highest-df tokens (t21's
    * bounded-digest discipline: the table is a driver artifact sized by
    * a knob, never the unbounded vocabulary), each token mapped to its
    * murmur bucket's coefficient, quantized at [[ClfQuantScale]].
    * Returns (weights, quantized intercept). */
  private[graft] def t28ExportWeights(spark: SparkSession, dir: String,
      topK: Int = 4096): (DataFrame, Long) = {
    val model = t28Model(spark, dir) // the SAME fit the audit scored with
    val coef = model.coefficients.toArray
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(ClfHashDim)
    val vocab = docsWithTokens(spark, dir)
      .select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t")).limit(topK)
      .select("t").collect().map(_.getString(0))
    val rows = vocab.toIndexedSeq.map { t =>
      (t, math.round(coef(tf.indexOf(t)) * ClfQuantScale))
    }
    (spark.createDataFrame(rows).toDF("t", "w"),
      math.round(model.intercept * ClfQuantScale))
  }

  /** Per-doc integer scores under a trained quantized weight table —
    * the ONE scoring core shared by the t28 deployment bridge's spec,
    * the STREAMING twin ([[graft.streaming.StreamQuality]]), and p13b's
    * tiered sampling: score = intercept + Σ w(token) over occurrences
    * (left join: OOV scores 0), flag = score > 0. All-integer, so
    * batch, stream, and sampler verdicts are exactly equal by
    * construction. `carry` names extra per-doc columns (already present
    * on `docs`) to ride the group key — p13b carries the fingerprint
    * and token count so its tiering needs no second corpus pass. */
  private[graft] def quantizedDocScores(docs: DataFrame, weights: DataFrame,
      interceptQ: Long, carry: Seq[String] = Seq("source")): DataFrame = {
    val keys = col("doc_id") +: carry.map(col)
    docs.filter(length(trim(col("text"))) > 0)
      .select(keys :+ explode(TF.tokens(col("text"))).as("t"): _*)
      .join(broadcast(weights), Seq("t"), "left")
      .groupBy(keys: _*)
      .agg(sum(coalesce(col("w"), lit(0L))).as("w_sum"))
      .select(keys ++ Seq(
        (col("w_sum") + lit(interceptQ)).as("score_q"),
        (col("w_sum") + lit(interceptQ) > 0).as("flagged")): _*)
  }

  /** t32 knobs: the code-symbol character class (braces, semicolons,
    * assignment/comparison/comment characters — the densest surface
    * difference between code and prose), the flag threshold in integer
    * ppm of document characters, and the gate fixture's planted-residue
    * class + snippet. 40000 ppm (4%) sits ≥2× below the planted
    * snippet's worst-case density and far above prose (word-soup text
    * carries none of the class — measured 0 ppm corpus-wide). */
  val CodeSymClass = "[{}();=<>#/]"
  val CodeFlagPpm = 40000L
  val CodePlantMod = 29
  val CodePlantRem = 11
  private[graft] val CodeSnippet = " {x=1;} //"

  /** t32: CODE detection / routing — the source-mix report a mixed
    * crawl runs before training: code and prose want different
    * pipelines (different dedup spans, different tokenizers, different
    * quality filters), so intake ROUTES on a cheap structural signal —
    * the density of code-surface characters ([[CodeSymClass]]) in
    * integer ppm of document length. Per source: docs, docs flagged as
    * code, the flagged share and the mean symbol density (both integer
    * ppm — no float boundary anywhere).
    *
    * Shape at 100 TB: the symbol count is ONE map-side
    * length-difference against a regexp strip (codegen'd, no explode —
    * cost linear in characters like any scan), then a ≤|sources|
    * rollup. The gate fixture is the d16/t18 planted pattern: the
    * synthetic corpus contains no code, so docs in the
    * [[CodePlantMod]]/[[CodePlantRem]] residue class get a
    * length-proportional snippet appended (both engines derive the
    * identical fixture — the detector, threshold arithmetic, and
    * rollup all sit under the hash gate); production calls
    * [[t32CodeDetectOf]] on a real corpus. */
  def t32CodeDetect(spark: SparkSession, dir: String): DataFrame = {
    val planted = graft.Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % CodePlantMod === CodePlantRem,
          concat(col("text"), repeat(lit(CodeSnippet),
            (length(col("text")) / 64 + 1).cast("int"))))
          .otherwise(col("text")).as("text"))
    t32CodeDetectOf(planted)
  }

  /** The production detector over any `source`+`text` relation.
    * Empty/NULL texts are excluded HERE (they carry no routing signal,
    * and the ppm division would hit len = 0 — a job-killing
    * DIVIDE_BY_ZERO under ANSI mode on any corpus with one blank doc),
    * so direct callers need no pre-filter. */
  def t32CodeDetectOf(docs: DataFrame): DataFrame = docs
    .filter(length(col("text")) > 0)
    .select(col("source"),
      length(col("text")).cast("long").as("len"),
      (length(col("text")) -
        length(regexp_replace(col("text"), CodeSymClass, "")))
        .cast("long").as("sym"))
    .withColumn("sym_ppm", expr("sym * 1000000 div len"))
    .groupBy(col("source"))
    .agg(count(lit(1)).as("n_docs"),
      sum(when(col("sym_ppm") >= CodeFlagPpm, 1L).otherwise(0L)).as("n_code"),
      sum(col("sym_ppm")).as("ppm_sum"))
    .select(col("source"), col("n_docs"), col("n_code"),
      expr("n_code * 1000000 div n_docs").as("code_share_ppm"),
      expr("ppm_sum div n_docs").as("mean_sym_ppm"))
    .orderBy("source")

  /** t30 flag threshold: a doc is LOW-NOVELTY when fewer than half of
    * its distinct shingles are unique to it corpus-wide (novelty ppm
    * < 500000) — integer ppm on integer counts, no float boundary. */
  val NoveltyFlagPpm = 500000L

  /** t30: document NOVELTY scan — per doc, the fraction of its distinct
    * 3-gram shingles that occur NOWHERE else in the corpus (df = 1).
    * The memorization/duplication-mass signal dedup thresholds don't
    * surface: a doc can fall below every pairwise near-dup threshold
    * while 80% of its content is scattered boilerplate — exactly the
    * mass that inflates memorization in training. Exact duplicates
    * score 0 novelty (every shingle shared with the twin); the report
    * is the per-source triage a pipeline reads before choosing dedup
    * aggressiveness.
    *
    * Shape at 100 TB: ONE shingle-df aggregation (partial-aggregable,
    * the same index d02 builds), an h-keyed equi-join back
    * (SHUFFLE_HASH — the Generate output defeats the planner's sizing,
    * d02's lesson), a per-doc and a ≤|sources| rollup. All-integer
    * (counts and div-ppm), fully hash-gated. */
  def t30NoveltyScan(spark: SparkSession, dir: String): DataFrame =
    t30NoveltyScanOf(Tables.documents(spark, dir))

  /** The novelty scan over any (doc_id, source, text) relation — split
    * out so the p21 release datasheet can score the RELEASED corpus,
    * not just the at-rest table. */
  private[graft] def t30NoveltyScanOf(docs: DataFrame): DataFrame = {
    val ex = docs.withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.NativeFunctions.shingleHashes(col("toks"))).as("h"))
    val dfTab = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // hint the AGGREGATED side: it is the strictly smaller relation
    // (≤ |ex|, much smaller on duplicate-heavy corpora), so it becomes
    // the hash-join build side — the exploded corpus side streams
    val perDoc = ex.join(dfTab.hint("SHUFFLE_HASH"), "h")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("flag",
        expr(s"(n_unique * 1000000) div n_sh") < NoveltyFlagPpm)
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_sh")).as("sh_total"),
        sum(col("n_unique")).as("sh_unique"))
      .withColumn("novelty_ppm",
        expr("(sh_unique * 1000000) div sh_total"))
      .orderBy("source")
  }

  /** t31: per-SOURCE distribution DRIFT — the mixture monitor a
    * multi-source corpus build runs per release: how far each source's
    * unigram distribution sits from the corpus blend, as the INTEGER-ppm
    * L1 distance Σ_t |ppm_src(t) − ppm_corpus(t)| over the corpus vocab
    * (2× total-variation). A source drifting across releases (crawler
    * regression, new boilerplate, language shift) moves this number
    * before any downstream eval does; the per-source row also carries
    * the doc/token mass that weighs the drift.
    *
    * Why L1-in-ppm and not KL: KL needs log(), and libm-vs-JVM last-bit
    * differences would make a float gate flaky (SURVEY §6); integer ppm
    * via `div` truncation is bit-identical in both engines, so the
    * whole statistic hash-gates. The absent-token mass is folded in by
    * RESIDUAL — Σ_{t∉src} ppm_c(t) = 10⁶ − Σ_{t∈src} ppm_c(t) — which
    * avoids the |sources| × |vocab| outer join entirely (the residual
    * inherits each ppm's truncation; that is the DEFINITION of the
    * statistic, mirrored exactly in the oracle). Everything is one
    * (source, token) partial agg, a token-level corpus rollup joined
    * back (hash build on the aggregated side), two broadcast-sized
    * total joins, and a ≤|sources| rollup — linear, skew-free (a hot
    * token is ONE aggregate row per source). Long math holds to ~10¹²
    * tokens × 10⁶ ppm; past that, widen to decimal. */
  def t31SourceDrift(spark: SparkSession, dir: String): DataFrame =
    t31SourceDriftOf(Tables.documents(spark, dir))

  /** Same-corpus drift over any `source`+`text` relation (the p21
    * release-datasheet entry point): blend and scores from one input. */
  private[graft] def t31SourceDriftOf(docs: DataFrame): DataFrame = {
    val blend = t31Blend(t31TokenCounts(docs))
    t31Drift(docs, blend, blend.agg(sum(col("nc")).as("corp_total")))
  }

  /** (source, token) → occurrence counts — the drift statistic's input
    * relation, single-sourced between the batch report and the
    * stream_drift ingest twin. */
  private[graft] def t31TokenCounts(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(TF.tokens(col("text"))).as("tok"))
    .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))

  /** The corpus blend: token → total occurrences. Batch t31 derives it
    * from the same corpus it scores; the stream twin FREEZES one built
    * at release time and scores arrivals against it. */
  private[graft] def t31Blend(srcTok: DataFrame): DataFrame =
    srcTok.groupBy(col("tok")).agg(sum(col("n")).as("nc"))

  /** The drift scoring core over any `source`+`text` relation against a
    * (tok, nc) blend + 1-row (corp_total) relation. LEFT join: a token
    * absent from the blend (possible only for streamed arrivals — a
    * same-corpus blend is always a superset) scores ppm_c = 0, i.e. its
    * full source-side mass counts as drift — exactly the new-vocabulary
    * signal the ingest monitor exists for. */
  private[graft] def t31Drift(docs: DataFrame, blend: DataFrame,
      corpTot: DataFrame): DataFrame = {
    val srcTok = t31TokenCounts(docs)
    val srcTot = srcTok.groupBy(col("source")).agg(sum(col("n")).as("src_total"))
    val perSrc = srcTok
      .join(blend.hint("SHUFFLE_HASH"), Seq("tok"), "left")
      .join(broadcast(srcTot), Seq("source"))
      .crossJoin(broadcast(corpTot))
      .select(col("source"),
        abs(expr("n * 1000000 div src_total")
          - coalesce(expr("nc * 1000000 div corp_total"), lit(0L))).as("d"),
        coalesce(expr("nc * 1000000 div corp_total"), lit(0L)).as("ppm_c"))
      .groupBy(col("source"))
      .agg(sum(col("d")).as("present_l1"), sum(col("ppm_c")).as("present_mass"))
    val nDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    nDocs.join(srcTot, Seq("source")).join(perSrc, Seq("source"))
      .select(col("source"), col("n_docs"), col("src_total").as("n_tokens"),
        (col("present_l1") + (lit(1000000L) - col("present_mass"))).as("l1_ppm"))
      .orderBy("source")
  }

  val oracle: Map[String, String] = {
    val toks = TS.toks
    Map(
      "t31_source_drift" ->
        s"""WITH st AS (
              SELECT source, tok, COUNT(*) AS n FROM (
                SELECT source, unnest($toks) AS tok FROM documents)
              GROUP BY 1, 2),
            stot AS (SELECT source, SUM(n) AS src_total FROM st GROUP BY 1),
            ct AS (SELECT tok, SUM(n) AS nc FROM st GROUP BY 1),
            ctot AS (SELECT SUM(n) AS corp_total FROM st),
            j AS (
              SELECT st.source,
                ABS(st.n * 1000000 // stot.src_total
                  - ct.nc * 1000000 // ctot.corp_total) AS d,
                ct.nc * 1000000 // ctot.corp_total AS ppm_c
              FROM st JOIN ct USING (tok) JOIN stot USING (source)
                CROSS JOIN ctot),
            ps AS (SELECT source, SUM(d) AS present_l1,
                     SUM(ppm_c) AS present_mass
                   FROM j GROUP BY 1),
            nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
            SELECT nd.source, CAST(nd.n_docs AS BIGINT) AS n_docs,
              CAST(stot.src_total AS BIGINT) AS n_tokens,
              CAST(ps.present_l1 + (1000000 - ps.present_mass) AS BIGINT)
                AS l1_ppm
            FROM nd JOIN stot USING (source) JOIN ps USING (source)
            ORDER BY source""",
      // t32 mirror: identical planted fixture (length-proportional
      // snippet on the residue class), identical strip-and-diff symbol
      // count and integer-ppm threshold/rollup arithmetic
      "t32_code_detect" ->
        s"""WITH d AS (
              SELECT source,
                CASE WHEN doc_id % $CodePlantMod = $CodePlantRem
                     THEN text || repeat('$CodeSnippet', CAST(
                       len(text) // 64 + 1 AS INT))
                     ELSE text END AS text
              FROM documents WHERE len(text) > 0),
            s AS (
              SELECT source, CAST(len(text) AS BIGINT) AS len,
                CAST(len(text) - len(regexp_replace(text,
                  '$CodeSymClass', '', 'g')) AS BIGINT) AS sym
              FROM d),
            p AS (
              SELECT source, len, sym, sym * 1000000 // len AS sym_ppm
              FROM s)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN sym_ppm >= $CodeFlagPpm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_code,
              CAST(SUM(CASE WHEN sym_ppm >= $CodeFlagPpm THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS code_share_ppm,
              CAST(SUM(sym_ppm) // COUNT(*) AS BIGINT) AS mean_sym_ppm
            FROM p GROUP BY source ORDER BY source""",
      "t30_novelty_scan" ->
        s"""WITH d AS (
              SELECT doc_id, source, ${TS.shingleHashes(toks)} AS sh
              FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, source, unnest(sh) AS h FROM d),
            f AS (SELECT h, COUNT(*) AS df FROM ex GROUP BY h),
            pd AS (
              SELECT doc_id, source, COUNT(*) AS n_sh,
                SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
              FROM ex JOIN f USING (h) GROUP BY 1, 2),
            fl AS (
              SELECT source, n_sh, n_unique,
                CASE WHEN (CAST(n_unique AS BIGINT) * 1000000)
                       // CAST(n_sh AS BIGINT) < $NoveltyFlagPpm
                     THEN 1 ELSE 0 END AS flag
              FROM pd)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(flag) AS BIGINT) AS n_flagged,
              CAST(SUM(n_sh) AS BIGINT) AS sh_total,
              CAST(SUM(n_unique) AS BIGINT) AS sh_unique,
              (CAST(SUM(n_unique) AS BIGINT) * 1000000)
                // CAST(SUM(n_sh) AS BIGINT) AS novelty_ppm
            FROM fl GROUP BY 1 ORDER BY 1""",
      "t18_url_filter" -> {
        val doms = UrlDomains.map(d => s"'$d'").mkString(", ")
        val blocked = UrlBlocklist.map(d => s"'$d'").mkString(", ")
        s"""WITH planted AS (
              SELECT doc_id, text || ' https://' ||
                (['www', 'm', 'cdn'])[CAST(doc_id % 3 + 1 AS INT)] || '.' ||
                ([$doms])[CAST(doc_id % ${UrlDomains.size} + 1 AS INT)] ||
                '/p/' || CAST(doc_id AS VARCHAR) AS pt
              FROM documents),
            ext AS (
              SELECT regexp_extract(
                  regexp_extract(pt, 'https://([a-z0-9.-]+)/[^\\s]*$$', 1),
                  '([a-z0-9-]+\\.[a-z]+)$$', 1) AS domain
              FROM planted)
            SELECT domain,
              CASE WHEN domain IN ($blocked) THEN CAST(1 AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS blocked,
              COUNT(*) AS n_docs
            FROM ext GROUP BY 1, 2 ORDER BY domain"""
      },
      "t17_hashed_classifier" ->
        s"""WITH tok AS (
              SELECT doc_id, source, unnest($toks) AS t
              FROM documents WHERE len(trim(text)) > 0),
            d AS (
              SELECT doc_id, source,
                CAST(SUM((${TS.tokenVal("t")}*$ClfA + $ClfB) % ${TF.HashMod})
                  AS BIGINT) AS w_sum,
                COUNT(*) AS n_toks
              FROM tok GROUP BY 1, 2),
            tot AS (
              SELECT CAST(SUM(w_sum) AS BIGINT) AS tot_w,
                CAST(SUM(n_toks) AS BIGINT) AS tot_n FROM d),
            s AS (
              SELECT source,
                CAST(w_sum AS DOUBLE) / CAST(n_toks AS DOUBLE)
                  / ${TF.HashMod}.0 - 0.5 AS logit,
                (CAST(w_sum AS HUGEINT) * tot_n > CAST(tot_w AS HUGEINT) * n_toks)
                  AS above_mean
              FROM d, tot)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN above_mean THEN 1 ELSE 0 END) AS BIGINT)
                AS n_flagged,
              ROUND(AVG(logit), 4) AS mean_logit
            FROM s GROUP BY source ORDER BY source""",
      "t16_tfidf_keywords" ->
        s"""WITH tok AS (
              SELECT doc_id, unnest($toks) AS t
              FROM documents WHERE len(trim(text)) > 0),
            tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
            df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
            n AS (SELECT COUNT(*) AS n_docs FROM documents
                  WHERE len(trim(text)) > 0)
            SELECT tf.doc_id, tf.t AS term, tf.tf, df.df,
              ROUND(tf.tf * (log2(n.n_docs) - log2(df.df)), 4) AS tfidf
            FROM tf JOIN df ON tf.t = df.t CROSS JOIN n
            ORDER BY tfidf DESC, tf.doc_id, term
            LIMIT 20""",
      "t15_hll_distinct" ->
        s"""WITH tok AS (
              SELECT source, $toks AS toks FROM documents),
            shg AS (
              SELECT source,
                unnest(list_transform(generate_series(1, len(toks) - 2),
                  i -> array_to_string(toks[i : i + 2], ' '))) AS t
              FROM tok),
            h AS (
              SELECT source, t,
                CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS v
              FROM shg),
            b AS (
              SELECT source, t, v % $HllBuckets AS bucket, v // $HllBuckets AS w
              FROM h),
            r AS (
              SELECT source, bucket,
                MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS m_reg
              FROM b GROUP BY source, bucket),
            s AS (
              SELECT source, COUNT(*) AS n_present,
                CAST(SUM(1::BIGINT << (53 - m_reg)) AS BIGINT) AS s_present
              FROM r GROUP BY source),
            e AS (
              SELECT source, CAST($HllBuckets - n_present AS BIGINT) AS zero_regs,
                s_present + ($HllBuckets - n_present) * (1::BIGINT << 53) AS s
              FROM s),
            x AS (
              SELECT source, COUNT(*) AS n_shingles,
                COUNT(DISTINCT t) AS n_distinct_exact
              FROM b GROUP BY source),
            est AS (
              SELECT source,
                CASE WHEN zero_regs > 0
                       AND $HllAlphaNumer / CAST(s AS DOUBLE) <= ${2.5 * HllBuckets}
                  THEN (${HllLinearCount.mkString("[", ", ", "]")})[CAST(zero_regs AS INT)]
                  ELSE $HllAlphaNumer / CAST(s AS DOUBLE) END AS v_est,
                zero_regs, s
              FROM e)
            SELECT x.source, x.n_shingles, x.n_distinct_exact,
              est.s AS hll_s, est.zero_regs,
              CAST(floor(est.v_est * 1000.0) AS BIGINT) AS hll_est_x1000
            FROM x JOIN est USING (source) ORDER BY source""",
      "t14_gopher_rules" ->
        s"""WITH d AS (
              SELECT doc_id, source, $toks AS toks FROM documents),
            base AS (
              SELECT doc_id, source, toks,
                ${TS.chunkCount("toks", 10)} AS n_chunks,
                1 + doc_id % 4 AS bmod, 2 + doc_id % 4 AS emod,
                CAST(CASE WHEN doc_id % 7 = 0 THEN 1 + doc_id % 12 ELSE 0 END AS INT) AS n_hash
              FROM d),
            lined AS (
              SELECT doc_id, source,
                list_transform(generate_series(1, n_chunks), j ->
                  (CASE WHEN (doc_id + j) % bmod = 0 THEN '- ' ELSE '' END)
                  || ${TS.tokenChunk("toks", "j", 10)}
                  || (CASE WHEN (doc_id*3 + j) % emod = 0 THEN '...' ELSE '' END)) ||
                (CASE WHEN n_hash > 0
                  THEN [array_to_string(list_transform(generate_series(1, n_hash), x -> '#'), ' ')]
                  ELSE [] END) AS lines
              FROM base),
            m AS (
              SELECT doc_id, source, lines,
                array_to_string(lines, chr(10)) AS ftext
              FROM lined),
            w AS (
              SELECT doc_id, source, lines, ftext,
                regexp_split_to_array(trim(ftext), '\\s+') AS words,
                CAST(length(ftext) - length(regexp_replace(ftext, '#', '', 'g')) AS BIGINT)
                  + CAST(len(regexp_extract_all(ftext, '\\.\\.\\.')) AS BIGINT) AS sym_count
              FROM m),
            r AS (
              SELECT source,
                (len(words) < $GopherMinWords OR len(words) > $GopherMaxWords) AS f_words,
                (list_sum(list_transform(words, x -> CAST(length(x) AS BIGINT)))
                   / CAST(len(words) AS DOUBLE) < 3.0
                 OR list_sum(list_transform(words, x -> CAST(length(x) AS BIGINT)))
                   / CAST(len(words) AS DOUBLE) > 10.0) AS f_wordlen,
                (sym_count / CAST(len(words) AS DOUBLE) > 0.1) AS f_symbol,
                (len(list_filter(lines, l -> starts_with(l, '- ')))
                   / CAST(len(lines) AS DOUBLE) >= 0.9) AS f_bullet,
                (len(list_filter(lines, l -> ends_with(l, '...')))
                   / CAST(len(lines) AS DOUBLE) > 0.3) AS f_ellipsis,
                (len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
                   / CAST(len(words) AS DOUBLE) < 0.8) AS f_alpha,
                (len(list_intersect(list_distinct(words), ${TS.inList(TF.stopwords)})) < 2)
                  AS f_stopword
              FROM w)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN f_words THEN 1 ELSE 0 END) AS BIGINT) AS n_f_words,
              CAST(SUM(CASE WHEN f_wordlen THEN 1 ELSE 0 END) AS BIGINT) AS n_f_wordlen,
              CAST(SUM(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS BIGINT) AS n_f_symbol,
              CAST(SUM(CASE WHEN f_bullet THEN 1 ELSE 0 END) AS BIGINT) AS n_f_bullet,
              CAST(SUM(CASE WHEN f_ellipsis THEN 1 ELSE 0 END) AS BIGINT) AS n_f_ellipsis,
              CAST(SUM(CASE WHEN f_alpha THEN 1 ELSE 0 END) AS BIGINT) AS n_f_alpha,
              CAST(SUM(CASE WHEN f_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_f_stopword,
              CAST(SUM(CASE WHEN NOT f_words AND NOT f_wordlen AND NOT f_symbol
                AND NOT f_bullet AND NOT f_ellipsis AND NOT f_alpha
                AND NOT f_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM r GROUP BY source ORDER BY source""",
      "t01_token_count" ->
        s"""SELECT doc_id,
            len($toks) AS n_ws_tokens,
            len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS n_re_tokens
            FROM documents ORDER BY doc_id""",
      "t02_quality_score" ->
        s"""SELECT doc_id,
            len($toks) AS n_tokens,
            round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / length(text), 4) AS punct_ratio,
            round(${TS.markerHits(toks, TF.stopwords)} / len($toks), 4) AS stop_ratio,
            round(list_sum(list_transform($toks, t -> length(t))) / len($toks), 4) AS avg_tok_len,
            round(least(len($toks) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
                  + (${TS.markerHits(toks, TF.stopwords)} / len($toks)) * CAST(0.5 AS DOUBLE), 4) AS quality
            FROM documents ORDER BY doc_id""",
      "t03_lang_id" ->
        s"""WITH scored AS (
              SELECT lang,
                ${TS.markerHits(toks, TF.langMarkers("en"))} AS en_h,
                ${TS.markerHits(toks, TF.langMarkers("es"))} AS es_h,
                ${TS.markerHits(toks, TF.langMarkers("de"))} AS de_h
              FROM documents)
            SELECT lang,
              CASE WHEN en_h = 0 AND es_h = 0 AND de_h = 0 THEN 'und'
                   WHEN en_h >= es_h AND en_h >= de_h THEN 'en'
                   WHEN es_h >= de_h THEN 'es'
                   ELSE 'de' END AS pred_lang,
              COUNT(*) AS n_docs
            FROM scored GROUP BY 1, 2 ORDER BY 1, 2""",
      "t04_fingerprint" ->
        s"""SELECT doc_id, ${TS.polyFingerprint(toks)} AS fingerprint
            FROM documents ORDER BY doc_id""",
      "t05_top_tokens" ->
        s"""SELECT token, COUNT(*) AS doc_freq FROM (
              SELECT doc_id, unnest(list_distinct($toks)) AS token FROM documents)
            GROUP BY token ORDER BY doc_freq DESC, token LIMIT 25""",
      "t22_token_coverage" ->
        s"""WITH c AS (SELECT token, COUNT(*) AS cnt FROM (
              SELECT unnest($toks) AS token FROM documents) GROUP BY token),
            tot AS (SELECT SUM(cnt) AS total FROM c),
            top AS (SELECT token, cnt,
                ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
              FROM c ORDER BY cnt DESC, token LIMIT 20)
            SELECT rank, token, cnt,
              CAST((SUM(cnt) OVER (ORDER BY rank)) * 1000000 // total
                AS BIGINT) AS cum_ppm
            FROM top, tot ORDER BY rank""",
      "t24_intradoc_dedup" ->
        s"""WITH d AS (
              SELECT doc_id, source, $toks AS toks
              FROM documents WHERE len(trim(text)) > 0),
            l0 AS (
              SELECT doc_id, source,
                list_transform(
                  generate_series(1, ${TS.chunkCount("toks", 10)}),
                  j -> ${TS.tokenChunk("toks", "j", 10)}) AS lines0
              FROM d),
            l AS (SELECT doc_id, source,
                lines0 || (CASE WHEN doc_id % 5 = 0
                  THEN lines0[1:1] ELSE [] END) AS lines
              FROM l0)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(len(lines)) AS BIGINT) AS lines_total,
              CAST(SUM(len(lines) - len(list_distinct(lines))) AS BIGINT)
                AS dup_lines,
              CAST(SUM(CASE WHEN len(lines) > len(list_distinct(lines))
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_affected
            FROM l GROUP BY source ORDER BY source""",
      "t23_freq_spectrum" ->
        s"""WITH c AS (SELECT token, COUNT(*) AS cnt FROM (
              SELECT unnest($toks) AS token FROM documents) GROUP BY token)
            SELECT cnt AS freq, COUNT(*) AS n_types,
              CAST(cnt * COUNT(*) AS BIGINT) AS mass
            FROM c GROUP BY cnt ORDER BY freq""",
      "t10_pii_scrub" -> {
        val planted =
          s"""text
             || CASE WHEN doc_id % 3 = 0
                THEN printf(' contact user%d@example.com', doc_id % 1000) ELSE '' END
             || CASE WHEN doc_id % 9 = 0
                THEN ' escalate to admin@corp.example.org' ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                THEN printf(' from 10.%d.%d.%d', doc_id % 256, (doc_id*7) % 256, (doc_id*13) % 256) ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN printf(' call +1-555-0%03d', doc_id % 1000) ELSE '' END"""
        def hits(c: String, re: String) = s"len(regexp_extract_all($c, '$re'))"
        val scrubbed =
          s"""regexp_replace(regexp_replace(regexp_replace(pt,
              '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'),
              '$phoneRe', '<PHONE>', 'g')"""
        s"""WITH d AS (SELECT source, $planted AS pt FROM documents),
            s AS (SELECT source, pt, $scrubbed AS st FROM d)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(${hits("pt", emailRe)}) AS BIGINT) AS n_emails,
              CAST(SUM(${hits("pt", ipRe)}) AS BIGINT) AS n_ips,
              CAST(SUM(${hits("pt", phoneRe)}) AS BIGINT) AS n_phones,
              CAST(SUM(${hits("st", emailRe)} + ${hits("st", ipRe)}
                + ${hits("st", phoneRe)}) AS BIGINT) AS n_residual
            FROM s GROUP BY source ORDER BY source"""
      },
      "t11_repetition_filter" ->
        s"""WITH g AS (
              SELECT source,
                len($toks) - 2 AS total,
                len(list_distinct(list_transform(generate_series(1, len($toks) - 2),
                  i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]))) AS dist
              FROM documents WHERE len($toks) >= 3)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN (total - dist) / CAST(total AS DOUBLE) > $RepetitionThreshold
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
              round(AVG((total - dist) / CAST(total AS DOUBLE)), 4) AS avg_dup_frac
            FROM g GROUP BY source ORDER BY source""",
      "t13_unigram_surprisal" ->
        s"""WITH tok AS (
              SELECT doc_id, source, unnest($toks) AS t
              FROM documents WHERE len(trim(text)) > 0),
            cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
            tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM cnt),
            dt AS (SELECT doc_id, source, t, COUNT(*) AS m
              FROM tok GROUP BY 1, 2, 3),
            pd AS (SELECT d.doc_id, d.source,
                log2((SELECT n_corpus FROM tot))
                  - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_sort(list(CAST(d.m AS DOUBLE) * log2(c.c)))),
                      (acc, v) -> acc + v)
                    / CAST(SUM(d.m) AS BIGINT) AS surprisal
              FROM dt d JOIN cnt c ON d.t = c.t GROUP BY 1, 2)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN surprisal > $SurprisalThreshold
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
              round(AVG(surprisal), 3) AS mean_surprisal
            FROM pd GROUP BY source ORDER BY source""",
      "t27_url_dedup" -> {
        val doms = UrlDomains.map(d => s"'$d'").mkString(", ")
        s"""WITH p AS (
              SELECT doc_id, text || ' https://' ||
                (['www', 'm', 'cdn'])[CAST(doc_id % 3 + 1 AS INT)] || '.' ||
                ([$doms])[CAST((doc_id // 3) % ${UrlDomains.size} + 1 AS INT)] ||
                '/item/' || CAST(doc_id // 3 AS VARCHAR) ||
                '?utm_source=' || CAST(doc_id AS VARCHAR) || '#s' AS pt
              FROM documents),
            c AS (
              SELECT
                regexp_extract(
                  regexp_extract(pt, 'https://([a-z0-9.-]+)/[^\\s]*$$', 1),
                  '([a-z0-9-]+\\.[a-z]+)$$', 1) AS domain,
                regexp_extract(pt, 'https://[a-z0-9.-]+(/[^?#\\s]*)[^\\s]*$$', 1)
                  AS path
              FROM p)
            SELECT domain,
              COUNT(*) AS n_urls,
              COUNT(DISTINCT domain || path) AS n_canonical,
              CAST(COUNT(*) - COUNT(DISTINCT domain || path) AS BIGINT) AS n_dup_docs
            FROM c GROUP BY domain ORDER BY domain"""
      },
      "t29_vocab_growth" -> {
        val fp = TS.polyFingerprint(toks)
        s"""WITH d AS (
              SELECT ($fp) % 100 AS bucket, $toks AS toks
              FROM documents WHERE len(trim(text)) > 0),
            pb AS (
              SELECT bucket, COUNT(*) AS b_docs,
                CAST(SUM(len(toks)) AS BIGINT) AS b_occ
              FROM d GROUP BY bucket),
            ds AS (
              SELECT f, CAST(SUM(b_docs) AS BIGINT) AS n_docs,
                CAST(SUM(b_occ) AS BIGINT) AS n_occurrences
              FROM (SELECT b_docs, b_occ,
                      unnest(generate_series((bucket // 10 + 1) * 10, 100, 10)) AS f
                    FROM pb)
              GROUP BY f),
            tv AS (
              SELECT t, MIN(bucket) AS bucket FROM (
                SELECT bucket, unnest(toks) AS t FROM d) GROUP BY t),
            vs AS (
              SELECT f, COUNT(*) AS vocab FROM (
                SELECT unnest(generate_series((bucket // 10 + 1) * 10, 100, 10)) AS f
                FROM tv)
              GROUP BY f)
            SELECT ds.f AS pct, n_docs, n_occurrences, vocab
            FROM ds JOIN vs ON ds.f = vs.f
            ORDER BY pct"""
      },
      "t26_pmi_collocations" ->
        s"""WITH bgd AS (
              SELECT unnest(list_transform(generate_series(1, len($toks)-1),
                i -> $toks[i] || ' ' || $toks[i+1])) AS bg
              FROM documents WHERE len($toks) >= 2),
            cbg AS (SELECT bg, COUNT(*) AS c_uw FROM bgd GROUP BY bg),
            uni AS (SELECT t, COUNT(*) AS c_t FROM (
                SELECT unnest($toks) AS t
                FROM documents WHERE len($toks) >= 2) GROUP BY t),
            tot AS (SELECT
                (SELECT CAST(SUM(c_uw) AS BIGINT) FROM cbg) AS n_bg,
                (SELECT CAST(SUM(c_t) AS BIGINT) FROM uni) AS n_uni)
            SELECT bg AS bigram, CAST(c_uw AS BIGINT) AS n,
              round(log2(c_uw) + 2 * log2(n_uni) - log2(n_bg)
                - log2(cu.c_t) - log2(cw.c_t), 3) AS pmi
            FROM cbg CROSS JOIN tot
            JOIN uni cu ON split_part(bg, ' ', 1) = cu.t
            JOIN uni cw ON split_part(bg, ' ', 2) = cw.t
            WHERE c_uw >= $PmiMinCount
            ORDER BY pmi DESC, bigram LIMIT 25""",
      "t19_bigram_surprisal" ->
        s"""WITH bg AS (
              SELECT doc_id, source,
                unnest(list_transform(generate_series(1, len($toks)-1),
                  i -> $toks[i] || ' ' || $toks[i+1])) AS bg
              FROM documents WHERE len($toks) >= 2),
            cbg AS (SELECT bg, COUNT(*) AS c_uw FROM bg GROUP BY bg),
            cu AS (SELECT split_part(bg, ' ', 1) AS u,
                CAST(SUM(c_uw) AS BIGINT) AS c_u FROM cbg GROUP BY 1),
            v AS (SELECT COUNT(DISTINCT t) AS vocab FROM (
                SELECT unnest($toks) AS t
                FROM documents WHERE len($toks) >= 2)),
            db AS (SELECT doc_id, source, bg, COUNT(*) AS m
              FROM bg GROUP BY 1, 2, 3),
            pd AS (SELECT d.doc_id, d.source,
                list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_sort(list(CAST(d.m AS DOUBLE)
                    * (log2(cu.c_u + (SELECT vocab FROM v))
                      - log2(cb.c_uw + 1))))),
                  (acc, x) -> acc + x)
                  / CAST(SUM(d.m) AS BIGINT) AS surprisal
              FROM db d JOIN cbg cb USING (bg)
              JOIN cu ON split_part(d.bg, ' ', 1) = cu.u
              GROUP BY 1, 2)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN surprisal > $BigramSurprisalThreshold
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
              round(AVG(surprisal), 3) AS mean_bigram_surprisal
            FROM pd GROUP BY source ORDER BY source""",
      "t20_line_dedup" ->
        s"""WITH d AS (
              SELECT doc_id, source, $toks AS toks
              FROM documents WHERE len(trim(text)) > 0),
            l0 AS (
              SELECT doc_id, source,
                (CASE WHEN doc_id % 3 = 0
                  THEN ['${BoilerplateLines(0)}'] ELSE [] END)
                || list_transform(
                     generate_series(1, ${TS.chunkCount("toks", 10)}),
                     j -> ${TS.tokenChunk("toks", "j", 10)})
                || (CASE WHEN doc_id % 7 = 0
                  THEN ['${BoilerplateLines(1)}'] ELSE [] END) AS lines
              FROM d),
            l AS (SELECT doc_id, source, unnest(lines) AS line FROM l0),
            c AS (SELECT line, COUNT(*) AS c FROM l GROUP BY line),
            pd AS (SELECT l.doc_id, l.source, COUNT(*) AS lt,
                SUM(CASE WHEN c.c > $LineDfCap THEN 1 ELSE 0 END) AS lr
              FROM l JOIN c USING (line) GROUP BY 1, 2)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(lt) AS BIGINT) AS lines_total,
              CAST(SUM(lr) AS BIGINT) AS lines_removed,
              CAST(SUM(CASE WHEN lr > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_affected
            FROM pd GROUP BY source ORDER BY source""",
      "t12_entropy_filter" ->
        s"""WITH pos AS (
              SELECT doc_id, source,
                unnest(list_transform(generate_series(1, len(text)),
                  i -> substr(text, CAST(i AS INT), 1))) AS ch
              FROM documents WHERE len(text) >= 1),
            cnt AS (SELECT doc_id, source, ch, COUNT(*) AS c
              FROM pos GROUP BY 1, 2, 3),
            ent AS (SELECT doc_id, source,
                log2(SUM(c))
                  - list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(list_sort(list(c)),
                        c -> CAST(c AS DOUBLE) * log2(c))),
                      (acc, v) -> acc + v) / SUM(c) AS h
              FROM cnt GROUP BY 1, 2)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN h < $EntropyThreshold THEN 1 ELSE 0 END) AS BIGINT)
                AS n_low_entropy,
              round(AVG(h), 3) AS mean_entropy
            FROM ent GROUP BY source ORDER BY source""",
      "t06_bigram_counts" ->
        s"""SELECT bigram, COUNT(*) AS n FROM (
              SELECT unnest(list_transform(generate_series(1, len($toks) - 1),
                i -> $toks[i] || ' ' || $toks[i+1])) AS bigram
              FROM documents WHERE len($toks) >= 2)
            GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25""",
      "t09_lexical_diversity" ->
        s"""SELECT source,
            COUNT(DISTINCT token) AS vocab,
            COUNT(*) AS n_tokens,
            ROUND(COUNT(DISTINCT token) / COUNT(*), 6) AS ttr
            FROM (SELECT source, unnest($toks) AS token FROM documents)
            GROUP BY source ORDER BY source""",
      "t08_cms_counts" -> {
        import graft.functions.CmsSketch
        val aList = CmsSketch.A.mkString("[", ", ", "]")
        val bList = CmsSketch.B.mkString("[", ", ", "]")
        val qVals = TextAnalysis.cmsQueryTokens.flatMap { t =>
          val tv = CmsSketch.tokenValString(t)
          (0 until CmsSketch.Depth).map(d => s"('$t', $d, ${CmsSketch.bucket(d, tv)})")
        }.mkString(", ")
        s"""WITH toksrc AS (SELECT unnest($toks) AS t FROM documents),
            grid AS (SELECT d,
                (((${TS.tokenVal("t")}) * ($aList)[d+1] + ($bList)[d+1])
                  % ${CmsSketch.P}) % ${CmsSketch.Width} AS w,
                COUNT(*) AS c
              FROM toksrc CROSS JOIN generate_series(0, ${CmsSketch.Depth - 1}) s(d)
              GROUP BY 1, 2),
            q(token, d, w) AS (VALUES $qVals),
            est AS (SELECT token, MIN(COALESCE(c, 0)) AS est
                    FROM q LEFT JOIN grid USING (d, w) GROUP BY token),
            ex AS (SELECT t AS token, COUNT(*) AS exact FROM toksrc GROUP BY 1)
            SELECT token, est, COALESCE(exact, 0) AS exact,
              est - COALESCE(exact, 0) AS overcount
            FROM est LEFT JOIN ex USING (token) ORDER BY token"""
      },
      "t07_bm25_search" -> {
        val termsVals = searchTerms.map(t => s"('$t')").mkString(", ")
        s"""WITH d AS (SELECT doc_id, $toks AS toks,
                  CAST(len($toks) AS DOUBLE) AS dl FROM documents),
            stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM d),
            tf AS (SELECT doc_id, dl, term,
                     CAST(len(list_filter(toks, t -> t = term)) AS DOUBLE) AS tf
                   FROM d CROSS JOIN (VALUES $termsVals) q(term)),
            dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf WHERE tf > 0 GROUP BY term),
            scored AS (SELECT doc_id,
                ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                  * tf * (1.2 + 1.0)
                  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS score
              FROM tf JOIN dfq USING (term) CROSS JOIN stats)
            SELECT doc_id, ROUND(SUM(score), 4) AS bm25
            FROM scored GROUP BY doc_id HAVING ROUND(SUM(score), 4) > 0
            ORDER BY bm25 DESC, doc_id LIMIT 20"""
      },
    )
  }
}
