package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF, TextSql => TS, VectorFunctions => VF, VectorSql => VS}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.D — deduplication over documents + embeddings.
  *
  * Every near-dup operator avoids the O(n²) cross join: candidate
  * generation is an equi-join on a derived key (shingle hash for d02, LSH
  * band key for d03, (label, sign-LSH band) for d05), which shuffles
  * linearly by key
  * and only scores within-bucket pairs — the property that survives a
  * 100 TB corpus. All hash arithmetic is explicit integer math mod 1e9+7
  * (SURVEY §6) so the DuckDB oracle reproduces values exactly.
  */
object Dedup {

  private val P = TF.HashMod

  /** Deterministic MinHash parameters: h_i(s) = (a_i·s + b_i) mod P,
    * 32 hashes → 16 bands × 2 rows. a_i ≠ 0 (mod P prime). */
  val minhashA: Seq[Long] = (1 to 32).map(i => (2654435761L * i) % P)
  val minhashB: Seq[Long] = (1 to 32).map(i => (2747636419L * i + 40503L) % P)

  private def normText: Column =
    lower(regexp_replace(trim(col("text")), "\\s+", " "))

  /** d01's exact-dup key over a `text` column — single-sourced with the
    * stream_exactdedup ingest twin so the durable dedup cannot key
    * differently from the batch canonical-pick. */
  private[graft] def d01DupKey: Column = md5(normText)

  /** Threshold filter wrapped in coalesce(_, false): same rows (the score
    * is never null), but blocks constraint propagation from inferring
    * isnotnull() on the score's inputs — that inference re-inlines the
    * whole interpreted shingle/cosine expression into a pre-Generate
    * Filter and re-runs tokenization per element access (~7x the whole
    * operator's cost at sf0.1; see the Filter node in .explain before
    * this guard). */
  private def atLeast(score: Column, t: Double): Column =
    coalesce(score >= t, lit(false))

  /** d01: exact dedup — canonical-pick over md5(normalized text) groups.
    * One shuffle on the 128-bit group key; at 100 TB the window min is a
    * partial-aggregable pattern (AQE coalesces the tiny groups). */
  def d01ExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("dup_group"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), d01DupKey.as("dup_group"))
      .withColumn("is_canonical", col("doc_id") === min(col("doc_id")).over(w))
      .orderBy("doc_id")
  }

  /** doc_id → distinct word-3-gram shingle hash set (docs with ≥3 tokens),
    * via the native codegen'd [[graft.functions.ShingleHashesExpr]] —
    * value-identical to the declarative TF.tokenVals→shingleHashesFromVals
    * chain (NativeExprSpec proves it) but a compiled loop per row.
    * Shared with the streaming verify stage
    * ([[graft.streaming.StreamNearDedup.verified]]) so online and batch
    * Jaccard are computed from the same shingle sets. */
  private[graft] def shingleSets(docs: DataFrame): DataFrame =
    docs.withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), graft.functions.NativeFunctions.shingleHashes(col("toks")).as("sh"))

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    shingleSets(Tables.documents(spark, dir))

  /** d02: n-gram Jaccard near-dups via an inverted shingle index: explode
    * shingles → self-equi-join on the hash → shared-count per pair →
    * Jaccard = shared / (|A|+|B|−shared) ≥ 0.2. Linear in corpus size ×
    * shingle frequency; heavy shingles are the skew risk at scale — the
    * `maxDf` stop-shingle cap ([[dfCapped]]) removes the quadratic
    * hot-bucket term, AQE skew-join re-splits what remains. */
  /** Unsorted near-dup pairs ≥ 0.2 — shared core of d02 (which adds the
    * presentation round+sort) and d07 (which consumes the raw pair set).
    * Defined as the Jaccard projection over [[sharedShingleCounts]] so
    * the inverted-index candidate join exists exactly ONCE (d09's
    * containment scoring reads the same base relation — a hint or
    * threshold change there cannot drift from this path). */
  private def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(spark, dir, NoDfCap)

  private[graft] def ngramJaccardPairs(spark: SparkSession, dir: String,
      maxDf: Long): DataFrame =
    sharedShingleCounts(spark, dir, maxDf)
      .withColumn("jaccard", col("shared") / (col("ni") + col("nj") - col("shared")))
      .filter(atLeast(col("jaccard"), 0.2))

  /** Prefix-filtered variant (PPJoin, Xiao et al.): under a global
    * shingle order (doc-frequency asc, hash asc), two sets with
    * J ≥ t must share a shingle within their first |x|−⌈t·|x|⌉+1
    * elements — so only PREFIX shingles are indexed/joined, and the
    * rarest shingles land in the prefix, collapsing hot buckets.
    * Candidates are then verified with exact Jaccard on the full sets.
    * Result-identical to [[ngramJaccardPairs]] (spec-pinned at every SF).
    *
    * This is the scale path for ZIPFIAN corpora, where a handful of
    * stop-shingles otherwise produce quadratic hot buckets: the prefix
    * drops exactly those. On THIS testdata (synthetic ~30-word vocab,
    * near-uniform shingle df) there is no skew to exploit and the extra
    * df-join + per-doc window make it ~2× slower than the plain
    * inverted index (measured sf0.1: 3.6 s vs 1.8 s), so the plain
    * index stays the default; on a natural-language 100 TB corpus the
    * preference inverts. */
  private[graft] def ngramJaccardPairsPrefix(spark: SparkSession, dir: String,
      t: Double = 0.2): DataFrame = {
    val sh = docShingles(spark, dir)
    val ex = shingleIndexRows(Tables.documents(spark, dir))
    val df_ = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
    val prefix = ex.join(df_, "h")
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= col("n") - ceil(col("n") * lit(t)) + lit(1))
      .select("doc_id", "h")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .distinct()
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    cand
      .join(sh.select(col("doc_id").as("doc_i"), col("sh").as("sh_i")), "doc_i")
      .join(sh.select(col("doc_id").as("doc_j"), col("sh").as("sh_j")), "doc_j")
      .withColumn("jaccard", inter / (size(col("sh_i")) + size(col("sh_j")) - inter))
      .filter(atLeast(col("jaccard"), t))
      .select(col("doc_i"), col("doc_j"), col("jaccard"))
  }

  def d02NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    d02NgramJaccard(spark, dir, NoDfCap)

  /** `maxDf` is the [[dfCapped]] stop-shingle knob: the gate runs
    * uncapped (oracle parity); a boilerplate-heavy 100 TB corpus sets a
    * cap around a high df quantile of the index (ScaleProbe --skew
    * measures the quadratic term it removes). */
  def d02NgramJaccard(spark: SparkSession, dir: String, maxDf: Long): DataFrame =
    ngramJaccardPairs(spark, dir, maxDf)
      .select(col("doc_i"), col("doc_j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_i", "doc_j")

  /** 32-element MinHash signature of a shingle-hash set. */
  def minhashSig(sh: Column): Column =
    array(minhashA.zip(minhashB).map { case (a, b) =>
      aggregate(sh, lit(P), (m, s) => least(m, (s * lit(a) + lit(b)) % lit(P)))
    }: _*)

  /** d03: MinHash + LSH — the dedup scale path. Signatures are map-side;
    * candidates come from an equi-join on (band, band-key) over 16 bands
    * of 2 rows (P(candidate) = 1−(1−j²)^16: ≈99% at j=0.5, ≈1% at the
    * j≈0.025 background), then candidates are verified with exact Jaccard
    * ≥ 0.2. Only candidate pairs are ever scored — never all pairs.
    * (rows × bands) is the knob pair tied to the Jaccard threshold —
    * the S-curve's midpoint sits at j ≈ (1/bands)^(1/rows), so a higher
    * dedup threshold wants more rows per band and fewer bands; same
    * trade as d05's (bandBits × nBands). */
  /** (doc_id, band, key) MinHash-LSH index rows over a `doc_id`+`text`
    * relation — the SINGLE source of the 16×2 banding arithmetic, shared
    * by batch d03, the online [[graft.streaming.StreamNearDedup]], and
    * the streaming spec's batch reference: a band-count or key-math
    * change here changes all three together (the round-4
    * single-sourcing rule for shared join shapes). */
  private[graft] def minhashBandKeys(docs: DataFrame): DataFrame =
    bandKeysOfSigs(minhashSigs(docs))

  /** (doc_id, sh, sig) MinHash signatures of a `doc_id`+`text` relation —
    * the shared signature pass of d03 and d14. */
  private[graft] def minhashSigs(docs: DataFrame): DataFrame =
    docs.withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), graft.functions.NativeFunctions.shingleHashes(col("toks")).as("sh"))
      .withColumn("sig", graft.functions.NativeFunctions.minhashSig(col("sh")))

  /** The 16×2 band-key arithmetic over a precomputed signature relation
    * (kept separate from [[minhashSigs]] so consumers that need the
    * signature itself — d14 — derive keys from the SAME sig column). */
  private[graft] def bandKeysOfSigs(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)), j =>
          element_at(col("sig"), (j * lit(2) + lit(1)).cast("int")) * lit(P) +
            element_at(col("sig"), (j * lit(2) + lit(2)).cast("int")))))
      .toDF("doc_id", "band", "key")

  /** Distinct (doc_i < doc_j) candidate pairs from a band-key index —
    * THE candidate equi-join of the MinHash family, existing exactly
    * once (the round-4 single-sourcing rule): d03's verify and d14's
    * calibration both consume it, so a hint or key-math change reaches
    * every consumer together. */
  private[graft] def minhashCandidatePairs(bands: DataFrame): DataFrame =
    bands.as("a").hint("SHUFFLE_HASH").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .distinct()

  /** VERIFIED MinHash-LSH near-dup pairs (exact Jaccard ≥ 0.2 on the
    * band-collision candidates) over any `doc_id`+`text` relation —
    * the raw pair set d03 presents and [[Pipelines.p10NeardupCorpus]]
    * feeds into connected components (the round-4 single-sourcing rule:
    * band math, candidate join, and verify threshold exist once). */
  private[graft] def minhashVerifiedPairs(docs: DataFrame): DataFrame = {
    val sh = shingleSets(docs)
    val cand = minhashCandidatePairs(minhashBandKeys(docs))
    val inter = size(array_intersect(col("sh_i"), col("sh_j")))
    cand
      .join(sh.select(col("doc_id").as("doc_i"), col("sh").as("sh_i")), "doc_i")
      .join(sh.select(col("doc_id").as("doc_j"), col("sh").as("sh_j")), "doc_j")
      .withColumn("jaccard", inter / (size(col("sh_i")) + size(col("sh_j")) - inter))
      .filter(atLeast(col("jaccard"), 0.2))
  }

  def d03MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashVerifiedPairs(Tables.documents(spark, dir))
      .select(col("doc_i"), col("doc_j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_i", "doc_j")

  /** d14: MinHash estimator CALIBRATION over d03's candidate pairs —
    * the audit that tells you whether the sketch's banding knobs are
    * sized to the corpus BEFORE a 100 TB dedup run commits to them
    * (s04's recall-audit idea applied to the MinHash family). For every
    * band-collision candidate (the raw LSH output, BEFORE the ≥ 0.2
    * verify — false positives are exactly what's being measured), emit
    * the estimator numerator (equal positions out of the 32-hash
    * signature) next to the exact overlap (shared, union shingle
    * counts): est = matches/32 vs true j = shared/union, reported as
    * raw integers so the gate has no float boundary. Plan shape is
    * d03's own: band-key equi-join candidates only (never all pairs),
    * signatures map-side; the per-pair position compare is a bounded
    * 32-element fold on candidate rows, not a corpus scan. */
  def d14MinhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    // band keys derive from the SAME signature relation that is joined
    // back per candidate — one signature definition. (The band join
    // stays slim on purpose: carrying the 32-long sig through the
    // 16-way band explode would widen the candidate shuffle 16×; the
    // per-branch signature evaluation is the cheaper side of that
    // trade, as in d03's shingle re-join.)
    val sigs = minhashSigs(Tables.documents(spark, dir))
    val cand = minhashCandidatePairs(bandKeysOfSigs(sigs))
    val est = aggregate(
      zip_with(col("sig_i"), col("sig_j"),
        (a, b) => when(a === b, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    val inter = size(array_intersect(col("sh_i"), col("sh_j"))).cast("long")
    cand
      .join(sigs.select(col("doc_id").as("doc_i"), col("sh").as("sh_i"),
        col("sig").as("sig_i")), "doc_i")
      .join(sigs.select(col("doc_id").as("doc_j"), col("sh").as("sh_j"),
        col("sig").as("sig_j")), "doc_j")
      .select(col("doc_i"), col("doc_j"), est.as("est_matches"),
        inter.as("shared"),
        (size(col("sh_i")).cast("long") + size(col("sh_j")).cast("long")
          - inter).as("uni"))
      .orderBy("doc_i", "doc_j")
  }

  /** 63-bit SimHash over per-token portable hashes: bit b is the sign of
    * Σ_tokens ±1 where the ±1 is universal-hash bit b of the token value.
    * (63 bits, not 64, to stay in non-negative BIGINT range in both
    * engines.) Map-side only — fingerprinting 100 TB is a pure scan.
    * Production path is the native [[graft.functions.Simhash63Expr]]
    * (NativeExprSpec proves bit-for-bit parity); this declarative form is
    * the oracle-mirror reference. */
  def simhash63Declarative(toks: Column): Column = {
    val tokVals = transform(toks, t => TF.tokenVal(t).cast("long"))
    aggregate(sequence(lit(0), lit(62)), lit(0L), (acc, b) =>
      acc + when(
        aggregate(tokVals, lit(0L), (s, v) =>
          s + when(((v * (((b.cast("long") + lit(1L)) * lit(1103515245L)) % lit(P))
            + (b.cast("long") * lit(12345L) + lit(6789L))) % lit(P)) % lit(2L) === lit(1L),
            lit(1L)).otherwise(lit(-1L))) > 0,
        pow(2.0, b).cast("long")).otherwise(lit(0L)))
  }

  /** d04: per-document SimHash signatures (near-dup detection = hamming
    * distance on these; banding 4×16 bits gives the candidate join —
    * exercised in the spec, the signature table is the oracle surface). */
  def d04Simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("doc_id"),
        graft.functions.NativeFunctions.simhash63(col("toks")).as("simhash"))
      .orderBy("doc_id")

  /** d06: SimHash near-dup PAIRS — the banded-candidate + hamming-verify
    * path over d04's signatures. The 63-bit signature splits into four
    * 16-bit bands; pairs agreeing on any band (equi-join, linear shuffle)
    * are verified with bit_count(xor) ≤ 8. Same LSH-style shape as d03:
    * candidates from an equi-join, never all pairs. */
  def d06SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("doc_id"),
        graft.functions.NativeFunctions.simhash63(col("toks")).as("simhash"))
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 to 3).map(b => struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a").hint("SHUFFLE_HASH").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(atLeast(lit(8L) - col("hamming"), 0.0)) // hamming <= 8, barrier form
      .orderBy("doc_i", "doc_j")
  }

  /** d05: embedding-cosine near-dups, blocked on (label, sign-LSH band).
    *
    * Label alone is NOT a scalable block key: label cardinality is fixed
    * while the corpus grows, so the largest label block pairs O(n²) rows
    * at 100 TB. The block key therefore composes the label with a
    * sign-LSH band of the embedding (VectorFunctions.signBucket split
    * into two 4-bit bands, d03-style banding): a pair is a candidate
    * when it collides in EITHER band, scored by exact cosine, and the
    * two band branches are deduped by DISTINCT on the scored pair.
    * Within-block size now shrinks multiplicatively with the bucket
    * count, and (bandBits × nBands) is the knob pair tied to the
    * similarity threshold exactly as d03's (2 rows × 16 bands) is tied
    * to Jaccard 0.2: P[band collides] ≈ (1-θ/π)^bandBits per band, so
    * lower thresholds (wider θ) want narrower/more bands, and corpus
    * growth wants wider bands. The DEFAULT (2 bits × 4 bands) is sized
    * by that rule for the threshold this operator actually applies:
    * at the cos ≥ 0.35 boundary (θ≈69.5°, p≈0.61/bit) a 2-bit band
    * collides with P≈0.38, so 4 bands capture 1−(1−0.38)⁴ ≈ 85% of
    * boundary pairs (and more above it). The earlier 4-bit × 2-band
    * setting was sized for a production cos ≥ 0.9 regime (p≈0.1/bit,
    * capture ≈92% THERE) and caught only ~26% at 0.35 — band knobs
    * must follow the operator threshold, so a caller raising the
    * threshold toward 0.9 should widen bands (e.g. back to 4×2) with
    * the same total-bit budget. The row count is pinned by the oracle,
    * which applies identical banding. */
  def d05EmbeddingDup(spark: SparkSession, dir: String): DataFrame =
    d05EmbeddingDup(spark, dir, bandBits = 2, nBands = 4)

  def d05EmbeddingDup(spark: SparkSession, dir: String, bandBits: Int,
      nBands: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    val e = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"),
        VF.signBucket(col("embedding"), bandBits * nBands).as("bkt"))
    def scoredPairs(band: Int): DataFrame = {
      val b = e.withColumn("band",
        shiftright(col("bkt"), band * bandBits).bitwiseAND(lit(mask)))
      b.select(col("label"), col("band"), col("vec_id").as("vec_i"), col("embedding").as("va"))
        .join(b.select(col("label"), col("band"), col("vec_id").as("vec_j"), col("embedding").as("vb")),
          Seq("label", "band"))
        .filter(col("vec_i") < col("vec_j"))
        .withColumn("cos", VF.cosine(col("va"), col("vb")))
        .filter(atLeast(col("cos"), 0.35))
        .select(col("label"), col("vec_i"), col("vec_j"), col("cos"))
    }
    (0 until nBands).map(scoredPairs).reduce(_ union _).distinct()
      .select(col("label"), col("vec_i"), col("vec_j"), round(col("cos"), 4).as("cosine"))
      .orderBy("vec_i", "vec_j")
  }

  /** d10: cross-split DECONTAMINATION — the train→eval leakage check
    * every LLM data pipeline runs before trusting its eval numbers.
    * Splits are assigned exactly as p02/p03 (fingerprint % 100), then a
    * val/test document is flagged when ≥ 30% of its distinct 3-gram
    * shingles also occur ANYWHERE in the train split: containment of
    * the eval doc in the train corpus, which catches both verbatim dups
    * that straddled the split boundary and partial copy-paste overlap.
    *
    * Scale shape: the train side collapses to DISTINCT shingle hashes
    * (one shuffle, linear), the eval side explodes its shingles, and
    * membership is a LEFT SEMI equi-join on the hash — per-shingle
    * work, never doc×doc. At 100 TB this is the standard inverted-index
    * decontamination sweep; a bloom/minhash prefilter is the documented
    * cheapening knob when the train index outgrows a shuffle. */
  def d10CrossSplitLeakage(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame = {
    val withSplit = d10Prepared(Tables.documents(spark, dir))
    d10Contamination(withSplit.filter(col("split") =!= "train"),
      d10TrainIndex(withSplit), threshold)
  }

  /** d10 with the broadcast-Bloom prefilter engaged (see the 4-arg
    * [[d10Contamination]]) — result-identical, shuffle-lighter. */
  def d10CrossSplitLeakageBloom(spark: SparkSession, dir: String,
      threshold: Double = 0.3, bloomItems: Long = 1000000L): DataFrame = {
    val withSplit = d10Prepared(Tables.documents(spark, dir))
    d10Contamination(withSplit.filter(col("split") =!= "train"),
      d10TrainIndex(withSplit), threshold, bloomItems)
  }

  /** d10's per-doc preparation from raw (doc_id, text) rows: tokenize,
    * assign the p02 fingerprint split, shingle. Factored so the
    * STREAMING twin ([[graft.streaming.StreamDecontam]]) runs the
    * identical code on each arriving micro-batch. */
  private[graft] def d10Prepared(docs: DataFrame): DataFrame =
    d10ShingleTail(docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("bucket",
        pmod(graft.functions.NativeFunctions.polyFingerprint(col("toks")), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val")
          .otherwise("test")))

  /** [[d10Prepared]] for docs that ALREADY carry their release `split`
    * — p20's stage 4 must screen against the split the release
    * actually SHIPPED, not one re-derived from post-surgery text
    * (surgery changes the fingerprint, so re-deriving would silently
    * reassign documents across splits). */
  private[graft] def d10PreparedKeepSplit(docs: DataFrame): DataFrame =
    d10ShingleTail(docs.withColumn("toks", TF.tokens(col("text"))))

  /** The single shared min-token filter + shingle projection behind
    * both prepared forms — one definition, the gated path and the
    * release build cannot drift. Expects `doc_id`, `split`, `toks`. */
  private def d10ShingleTail(withToks: DataFrame): DataFrame =
    withToks
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("split"),
        graft.functions.NativeFunctions.shingleHashes(col("toks")).as("sh"))

  /** The DISTINCT train-split shingle index ([[d10Prepared]] rows in,
    * one `h` column out) — built once, reused by batch d10 and as the
    * STATIC side of the streaming decontamination join. */
  private[graft] def d10TrainIndex(withSplit: DataFrame): DataFrame =
    withSplit.filter(col("split") === "train")
      .select(explode(col("sh")).as("h")).distinct()

  /** The scoring tail shared by batch d10 and the streaming twin:
    * explode eval shingles, left-semi the train index, per-doc
    * containment ≥ threshold. */
  private[graft] def d10Contamination(evalDocs: DataFrame,
      trainShingles: DataFrame, threshold: Double): DataFrame =
    d10Contamination(evalDocs, trainShingles, threshold, bloomItems = 0L)

  /** The Bloom-prefiltered form — DEPLOY's documented cheapening knob for
    * when the train shingle index outgrows a comfortable shuffle,
    * implemented with Spark's OWN runtime-filter machinery
    * ([[graft.functions.NativeFunctions.bloomAgg]]): the index collapses
    * to one broadcast Bloom sketch (n·~10 bits at 1% fpp — a 100 B-shingle
    * index is ~120 GB to shuffle but ~125 MB as a sketch) and the
    * exploded eval shingles are pruned MAP-SIDE before the exact
    * left-semi join. Exactness is free: a false positive merely survives
    * to the semi join, which rejects it — so the output is IDENTICAL to
    * the plain form (spec-pinned), only the shuffle volume changes.
    * `bloomItems` = expected distinct train shingles; 0 disables. */
  private[graft] def d10Contamination(evalDocs: DataFrame,
      trainShingles: DataFrame, threshold: Double,
      bloomItems: Long): DataFrame = {
    val exploded = evalDocs
      .select(col("doc_id"), col("split"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("h"))
    val probed =
      if (bloomItems <= 0L) exploded
      else exploded.filter(graft.functions.NativeFunctions.mightContain(
        trainShingles.agg(
          graft.functions.NativeFunctions.bloomAgg(col("h"), bloomItems).as("bf")),
        col("h")))
    probed
      .join(trainShingles, Seq("h"), "left_semi")
      .groupBy(col("doc_id"), col("split"), col("n_shingles"))
      .agg(count(lit(1)).as("n_leaked"))
      .withColumn("contamination", col("n_leaked") / col("n_shingles").cast("double"))
      .filter(atLeast(col("contamination"), threshold))
      .select(col("doc_id"), col("split"), col("n_shingles"), col("n_leaked"),
        round(col("contamination"), 4).as("contamination"))
      .orderBy("doc_id")
  }

  /** d16's planted EXTERNAL benchmark table (bench_id, text) — the
    * deterministic stand-in for a published eval suite (t18's planting
    * discipline: the synthetic corpus quotes nothing naturally, so plant
    * from doc_id and MEASURE). Every 17th document contributes two
    * items: a QUOTED item (`bench_id = doc_id`) whose text is the
    * leading `sliceNum`/5 of the document's tokens — an eval question
    * that quotes corpus text verbatim, the contamination mode published
    * benchmarks actually exhibit — and a CLEAN item
    * (`bench_id = −doc_id−1`, m04's collision-proof id rule) of
    * synthetic tokens that occur nowhere in the corpus. A correct
    * detector must flag every quoted item and no clean item. */
  private[graft] def d16Benchmark(spark: SparkSession, dir: String,
      sliceNum: Int = 3): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(pmod(col("doc_id"), lit(17)) === 0)
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 5)
    val quoted = base.select(col("doc_id").as("bench_id"),
      concat_ws(" ", slice(col("toks"), lit(1),
        greatest(lit(3), expr(s"(size(toks)*$sliceNum) div 5")))).as("text"))
    val clean = base.select((-col("doc_id") - 1).as("bench_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(8)),
        j => format_string("xbench%dq%d", col("doc_id"), j))).as("text"))
    quoted.unionByName(clean)
  }

  /** The WHOLE-corpus distinct shingle index d16 probes — d10's index
    * shape with the train-split filter dropped: the production question
    * is "is this published benchmark anywhere in my corpus", not "did it
    * cross my own split boundary". One partial-aggregable distinct
    * shuffle, linear in corpus shingles. */
  private[graft] def d16CorpusIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(explode(
        graft.functions.NativeFunctions.shingleHashes(col("toks"))).as("h"))
      .distinct()

  /** d16's scoring core — the SAME [[d10Contamination]] tail (explode →
    * optional Bloom prefilter → left-semi → per-item containment), so
    * the external detector can never disagree with the split-based one
    * on shared inputs (p11's single-sourcing rule; spec-pinned). */
  private[graft] def d16Flags(bench: DataFrame, index: DataFrame,
      threshold: Double, bloomItems: Long): DataFrame = {
    val prepared = bench
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("bench_id").as("doc_id"), lit("benchmark").as("split"),
        graft.functions.NativeFunctions.shingleHashes(col("toks")).as("sh"))
    d10Contamination(prepared, index, threshold, bloomItems)
      .select(col("doc_id").as("bench_id"), col("n_shingles"),
        col("n_leaked"), col("contamination"))
      .orderBy("bench_id")
  }

  /** d16: EXTERNAL-BENCHMARK decontamination — d10 screens the
    * pipeline's OWN splits; the production question before trusting any
    * published eval number is "is that benchmark suite inside my
    * training corpus". Probe an external eval table ([[d16Benchmark]]'s
    * planted suite) against the whole-corpus shingle index: a benchmark
    * item is contaminated when ≥ `threshold` of its distinct 3-gram
    * shingles occur anywhere in the corpus (verbatim quotes and partial
    * overlap both trip it).
    *
    * Scale shape is d10's, with the corpus side as the index: distinct
    * shingles once (linear shuffle), benchmark side exploded (benchmarks
    * are tiny next to the corpus — the join is broadcast in practice),
    * membership a left-semi equi-join; `bloomItems > 0` engages the
    * broadcast-Bloom prefilter (d10's knob — at 100 TB the corpus index
    * is the heavy side, so pruning benchmark shingles map-side against a
    * ~125 MB sketch before the exact join is the same 1000× shuffle
    * lever, and exactness is free because the semi join rejects the
    * sketch's false positives). */
  def d16BenchmarkDecontam(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame =
    d16BenchmarkDecontam(spark, dir, threshold, bloomItems = 0L)

  def d16BenchmarkDecontam(spark: SparkSession, dir: String,
      threshold: Double, bloomItems: Long): DataFrame =
    d16Flags(d16Benchmark(spark, dir), d16CorpusIndex(spark, dir),
      threshold, bloomItems)

  /** The PRODUCTION entry point: probe a USER-SUPPLIED benchmark table
    * — `(bench_id BIGINT, text STRING)`, e.g. a published eval suite
    * loaded from parquet — against THIS corpus's whole-corpus shingle
    * index. The planted [[d16Benchmark]] suite stays the gate fixture
    * (its quoted/clean construction is what makes the hash gate
    * self-verifying); this overload is the same scoring tail under an
    * external table, so the two can never disagree on shared inputs
    * (spec-pinned on a file-loaded suite). */
  def d16BenchmarkDecontam(spark: SparkSession, dir: String,
      bench: DataFrame, threshold: Double, bloomItems: Long): DataFrame =
    d16Flags(bench, d16CorpusIndex(spark, dir), threshold, bloomItems)

  /** Cosine threshold for [[d13SemanticDecontamination]] — d05's
    * near-dup regime. Measured clearance of the eval×train cosine
    * population at 0.35: ≥ 3.8e-5 at every test SF (sf0.001/0.01/0.1),
    * ~10⁷ × cross-engine float drift (SURVEY §6 rule). */
  val D13Tau = 0.35

  /** Portable split bucket on an INTEGER id — the embedding-side
    * analogue of p02's text-fingerprint split for rows that carry no
    * text. md5-prefix idiom (t15/d11): both engines hash the decimal
    * string of the id and take the top 60 bits, so assignment is
    * engine-portable and purely map-side. */
  private def idBucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(100L))

  /** d13: SEMANTIC cross-split decontamination — d10's embedding-space
    * sibling. d10 catches an eval document whose SHINGLES leak from the
    * train split (verbatim/copy-paste overlap); this catches one whose
    * MEANING does (paraphrase, translation, re-rendering — the leakage
    * mode shingle decontamination provably misses). A non-train vector
    * (val OR test — `split <> 'train'`, exactly d10's screened set) is
    * flagged when any train-split vector sits within cosine ≥ τ, with
    * the split assigned by the portable id-hash bucket ([[idBucket]],
    * 80/10/10 as p02).
    *
    * Scale shape: this is EXACT range search with the eval split as the
    * query set — precisely the "large query set" regime s06's docstring
    * warns the brute scan dies on (val+test is ~20% of the corpus, so
    * brute is O(0.8n·0.2n) = O(n²)). The train split is assigned once to
    * inverted lists (map-side, broadcast centroid literals), each eval
    * vector keeps only the lists the triangle inequality cannot rule
    * out, and the exact cosine ≥ τ verify runs on the surviving
    * (list, query) members via the list_id equi-join. Unlike s06 the
    * probe side is NOT broadcast — at scale it is corpus-sized, so both
    * sides shuffle by list_id (AQE broadcasts it while small); nLists
    * ≈ √n keys the shuffle, and pruning power — not exactness — rides
    * the clustering quality (Similarity.rangeIndexOf's contract).
    * Output is per-eval-id (count, max cosine): all-integer but the
    * rounded max, no pair-level float ordering in the gate. */
  def d13SemanticDecontamination(spark: SparkSession, dir: String,
      tau: Double = D13Tau, nLists: Int = 0): DataFrame = {
    // nLists ≤ 0 = footer-auto (⌈√n⌉, r13): the no-knob entry sizes
    // like every other index family; exactness is knob-independent
    // (triangle bound), so gates are unchanged at any value
    val nl = if (nLists > 0) nLists else Similarity.autoNLists(spark, dir)
    val (assigned, probes) = d13Index(spark, dir, tau, nl)
    assigned.select(col("list_id"), col("embedding").as("cv"))
      .join(probes, Seq("list_id"))
      .withColumn("cos", VF.cosine(col("qv"), col("cv")))
      .filter(atLeast(col("cos"), tau))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_near"), round(max(col("cos")), 4).as("max_cos"))
      .select(col("query_id").as("eval_id"), col("n_near"), col("max_cos"))
      .orderBy("eval_id")
  }

  /** d13's (train-side inverted index, surviving eval probes) — exposed
    * for the spec's pruning-effectiveness assertion (s06Probes
    * precedent). */
  private[graft] def d13Index(spark: SparkSession, dir: String, tau: Double,
      nLists: Int): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(spark, dir)
      .filter(Similarity.positiveNorm) // zero-norm: undefined cosine, see Similarity.positiveNorm
      .withColumn("bucket", idBucket(col("vec_id")))
    val train = e.filter(col("bucket") < 80).select(col("vec_id"), col("embedding"))
    val evalSplit = e.filter(col("bucket") >= 80).select(col("vec_id"), col("embedding"))
    val n = Tables.parquetRowCount(spark, dir, "embeddings")
    // persisted under its own tag: the train-split index is a DIFFERENT
    // corpus from s06's full-table index (Similarity.rangeIndexPersisted)
    val (assigned, stats, cents) =
      Similarity.rangeIndexPersisted(spark, dir, "d13", train, n, nLists)
    val q = evalSplit
      .withColumn("cosines", Similarity.centroidCosines(cents))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cosines"))
    (assigned, Similarity.trianglePrune(q, stats, tau))
  }

  /** d07: duplicate CLUSTERS — connected components over the d02 pair
    * graph, the step that turns pairwise near-dup hits into actionable
    * dedup groups. Iterative min-label propagation PLUS pointer
    * jumping ([[connectedComponents]]): rounds are whole-graph joins
    * (distributed), the driver only checks the converged count, and
    * convergence is O(log diameter) — blob-shaped dup clusters close
    * in 2-3 rounds, and even a path-shaped chained-boilerplate graph
    * closes logarithmically; per-round checkpoints truncate the
    * growing lineage. Output: one row per cluster with its canonical
    * (min) doc and size.
    *
    * Checkpoint durability is a parameter: the default
    * `localCheckpoint` stores round blocks on executors only — fast,
    * but an executor loss mid-iteration kills the query. Connected
    * components is the longest multi-stage job in this suite, exactly
    * where lineage durability is worth paying for, so pass
    * `checkpointDir = Some(reliableDir)` on a real cluster to write
    * round snapshots through the reliable store instead (an executor
    * loss then recomputes nothing — rounds restart from the snapshot).
    *
    * Reliable-mode housekeeping: round snapshots are UNMANAGED parquet
    * writes under per-round subdirs of `checkpointDir` (written eagerly,
    * read back lazily) — not RDD checkpoints, because
    * `setCheckpointDir` is session-global and cannot be unset, so the
    * checkpoint route would leak the caller's (possibly temporary) dir
    * to every later `checkpoint()` in the session (r7 ADVICE; q36's
    * snapshot uses the same rule). A round's subdir is deleted as soon
    * as the NEXT round has materialized. Only the final round's and the
    * pair/edge snapshots survive: they back the returned lazy
    * DataFrame, so delete `checkpointDir` itself once the result is
    * consumed. */
  def d07DupClusters(spark: SparkSession, dir: String): DataFrame =
    d07DupClusters(spark, dir, checkpointDir = None)

  def d07DupClusters(spark: SparkSession, dir: String,
      checkpointDir: Option[String]): DataFrame = {
    val (labels, _) = connectedComponents(spark,
      ngramJaccardPairs(spark, dir).select(col("doc_i"), col("doc_j")),
      checkpointDir)
    labels.groupBy(col("cluster").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))
      .orderBy("cluster_id")
  }

  /** Distributed connected components over an undirected pair relation
    * (doc_i, doc_j) → (doc_id, cluster = component-min id), plus the
    * round count (spec-pinned to O(log diameter)).
    *
    * Each round does TWO shrink steps on the label function L:
    *   1. one-hop min propagation  L(v) ← min(L(v), min_{u∼v} L(u)) —
    *      the edge join, |E|-sized;
    *   2. pointer jumping          L(v) ← L(L(v)) — a |V|-sized
    *      label-to-label join (every label IS a node id, so the lookup
    *      is an equi-join on the label).
    * Step 1 alone converges in diameter rounds — fine for blob-shaped
    * dup clusters, O(d) for the chained-boilerplate corpora that
    * produce path-shaped near-dup graphs. Step 2 doubles how far the
    * min has travelled per round (the classic pointer-jumping
    * argument), so convergence is O(log d) rounds: a 64-node path
    * closes in 6 rounds, not 63 (DedupSpec pins this). The fixpoint is
    * unchanged — labels only ever decrease and stabilize exactly when
    * constant per component — so the d07 oracle is untouched. */
  private[graft] def connectedComponents(spark: SparkSession, pairs0: DataFrame,
      checkpointDir: Option[String]): (DataFrame, Int) = {
    val sc = spark.sparkContext
    def rmDir(sub: String): Unit = checkpointDir.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d + "/" + sub)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
    }
    // Reliable mode = unmanaged parquet snapshot (eager write, lazy
    // read-back): identical durability to Dataset.checkpoint with no
    // session-global setCheckpointDir mutation (see docstring).
    def ckpt(df: DataFrame, sub: String): DataFrame = checkpointDir match {
      case None => df.localCheckpoint()
      case Some(d) =>
        df.write.mode("overwrite").parquet(d + "/" + sub)
        spark.read.parquet(d + "/" + sub)
    }
    // Materialize the (expensive) pair generation ONCE before the union —
    // the two union branches are otherwise separate subtrees and would
    // re-run the whole inverted-index join twice.
    val pairs = ckpt(pairs0, "static")
    val edges = pairs.union(pairs.select(col("doc_j"), col("doc_i")))
      .toDF("src", "dst")
    var labels = ckpt(edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")), "round-0")
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val prop = labels.join(edges, col("doc_id") === col("src"))
        .groupBy(col("dst")).agg(min(col("cluster")).as("nbr_min"))
      // Carry the previous label through the propagation join so the
      // convergence check is a filter on the SAME materialized round —
      // not a second doc_id join+shuffle per iteration. PERSIST hop
      // before the jump: the jump joins hop against its own projection,
      // and without a cache both branches would recompute the |E|-sized
      // propagation join — doubling every round and costing blob-shaped
      // graphs (2-3 rounds) more than the jump saves them.
      val hop = labels.join(prop, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), col("cluster").as("prev"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // pointer jump: adopt the (never larger) label of my label
      val ptr = hop.select(col("doc_id").as("p_id"), col("cluster").as("p_cluster"))
      val next = ckpt(hop.join(ptr, col("cluster") === col("p_id"), "left")
        .select(col("doc_id"), col("prev"),
          least(col("cluster"), coalesce(col("p_cluster"), col("cluster"))).as("cluster")),
        s"round-$round")
      converged = next.filter(col("prev") =!= col("cluster")).isEmpty
      hop.unpersist(blocking = false) // `next` is materialized by ckpt
      labels = next.select(col("doc_id"), col("cluster"))
      rmDir(s"round-${round - 1}") // superseded — `next` is materialized
    }
    (labels, round)
  }

  /** d08: near-dup contamination by source — the report a corpus owner
    * acts on: which source pairs produce the near-dup pairs, with mean
    * similarity. Composition: d02's pair set joined back to the
    * doc→source map twice (one row per document — SF-linear, so NO
    * broadcast hint: the pair set is already shuffled on doc ids and AQE
    * picks broadcast only while the map measures small), unordered pair
    * normalized with least/greatest, one group-by. */
  def d08NeardupBySource(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    // average the UNROUNDED jaccard: a mean of pre-rounded 4-decimal
    // values can land exactly on a .00005 tie where the engines' rounding
    // modes disagree (seen at sf0.1); full-precision means never do
    ngramJaccardPairs(spark, dir)
      .join(src.select(col("doc_id").as("doc_i"), col("source").as("src_i")), "doc_i")
      .join(src.select(col("doc_id").as("doc_j"), col("source").as("src_j")), "doc_j")
      .select(least(col("src_i"), col("src_j")).as("src_a"),
        greatest(col("src_i"), col("src_j")).as("src_b"), col("jaccard"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("jaccard")), 4).as("avg_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** The d19 span chain as a DuckDB CTE block (through `sp`, the
    * per-doc maximal-span relation) — shared verbatim by the d19 and
    * d20 oracles so the two gates can never test different surgery
    * semantics. */
  private def d19SpanCtes: String =
    s"""pos AS (
              SELECT doc_id, text,
                unnest(generate_series(1, len(text) - $ExactSpanChars + 1)) AS i
              FROM documents WHERE len(text) >= $ExactSpanChars),
            occ AS (
              SELECT doc_id, CAST(i AS BIGINT) AS i,
                CAST(('0x' || substr(md5(substr(text, CAST(i AS INT),
                  $ExactSpanChars)), 1, 15)) AS BIGINT) AS fp
              FROM pos),
            mk AS (
              SELECT doc_id, i,
                ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, i) AS rn
              FROM occ),
            marked AS (SELECT doc_id, i FROM mk WHERE rn >= 2),
            lagd AS (
              SELECT doc_id, i,
                LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
              FROM marked),
            isl AS (
              SELECT doc_id, i,
                SUM(CASE WHEN prev IS NULL OR i - prev > $ExactSpanChars
                    THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS island
              FROM lagd),
            sp AS (
              SELECT doc_id, MIN(i) AS span_start,
                MAX(i) + $ExactSpanChars - 1 AS span_end,
                CAST(COUNT(*) AS BIGINT) AS n_windows
              FROM isl GROUP BY doc_id, island)"""

  /** The d07 connected-component chain as a DuckDB CTE block (through
    * `lab`, the doc_id → cluster relation) — shared verbatim by the d07
    * and d21 oracles so the two gates can never test different cluster
    * semantics. */
  private def d07CcCtes: String = {
    val toks = TS.toks
    val sh = TS.shingleHashes(toks)
    s"""d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM d),
            p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j
                  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, a.n, b.n
                  HAVING COUNT(*) / (a.n + b.n - COUNT(*)) >= 0.2),
            e AS (SELECT doc_i AS s, doc_j AS t FROM p
                  UNION SELECT doc_j, doc_i FROM p),
            r(s, t) AS (SELECT s, t FROM e
                        UNION SELECT r.s, e.t FROM r JOIN e ON r.t = e.s),
            lab AS (SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster
                    FROM r GROUP BY s)"""
  }

  /** No-cap sentinel for the stop-shingle knobs below. */
  val NoDfCap: Long = Long.MaxValue

  /** Drop index entries whose key's document frequency exceeds `maxDf` —
    * the STOP-SHINGLE / hot-fingerprint cap, the real fix for Zipfian
    * boilerplate skew (AQE skew-join only re-splits partitions; a
    * df-10⁶ boilerplate shingle still emits ~10¹² candidate pairs —
    * the cap removes the quadratic term at the source). A shingle with
    * df > cap contributes ≤ 1/(cap choose 2) of any pair's Jaccard
    * evidence per occurrence but cap² join rows, so capping trades a
    * bounded recall sliver for the quadratic hot-bucket cost; capped
    * results on a skew-free corpus are IDENTICAL (spec-pinned).
    * The df lands on each index row as a window count over the key —
    * ONE exchange of the index, no join, and crucially no SECOND
    * evaluation of the index subtree: the r15-original form built the
    * hot list as `ex.groupBy(key)` and anti-joined it back to `ex`,
    * and Spark's self-join attribute dedup broke ReuseExchange, so the
    * index source was computed twice — for m04/m04_px that meant
    * byte-dHashing / pixel-DECODING every payload twice (measured
    * +1.4/+1.7 s at docs16x, removed by this form). The window's
    * hash(key) output partitioning is exactly what the downstream
    * candidate equi-joins need, so the exchange is shared, not added.
    * Shared across the text inverted indexes (d02/d07/d08/d09), the
    * incremental d18 index, and m04/m05's binary indexes — one cap
    * definition, not per-operator copies. */
  private[graft] def dfCapped(ex: DataFrame, key: String, maxDf: Long): DataFrame =
    if (maxDf == NoDfCap) ex
    else ex
      .withColumn("__cap_df", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(col("__cap_df") <= maxDf)
      .drop("__cap_df")

  /** Shared-shingle counts per unordered doc pair (doc_i < doc_j) with
    * both set sizes — the ONE inverted-index candidate join behind
    * jaccard (d02/d07/d08 via [[ngramJaccardPairs]]) and containment
    * (d09) scoring.
    *
    * SHUFFLE_HASH: the planner can't size a Generate's output so it
    * falls back to sort-merge, paying two full sorts of the exploded
    * index; hashing skips them (measured 2.1→1.2 s at sf0.1). The
    * build side is one hash-partition slice of the index (~rows/
    * shuffle.partitions — bounded by partition sizing at any scale);
    * the join OUTPUT, not the build map, is the asymptotic cost, and
    * that is what the LSH/prefix variants and the [[dfCapped]]
    * stop-shingle cap bound. */
  private def sharedShingleCounts(spark: SparkSession, dir: String,
      maxDf: Long = NoDfCap): DataFrame = {
    val ex = dfCapped(shingleIndexRows(Tables.documents(spark, dir)), "h", maxDf)
    ex.as("a").hint("SHUFFLE_HASH").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"),
        col("a.n").as("ni"), col("b.n").as("nj"))
      .agg(count(lit(1)).as("shared"))
  }

  /** d09: shingle CONTAINMENT — the asymmetric near-dup relation
    * C(A→B) = |A∩B| / |A|: a short doc pasted inside a long one scores
    * high containment but low symmetric Jaccard, so d02/d03 miss it —
    * the quote/concatenation contamination case. Same inverted-index
    * candidate join as d02; each unordered pair is scored in BOTH
    * directions and reported per direction over 0.4. */
  def d09Containment(spark: SparkSession, dir: String): DataFrame = {
    val base = sharedShingleCounts(spark, dir)
    val fwd = base.select(col("doc_i").as("contained"), col("doc_j").as("container"),
      (col("shared") / col("ni")).as("c"))
    val bwd = base.select(col("doc_j").as("contained"), col("doc_i").as("container"),
      (col("shared") / col("nj")).as("c"))
    fwd.unionAll(bwd)
      .filter(atLeast(col("c"), 0.4))
      .select(col("contained"), col("container"), round(col("c"), 4).as("containment"))
      .orderBy("contained", "container")
  }

  /** d11 winnowing parameters: window chars `WinnowW`, hash-window
    * `WinnowK`. Guarantee (Schleimer–Wilkerson–Aiken, SIGMOD'03): any
    * substring shared verbatim by two docs of length ≥ W + K − 1 (= 63
    * chars, ~12 words here) produces at least one shared fingerprint —
    * while only ~2/(K+1) of positions are retained. Measured on this
    * corpus: exactly the planted near-dup pairs surface (24 pairs at
    * sf0.01, 245 at sf0.1) and background pairs are ZERO at n_shared ≥ 2
    * — long verbatim runs are a different (and cleaner) signal than
    * d02's bag-of-shingles Jaccard. */
  val WinnowW = 48
  val WinnowK = 16
  val WinnowMinShared = 2L

  /** d11: EXACT-SUBSTRING near-dup pairs via winnowing fingerprints —
    * the "verbatim copied span" detector (the ExactSubstr signal of
    * Lee et al.'s dedup work, realized with MOSS-style winnowing so the
    * index stays ~2/(K+1)-dense instead of per-position). Per doc: hash
    * every W-char window (md5 → 60-bit int, engine-portable), keep each
    * K-window's MINIMUM hash (one ordered window pass, partitioned by
    * doc — bounded state at any doc length), DISTINCT per doc, then the
    * same inverted-index equi-join shape as d02: pairs sharing ≥
    * [[WinnowMinShared]] fingerprints. At 100 TB the index is linear in
    * corpus size × 2/(K+1), the join shuffles by fingerprint, and a
    * globally-hot fingerprint (boilerplate) is the same skew case as a
    * stop-shingle — the `maxDf` overload caps it, AQE skew-join
    * re-splits what remains. */
  def d11WinnowedDup(spark: SparkSession, dir: String): DataFrame =
    d11WinnowedDup(spark, dir, WinnowW, WinnowK, WinnowMinShared)

  def d11WinnowedDup(spark: SparkSession, dir: String, w: Int, k: Int,
      minShared: Long): DataFrame =
    d11WinnowedDup(spark, dir, w, k, minShared, NoDfCap)

  /** `maxDf` caps hot FINGERPRINTS ([[dfCapped]]): a boilerplate
    * paragraph shared by df documents otherwise contributes df²/2
    * candidate pairs per retained fingerprint — the same quadratic
    * skew term as a stop-shingle, with the same fix. */
  def d11WinnowedDup(spark: SparkSession, dir: String, w: Int, k: Int,
      minShared: Long, maxDf: Long): DataFrame = {
    // native codegen'd winnowing (md5 + deque minima + distinct in one
    // compiled pass per doc): ~29 fingerprint rows/doc reach the explode
    // instead of ~250 position rows/doc reaching a window sort — the
    // per-doc selection never shuffles at all (measured 4.2→<1 s at
    // sf0.1; the declarative window pipeline below is the spec-pinned
    // value reference)
    val sel = dfCapped(Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.NativeFunctions.winnowFps(col("text"), w, k)).as("fp")),
      "fp", maxDf)
    sel.as("a").hint("SHUFFLE_HASH").join(sel.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_i", "doc_j")
  }

  /** Declarative winnowing selection — the value reference for
    * [[graft.functions.WinnowUtil.fingerprints]] (NativeExprSpec pins
    * per-doc set equality) and the shape the DuckDB d11 mirror runs. */
  private[graft] def d11SelDeclarative(spark: SparkSession, dir: String,
      w: Int, k: Int): DataFrame = {
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.currentRow, k - 1)
    val pos = Tables.documents(spark, dir)
      .filter(length(col("text")) >= w) // sequence(1, len-w+1) must ascend
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        explode(sequence(lit(1), length(col("text")) - w + 1)).as("i"))
    val hashed = pos.select(col("doc_id"), col("i"), col("len"),
      conv(substring(md5(col("text").substr(col("i"), lit(w))), 1, 15), 16, 10)
        .cast("long").as("hv"))
    hashed
      .withColumn("fp", min(col("hv")).over(win))
      // only FULL k-windows define fingerprints (docs shorter than
      // w+k-1 contribute none — they cannot hold a guaranteed run)
      .filter(col("i") <= col("len") - (w + k) + 2)
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** d17 span length: d11's guarantee threshold W + K − 1 = 63 chars —
    * the two detectors answer the same question ("≥ 63-char verbatim
    * span?") so their split is purely density-vs-exactness. */
  val ExactSpanChars: Int = WinnowW + WinnowK - 1

  /** d17: EXACT-substring near-dup pairs — the Lee et al. 2022
    * ExactSubstr recipe a real pipeline cites, shipped beside d11's
    * winnowed approximation and CHARACTERIZED against it. Per doc:
    * hash EVERY [[ExactSpanChars]]-char window (every position — the
    * same codepoint-aligned md5-60-bit rolling pass as d11, with the
    * winnow selection degenerated to k = 1, so the two detectors share
    * ONE hash definition and one native expression), DISTINCT per doc,
    * then d02's inverted-index equi-join. Two documents pair iff they
    * share at least one 63-char window hash, which holds iff they
    * share a verbatim span ≥ 63 chars — exact in BOTH directions
    * (d11's theorem only guarantees the forward one, and its shipped
    * `minShared = 2` config additionally trades away single-minimal-
    * span detection; DedupSpec measures that boundary on planted
    * 62/63/64-char spans).
    *
    * Cost split at 100 TB: this index is per-POSITION (|doc| rows/doc)
    * where d11's is ~2/(K+1)-dense — ~8× the index rows for exactness;
    * the join is the same fingerprint equi-join, a hot boilerplate
    * span is the same [[dfCapped]] skew case (`maxDf` overload), and
    * reference-shape-wise this is RecordFinderMap.java:50's substring
    * find inverted into an index instead of a per-record scan. */
  def d17ExactSubstring(spark: SparkSession, dir: String): DataFrame =
    d17ExactSubstring(spark, dir, ExactSpanChars, NoDfCap)

  def d17ExactSubstring(spark: SparkSession, dir: String, spanLen: Int,
      maxDf: Long): DataFrame = {
    val sel = dfCapped(Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.NativeFunctions.winnowFps(col("text"), spanLen, 1))
          .as("fp")),
      "fp", maxDf)
    sel.as("a").hint("SHUFFLE_HASH").join(sel.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_i"), col("b.doc_id").as("doc_j"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_i", "doc_j")
  }

  /** d19: duplicated-SPAN extraction — the other half of the Lee et al.
    * 2022 ExactSubstr recipe. d17 answers "which doc PAIRS share a
    * ≥63-char verbatim span"; production dedup does not drop either
    * doc — it CUTS the repeated span and keeps the rest (most docs
    * carrying boilerplate are otherwise unique). This computes the cut
    * list: every maximal character interval whose ≥[[ExactSpanChars]]
    * windows ALL occur elsewhere in the corpus (any other position of
    * any doc, within-doc repeats included), with the corpus-wide FIRST
    * occurrence — min (doc_id, position) per window hash — kept as the
    * canonical copy so exactly one copy of every duplicated string
    * survives the surgery.
    *
    * Shape (and the reason this beats pair-based detectors at 100 TB):
    * strictly LINEAR — no pair join anywhere.
    *   1. occurrence relation (doc_id, i, fp): `posexplode` of the raw
    *      per-position [[graft.functions.NativeFunctions.windowHashes]]
    *      rolling pass (d11/d17's hash, winnowing degenerated away —
    *      surgery needs every position);
    *   2. per-fp df + canonical occurrence in TWO stacked HASH
    *      aggregations — (fp, doc_id) → min position/count, then fp →
    *      df + min doc + `min_by(min_i, doc_id)` (all-long buffers, so
    *      both stages stay in HashAggregate with map-side partials; the
    *      direct `min(struct(doc_id, i))` form is one exchange fewer
    *      but its struct buffer falls back to SortAggregate — a
    *      per-partition SORT of the full position index, the wrong
    *      trade at 100 TB, and the plan pin guards against regressing
    *      to it). Lexicographic canonical = min doc, then min i within
    *      it — exactly the oracle's ORDER BY doc_id, i;
    *   3. join back on fp (each occurrence row meets exactly ONE fp
    *      row — a hot boilerplate fp has huge df but join output stays
    *      |occurrences|: the quadratic d02/d17 pay is structurally
    *      absent, no cap needed); non-canonical occurrences of df ≥ 2
    *      hashes are the marked positions;
    *   4. per-DOC island merge: marked windows [i, i+L−1] chain into
    *      one span while the position gap ≤ L (overlap or adjacency);
    *      the window is partitioned by doc_id — bounded by document
    *      length, the t24/sessionize precedent, never corpus-wide.
    * Emits (doc_id, span_start, span_end, n_windows) per maximal span,
    * 1-based inclusive codepoint offsets; `substring` surgery on the
    * consumer side is a map. A span's windows may have DIFFERENT
    * canonical homes (two boilerplate fragments abutting) — the merge
    * is deliberately per-position, like the reference recipe, so
    * chained duplication cuts as one interval.
    *
    * Cost trade, both directions (the p10 two-pass rule, now a KNOB):
    * the occurrence relation feeds both the stats aggregate and the
    * probe side. At 100 TB the exploded index is ~|chars| rows — the
    * largest relation in the repo — and persisting it to save one
    * columnar re-scan is the wrong trade (`persistOcc = false`, the
    * scale default: two map-side passes, zero storage pressure). At
    * sub-TB scale the re-scan DOMINATES wall time (measured 3.3× the
    * oracle at sf0.1 without the persist, within-bar with it), so the
    * corpus-dir entry auto-persists when the at-rest documents table is
    * under [[D19PersistOccMaxBytes]]. Persist hygiene: Dataset.persist
    * registers in the session CacheManager, which holds the entry
    * STRONGLY until an explicit unpersist (the ContextCleaner never
    * collects CacheManager entries) — so a ONE-SLOT registry
    * ([[d19OccSlot]]) unpersists the previous corpus's index when a
    * different corpus arrives: the pin is bounded to one occ index per
    * session (columnar cache, measured faster here than an RDD-level
    * localCheckpoint), repeated same-corpus calls share the one entry,
    * and same-corpus plan substitution is the intended reuse. Results
    * are identical either way (spec-pinned equality).
    *
    * 60-bit MD5 collisions can mark a position falsely; both engines
    * hash identically so the gate is exact (the d11/d17 rule). */
  def d19DupSpans(spark: SparkSession, dir: String): DataFrame =
    d19DupSpans(spark, dir, ExactSpanChars)

  def d19DupSpans(spark: SparkSession, dir: String, spanLen: Int): DataFrame =
    d19DupSpansOf(Tables.documents(spark, dir), spanLen,
      persistOcc =
        Tables.parquetBytes(spark, dir, "documents") <= D19PersistOccMaxBytes,
      packedCanon =
        Tables.parquetLongColumnRange(spark, dir, "documents", "doc_id")
          .exists { case (lo, hi) => lo >= 0 && hi < (1L << 31) })

  /** Auto-persist bound for d19's occurrence index, in at-rest DOCUMENT
    * bytes (the cheap driver-side signal). Size the bound from the
    * EXPLODED footprint, not the compressed input: parquet text
    * decompresses ~3×, and the index carries ~one 24-byte row per
    * character, so at-rest bytes inflate ~70× by the time they sit in
    * MEMORY_AND_DISK. 512 MiB of parquet ⇒ ~35 GiB cached — a real but
    * reasonable slice of one cluster's storage memory/local disk; the
    * r10 8 GiB default implied a ~560 GiB pin and could exhaust
    * executor local disk. Past the bound the two-pass restream is the
    * documented scale default. */
  val D19PersistOccMaxBytes: Long = 512L << 20

  /** The one persisted occ index the session holds (persist hygiene —
    * see the d19DupSpans doc). */
  private val d19OccSlot =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** The span-extraction core over any (doc_id, text) relation — split
    * out so the p20 release build can run the surgery on its own
    * intermediate corpus, not just the at-rest documents table.
    * `persistOcc` defaults OFF here: an arbitrary input relation has no
    * cheap size signal, and the composed consumers (d20 surgery inside
    * p20's staged build) own their caching decisions.
    *
    * `packedCanon`: when doc_id provably fits 31 bits (parquet FOOTER
    * column stats — the corpus-dir entry checks them, an arbitrary
    * relation defaults to the safe form), the occurrence index itself
    * is packed at the explode — rows are (pk = doc_id << 32 | i, fp),
    * 16 B instead of 24 B through the cache, the stats shuffle and the
    * probe join-back (r13) — and the canonical occurrence is min(pk),
    * lexicographically IDENTICAL to the two-stage form (doc_id owns
    * the high bits; i < 2^32 is structural: a parquet string cell caps
    * at 2^31 bytes) in ONE HashAggregate exchange instead of two
    * (all-long buffer, never SortAggregate). Corpora with wider ids
    * (snowflake keys at 10¹¹ docs) keep the stacked min_by form over
    * (doc_id, i, fp) rows — same result, one more exchange
    * (equality spec-pinned). */
  private[graft] def d19DupSpansOf(docsIn: DataFrame, spanLen: Int,
      persistOcc: Boolean = false, packedCanon: Boolean = false): DataFrame = {
    val exploded = docsIn
      .filter(length(col("text")) >= spanLen)
      .select(col("doc_id"),
        posexplode(graft.functions.NativeFunctions.windowHashes(col("text"), spanLen)))
    // Packed occurrence rows (r12 verdict item 1): when doc_id fits 31
    // bits, pack (doc_id, i) into ONE long at the explode — the index
    // is (pk, fp) = 16 B/row instead of (doc_id, i, fp) = 24 B/row
    // through the persisted cache, the stats shuffle AND the probe
    // join-back; canonicity is min(pk) directly (doc_id owns the high
    // bits, so packed order == (doc_id, i) lexicographic order).
    // The cast is LOAD-BEARING: ShiftLeft keeps its input's type, so an
    // INT32 doc_id (which the footer gate explicitly admits via the
    // Integer stats case) would mask the shift to `<< 0` under Java's
    // 5-bit shift-count rule — pk = doc_id|i for every row and the
    // whole cut list silently wrong. Widen FIRST, then shift.
    val occRaw =
      if (packedCanon)
        exploded.select(
          shiftleft(col("doc_id").cast("long"), 32)
            .bitwiseOR((col("pos") + 1).cast("long")).as("pk"),
          col("col").as("fp"))
      else
        exploded.select(col("doc_id"),
          (col("pos") + 1).cast("long").as("i"), col("col").as("fp"))
    // ONE wire crossing for the occurrence index (r13 — the d19 2× bar):
    // both consumers need occ clustered on fp (the stats aggregate and
    // the probe join), but as separate operators each planned its own
    // Exchange — the corpus-sized index crossed the shuffle TWICE. An
    // explicit repartition(fp) makes the aggregate exchange-free and
    // the join co-partitioned on both sides (stats inherits the
    // partitioning); without the cache the two consumers' identical
    // exchange subplans collapse under ReuseExchange, with it the
    // cached rows are already fp-clustered, so warm passes shuffle
    // NOTHING corpus-sized.
    val occPart = occRaw.repartition(col("fp"))
    val occ = if (!persistOcc) occPart else {
      // same-corpus repeat call: hand back the slot's OWN DataFrame
      // instead of persisting a fresh equal-plan one — the CacheManager
      // would share the entry anyway but logs an "already cached"
      // warning per call (10 of them in the r11 bench tail)
      val prev = d19OccSlot.get()
      // storageLevel consults the CacheManager — a slot survivor whose
      // entry was dropped externally (catalog.clearCache) must re-persist
      if (prev != null &&
          prev.storageLevel != org.apache.spark.storage.StorageLevel.NONE &&
          prev.queryExecution.analyzed.sameResult(occPart.queryExecution.analyzed)) prev
      else {
        val cached = occPart
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // a DIFFERENT corpus's index frees its slot (one occ index per
        // session — persist hygiene, see the d19DupSpans doc). A
        // SAME-plan slot survivor (its entry was dropped externally by
        // catalog.clearCache, which is why we re-persisted) must NOT be
        // unpersisted: Dataset.unpersist uncaches BY PLAN MATCH, so it
        // would remove the entry `cached` just created.
        d19OccSlot.set(cached)
        if (prev != null &&
            !prev.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
          prev.unpersist(false)
        cached
      }
    }
    // hash-build on the stats side (≤ one row per distinct duplicated
    // fp — always the narrower relation; sort-merge would sort the full
    // occurrence index twice for nothing)
    val marked = if (packedCanon) {
      // canonical = min packed occurrence; the non-canonical filter is
      // ONE long compare, and (doc_id, i) unpack happens only on the
      // surviving (duplicated, non-canonical) rows after the join
      val stats = occ.groupBy(col("fp")).agg(
        count(lit(1)).as("df"), min(col("pk")).as("canon"))
      occ.join(stats.filter(col("df") >= 2).hint("SHUFFLE_HASH"), Seq("fp"))
        .filter(col("pk") =!= col("canon"))
        // unpack preserves the SOURCE doc_id type (an INT32 corpus —
        // which the footer gate admits — must not widen to bigint in
        // one plan variant only; the knobs are pinned plan-only)
        .select(shiftright(col("pk"), 32)
          .cast(docsIn.schema("doc_id").dataType).as("doc_id"),
          col("pk").bitwiseAND(lit((1L << 32) - 1)).as("i"))
    } else {
      val stats = occ.groupBy(col("fp"), col("doc_id"))
        .agg(min(col("i")).as("min_i"), count(lit(1)).as("cnt"))
        .groupBy(col("fp")).agg(
          sum(col("cnt")).as("df"),
          min(col("doc_id")).as("canon_doc"),
          min_by(col("min_i"), col("doc_id")).as("canon_i"))
      occ.join(stats.filter(col("df") >= 2).hint("SHUFFLE_HASH"), Seq("fp"))
        .filter(!(col("doc_id") === col("canon_doc") && col("i") === col("canon_i")))
        .select(col("doc_id"), col("i"))
    }
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    marked
      .withColumn("prev", lag(col("i"), 1).over(byDoc))
      .withColumn("isl", sum(
        when(col("prev").isNull || col("i") - col("prev") > spanLen, 1L)
          .otherwise(0L)).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("i")).as("span_start"),
        (max(col("i")) + spanLen - 1).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  /** d20: span surgery ACCOUNTING — d19's cut list folded back onto the
    * corpus: per source, docs touched, spans cut, characters removed
    * against the total — the release-build report that says what the
    * surgery would do before anyone runs it (and the integer summary
    * the run itself ships). All-integer and derivable from (documents ⟕
    * d19) alone, so the whole d19 pipeline INCLUDING the island merge
    * lands under the hash gate a second way. One extra broadcast-free
    * left join + a ≤|sources| rollup on top of d19's linear plan. */
  def d20SpanSurgery(spark: SparkSession, dir: String): DataFrame =
    d20SurgeryReport(Tables.documents(spark, dir), d19DupSpans(spark, dir))

  /** The surgery report over any (doc_id, source, text) relation — the
    * p21 release datasheet runs it on the RELEASED corpus (post-surgery
    * residue: splice adjacencies, the Lee-et-al fixpoint caveat). */
  private[graft] def d20SpanSurgeryOf(docsIn: DataFrame): DataFrame =
    d20SurgeryReport(docsIn,
      d19DupSpansOf(docsIn.select(col("doc_id"), col("text")), ExactSpanChars))

  private def d20SurgeryReport(docsIn: DataFrame, spans: DataFrame): DataFrame = {
    val cut = spans.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_spans"),
      sum(col("span_end") - col("span_start") + 1).as("chars_cut"))
    docsIn
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("len"))
      .join(cut, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_spans").isNotNull, 1L).otherwise(0L)).as("docs_affected"),
        coalesce(sum(col("n_spans")), lit(0L)).as("spans_cut"),
        coalesce(sum(col("chars_cut")), lit(0L)).as("chars_removed"),
        sum(col("len")).as("chars_total"))
      .orderBy("source")
  }

  /** The surgery EXECUTED: the corpus with every d19 span excised —
    * what a release build writes beside the [[d20SpanSurgery]] report.
    * Per doc, the kept segments are the complement of the (disjoint,
    * sorted) span intervals — `[1, s₁−1], [e₁+1, s₂−1], …, [e_N+1,
    * len]` — spliced back in position order: one collect_list per doc
    * (bounded by the doc's own span count), one zip_with/substr pass,
    * no shuffle beyond the span rollup. Exactly one copy of every
    * duplicated string survives (the canonical occurrence is never
    * marked); the splice can create NEW adjacencies across a cut — the
    * reference recipe (Lee et al. 2022) accepts this, and re-running
    * the detector on the output converges (spec-pinned on the planted
    * fixture). */
  def d20CleanedCorpus(spark: SparkSession, dir: String): DataFrame =
    d20CleanedCorpusOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text")))

  /** The surgery core over any (doc_id, lang, source, text) relation —
    * d19's cut list computed on THAT relation and excised (p20's rule:
    * the release build runs surgery on its post-dedup corpus). Lineage
    * honesty: the input plan feeds both the span extraction and the
    * splice join, so it executes twice — p10's documented two-pass
    * trade (never cache a corpus-sized relation to save a scan). */
  private[graft] def d20CleanedCorpusOf(docsIn: DataFrame): DataFrame = {
    val spanArr = d19DupSpansOf(docsIn, ExactSpanChars)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(
        struct(col("span_start"), col("span_end")))).as("sp"))
    docsIn
      .join(spanArr, Seq("doc_id"), "left")
      .withColumn("cleaned", when(col("sp").isNull, col("text")).otherwise(
        array_join(zip_with(
          concat(array(lit(1L)),
            transform(col("sp"), s => s.getField("span_end") + 1)),
          concat(transform(col("sp"), s => s.getField("span_start") - 1),
            array(length(col("text")).cast("long"))),
          (s, e) => when(e >= s,
            col("text").substr(s.cast("int"), (e - s + 1).cast("int")))
            .otherwise(lit(""))), "")))
      .select(col("doc_id"), col("lang"), col("source"),
        col("cleaned").as("text"))
  }

  /** d21: quality-aware CANONICAL selection — which member of each
    * near-dup cluster the release KEEPS. d07 names the clusters;
    * p03/p10 keep a hash- or id-ordered representative; a production
    * release keeps the BEST one (Gopher/RefinedWeb keep the
    * highest-quality member so dedup never trades a clean original for
    * its mangled scrape). Per d07 cluster: size, the canonical doc =
    * argmax of an all-integer quality score (stopword-density ppm —
    * the t02/p03 signal reduced to integer arithmetic so the gate has
    * no float boundary), ties broken to the SMALLEST doc_id, and the
    * canonical's score.
    *
    * Shape at 100 TB: d07's pointer-jumping labels (O(log d) rounds,
    * linear shuffles), one map-side score pass over documents, an
    * id-keyed join, and a per-cluster aggregate whose buffer is one
    * (score, -id) struct max — no window, no sort, partial-aggregable.
    * Fully hash-gated (the oracle replays the same clusters through
    * d07's recursive CTE and picks by ROW_NUMBER over the same
    * (score DESC, doc_id ASC) order). */
  def d21QualityCanonical(spark: SparkSession, dir: String): DataFrame = {
    val (labels, _) = connectedComponents(spark,
      ngramJaccardPairs(spark, dir).select(col("doc_i"), col("doc_j")), None)
    val q = Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        TF.stopwordHits(col("toks")).cast("long").as("sw"),
        size(col("toks")).cast("long").as("n_tok"))
      .withColumn("q_ppm", expr("(sw * 1000000) div n_tok"))
      .select(col("doc_id"), col("q_ppm"))
    d21Pick(labels, q, "q_ppm", "canonical_q_ppm")
  }

  /** The shared argmax tail: per cluster, the member maximizing the
    * score column (ties → smallest doc_id) via one partial-aggregable
    * (score, −id) struct-max buffer — no window, no sort. */
  private def d21Pick(labels: DataFrame, scored: DataFrame,
      scoreCol: String, outCol: String): DataFrame =
    labels.join(scored, Seq("doc_id"))
      .groupBy(col("cluster").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        // lexicographic struct max = max score, then max(-id) = MIN id:
        // one partial-aggregable buffer instead of a per-cluster window
        max(struct(col(scoreCol), (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("cluster_id"), col("n_docs"),
        (-col("m.neg_id")).as("canonical_doc"),
        col(s"m.$scoreCol").as(outCol))
      .orderBy("cluster_id")

  /** d21b: d21's PRODUCTION wiring — the canonical pick scored by the
    * TRAINED quality classifier (t28's exported quantized table,
    * exactly what DEPLOY.md's d21 row tells a real release to swap in)
    * instead of the stopword-density stand-in. Same clusters, same
    * partial-aggregable argmax tail ([[d21Pick]] — the two variants
    * cannot disagree on tie semantics), integer `score_q` from the
    * broadcast weight join. Rows-only: the trained weights ride the
    * distributed LR fit (t28's rule); the spec pins cluster structure
    * ≡ d21's and the pick ≡ a driver argmax over the spec-pinned
    * scores. */
  def d21bTrainedCanonical(spark: SparkSession, dir: String): DataFrame = {
    val (labels, _) = connectedComponents(spark,
      ngramJaccardPairs(spark, dir).select(col("doc_i"), col("doc_j")), None)
    val (weights, interceptQ) =
      TextAnalysis.t28ExportWeights(spark, dir)
    val scored = TextAnalysis.quantizedDocScores(
        Tables.documents(spark, dir), weights, interceptQ, carry = Nil)
      .select(col("doc_id"), col("score_q"))
    d21Pick(labels, scored, "score_q", "canonical_score_q")
  }

  /** Which documents play the NEW-batch role in the gated d18 entry:
    * doc_id % [[IncrementalNewMod]] == [[IncrementalNewRem]] (~20% of
    * the corpus); the rest are the already-indexed base corpus. */
  val IncrementalNewMod = 5L
  val IncrementalNewRem = 3L

  /** The exploded (doc_id, n, h) inverted shingle index over an
    * arbitrary `doc_id`+`text` relation — the ONE definition of the
    * index projection: [[sharedShingleCounts]] (d02/d07/d08/d09), the
    * PPJoin prefix variant, and the at-rest artifact [[d18BuildIndex]]
    * persists all consume it, so no path can drift structurally from
    * what the others compute. */
  private[graft] def shingleIndexRows(docs: DataFrame): DataFrame =
    shingleSets(docs)
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))

  /** Write the base corpus's shingle index to `path` — the nightly
    * dedup's at-rest artifact: built ONCE per corpus release, it spares
    * every subsequent batch both the re-tokenization of the base corpus
    * and (the asymptotic point) the old×old half of the pair join. On a
    * cluster with a catalog, write it bucketed by `h` instead: the
    * nightly probe join then shuffles only the arrivals. */
  def d18BuildIndex(docs: DataFrame, path: String): Unit =
    d18BuildIndex(docs, path, NoDfCap)

  /** Build-time stop-shingle cap — the RELEASE-scoped form of the
    * nightly `maxDf` knob: shingles whose base df exceeds `maxDf`
    * never enter the at-rest index, so every subsequent night probes
    * uncapped with ZERO extra df passes (the per-night [[dfCapped]]
    * knob on [[d18FromIndex]] re-scans the index each night to
    * aggregate df). The cap basis is the release's df: absorbed
    * batches append raw rows and are not re-capped — a shingle that
    * goes hot only across many absorbed batches waits for the next
    * release rebuild, which applies a fresh cap (batch-internal hot
    * pairs are bounded by the batch size, not corpus history). The
    * written artifact physically lacks hot keys (spec-pinned), and a
    * non-biting cap writes a byte-identical index. */
  def d18BuildIndex(docs: DataFrame, path: String, maxDf: Long): Unit =
    dfCapped(shingleIndexRows(docs), "h", maxDf)
      .write.mode("overwrite").parquet(path)

  /** The BUCKETED at-rest option (r13 — DEPLOY's "on a cluster with a
    * catalog, write it bucketed by `h`" guidance, shipped): the same
    * release-capped index written `bucketBy(nBuckets, "h")` as an
    * external catalog table at `path`. The probe join against a
    * bucketed base ([[d18FromIndexBucketed]]) then satisfies its
    * clustering from the BUCKET LAYOUT — the history-sized index side
    * is read without an Exchange (plan-pinned), so the only per-night
    * work that grows with history is the raw page read, not
    * read + shuffle-write + shuffle-read. Choose `nBuckets` ≈ the
    * cluster's target shuffle parallelism; the cap semantics are
    * BUILD-time ([[d18BuildIndex]]'s `maxDf` overload) — the union-df
    * nightly cap needs the flat path's one-relation df pass. */
  def d18BuildIndexBucketed(docs: DataFrame, table: String, path: String,
      nBuckets: Int, maxDf: Long = NoDfCap): Unit =
    dfCapped(shingleIndexRows(docs), "h", maxDf)
      // align write tasks with buckets: repartition's HashPartitioning
      // and the bucket id are the same murmur3-pmod of h, so each task
      // holds exactly one bucket's rows → ONE file per bucket instead
      // of tasks × buckets small files (the at-rest layout a reader
      // actually wants; bucketed scans can't coalesce splits, so file
      // count is read parallelism overhead, not just metadata)
      .repartition(nBuckets, col("h"))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, "h")
      .saveAsTable(table)

  /** [[d18FromIndex]] against a BUCKETED base table: the new×old join
    * runs directly against the catalog table (bucket layout supplies
    * the index side's clustering — only the batch shuffles), the
    * new×new join is batch-internal, and both feed the ONE
    * [[d18PairScore]] scoring tail — result-identical to the flat
    * probe (spec-pinned). `batchMaxDf` is the batch-local cap exactly
    * as on the flat form; the union-df `maxDf` knob is deliberately
    * absent (it requires a df pass over base ∪ batch as one relation,
    * which re-shuffles the index and forfeits the bucket win — cap at
    * build time instead, the DEPLOY-documented pairing). */
  def d18FromIndexBucketed(spark: SparkSession, table: String,
      newDocs: DataFrame, batchMaxDf: Long = NoDfCap): DataFrame = {
    val base = spark.table(table)
    val exNew = shingleIndexRows(newDocs)
    val oldHits = exNew.as("a").hint("SHUFFLE_HASH")
      .join(base.as("b"), col("a.h") === col("b.h"))
      .select(col("a.doc_id").as("di"), col("b.doc_id").as("dj"),
        col("a.n").as("ni"), col("b.n").as("nj"))
    val newHits = exNew.as("a").hint("SHUFFLE_HASH")
      .join(dfCapped(exNew, "h", batchMaxDf).as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("di"), col("b.doc_id").as("dj"),
        col("a.n").as("ni"), col("b.n").as("nj"))
    present18(d18PairScore(oldHits.unionByName(newHits)))
  }

  /** INCREMENTAL near-dup pairs: arrivals against (base index ∪
    * arrivals) in ONE equi-join on the shingle hash — new×old and
    * new×new candidates, never old×old. The base side carries an
    * `is_new` tag so new×new pairs keep d02's `doc_id <` dedup while
    * every new×old pair survives exactly once (the arrival is always
    * the probe row). Contract: arrival doc_ids are disjoint from the
    * base corpus (a re-crawled id belongs in a base-index rebuild, not
    * the batch). The [[dfCapped]] stop-shingle cap runs on the build
    * side only — a hot shingle's probe rows then find zero partners,
    * which is result-identical to d02's both-side cap (spec-pinned)
    * without a second df pass over the arrivals.
    *
    * Cost honesty (the p10/p13 documented-two-pass discipline): the
    * batch's tokenize+shingle lineage executes twice (probe side and
    * union build side) — map-side work over the BATCH, deliberately
    * recomputed rather than checkpointed because the exploded index is
    * ~an order of magnitude larger than the batch text it derives
    * from. With `maxDf` set, [[dfCapped]]'s window lands the union df
    * in the same single pass over (base index ∪ batch) — one exchange,
    * no second history scan (r15; the old groupBy+anti-join form
    * re-read the index for the df pass, the cost this paragraph used
    * to document), no join blowup. A nightly that must avoid even that
    * one union exchange should cap at BUILD time instead — the
    * `d18BuildIndex(docs, path, maxDf)` overload: hot shingles never
    * enter the artifact, zero nightly df passes, cap as-of-release.
    *
    * `batchMaxDf` is the BATCH-LOCAL stop-shingle cap — the missing
    * half of the build-time cap (measured in DEPLOY.md's skew table):
    * a release-capped index bounds new×old hot pairs, but boilerplate
    * carried by the ARRIVALS themselves still unions into the build
    * side and explodes new×new pairs quadratically in the batch. This
    * knob aggregates df over the batch's shingles ALONE (one cheap
    * pass over the arrivals, never a scan of the at-rest index) and
    * drops batch-hot shingles from the batch's BUILD-side rows only —
    * new×new pairs lose that shingle's evidence while the probe side
    * stays uncapped, so new×old evidence against index entries that
    * survived the release cap is preserved (a shingle hot in tonight's
    * crawl but organic in the corpus keeps its old-doc matches).
    * Composed with `d18BuildIndex(_, _, cap)` this is the nightly that
    * is strictly constant-in-history AND immune to a boilerplate-heavy
    * batch; on a corpus whose hot shingles bite each side's cap
    * separately it equals the union-df `maxDf` nightly (spec-pinned
    * with the no-straddler precondition asserted). The two knobs are
    * alternatives, not a pipeline: if both are set, `maxDf`'s union df
    * is aggregated over the ALREADY batch-capped union — a batch-hot
    * shingle's df contribution is gone before the union cap looks. */
  private[graft] def incrementalPairs(baseIndex: DataFrame, newDocs: DataFrame,
      maxDf: Long, batchMaxDf: Long = NoDfCap): DataFrame = {
    val exNew = shingleIndexRows(newDocs)
    val rhs = dfCapped(
      baseIndex.withColumn("is_new", lit(false))
        .unionByName(dfCapped(exNew, "h", batchMaxDf)
          .withColumn("is_new", lit(true))),
      "h", maxDf)
    d18PairScore(exNew.as("a").hint("SHUFFLE_HASH").join(rhs.as("b"),
        col("a.h") === col("b.h") &&
          (!col("b.is_new") || col("a.doc_id") < col("b.doc_id")))
      .select(col("a.doc_id").as("di"), col("b.doc_id").as("dj"),
        col("a.n").as("ni"), col("b.n").as("nj")))
  }

  /** d18's scoring tail over candidate hit rows (di, dj, ni, nj — one
    * row per shared shingle occurrence pair): shared count → jaccard →
    * threshold → canonical (doc_i < doc_j) projection. Factored (r13)
    * so the flat-union probe and the bucketed-table probe share ONE
    * scoring definition and cannot drift. */
  private def d18PairScore(hits: DataFrame): DataFrame = hits
    .groupBy(col("di"), col("dj"), col("ni"), col("nj"))
    .agg(count(lit(1)).as("shared"))
    .withColumn("jaccard",
      col("shared") / (col("ni") + col("nj") - col("shared")))
    .filter(atLeast(col("jaccard"), 0.2))
    .select(least(col("di"), col("dj")).as("doc_i"),
      greatest(col("di"), col("dj")).as("doc_j"), col("jaccard"))

  /** d18: incremental near-dup — the production NIGHTLY shape d02
    * cannot serve at 100 TB: when a new snapshot lands, the base corpus
    * is already deduped and already indexed, so the only pairs worth
    * computing are new×old and new×new. d02 re-pays the old×old join
    * every run (quadratic in corpus history); d18's cost is
    * |batch shingles| probe rows against the persisted index — linear
    * in the BATCH, constant in how many snapshots preceded it. Result
    * ⊆ d02: exactly d02's pairs that touch a new doc (spec-pinned both
    * as the set equality and through the DuckDB gate, whose oracle is
    * d02's with the touch-a-new-doc restriction). The gated form
    * derives the base index inline from the same corpus (old =
    * doc_id % 5 ≠ 3) so the gate exercises the identical join; the
    * production overload reads the at-rest index. */
  def d18IncrementalNeardup(spark: SparkSession, dir: String): DataFrame =
    d18IncrementalNeardup(spark, dir, NoDfCap)

  def d18IncrementalNeardup(spark: SparkSession, dir: String,
      maxDf: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew =
      col("doc_id") % lit(IncrementalNewMod) === lit(IncrementalNewRem)
    present18(incrementalPairs(
      shingleIndexRows(docs.filter(!isNew)), docs.filter(isNew), maxDf))
  }

  /** Production form: pair `newDocs` against the at-rest index written
    * by [[d18BuildIndex]].
    *
    * A violated disjointness contract (a re-crawled doc_id present in
    * both the index and the batch) is DETECTABLE in the output: the
    * stale index copy partners its own probe rows, emitting a
    * `doc_i == doc_j` row — a shape d02 can never produce (its
    * residual is strict `<`). Alert on self-pairs rather than
    * filtering them: the same breach also mixes the stale text into
    * that id's cross-pairs, so the run needs a rebuild, not a patch
    * (spec-pinned with a planted re-crawl).
    *
    * `maxDf` re-aggregates df over index ∪ batch each night (IO-linear
    * in history); `batchMaxDf` caps over the batch alone — pair it
    * with a build-capped index for the strictly-constant-in-history
    * nightly that survives boilerplate-carrying batches (see
    * [[incrementalPairs]] for the exact one-sided semantics). */
  def d18FromIndex(spark: SparkSession, indexPath: String,
      newDocs: DataFrame, maxDf: Long = NoDfCap,
      batchMaxDf: Long = NoDfCap): DataFrame =
    d18FromIndex(spark.read.parquet(indexPath), newDocs, maxDf, batchMaxDf)

  /** DataFrame-index form of [[d18FromIndex]] — for callers whose
    * at-rest index is not one flat parquet path: a catalog-bucketed
    * table (the [[d18BuildIndex]] doc's at-scale layout) or a union of
    * committed per-batch generation dirs (stream_incdedup's
    * replay-idempotent layout). Same join, same caps, same contract —
    * the path overload delegates here. */
  def d18FromIndex(index: DataFrame, newDocs: DataFrame, maxDf: Long,
      batchMaxDf: Long): DataFrame =
    present18(incrementalPairs(index, newDocs, maxDf, batchMaxDf))

  /** Absorb a probed batch into the at-rest index: append the batch's
    * shingle rows so the NEXT nightly probes against base ∪ batch —
    * the build→probe→absorb cycle that keeps every night linear in its
    * own batch forever (the index grows by exactly the batch; nothing
    * is ever recomputed). Plain parquet append is sound because
    * arrival doc_ids are disjoint from everything already absorbed
    * ([[d18FromIndex]]'s contract) and the index rows are per-doc
    * facts — no merge, no rewrite. Call AFTER the batch's probe ran:
    * absorbing first would make the probe see the batch on both sides
    * — each new×new pair's shared count doubles (the index copy and
    * the arrivals copy both match) and the unordered index copy adds
    * a mirrored (j,i) row, so the batch's jaccards corrupt, not just
    * duplicate. Chain-completeness is spec-pinned: base-internal ∪
    * probe(b1) ∪ probe(b2 after absorbing b1) is a DISJOINT partition
    * of d02's full pair set. The tiling claim is CAP-OFF: with `maxDf`
    * set, each night's df is computed over the index as of that night,
    * so a shingle that crosses the cap only after later batches arrive
    * keeps its earlier nights' pairs — the capped chain is the union
    * of per-night capped answers, not a capped d02 over the final
    * corpus (re-run [[d18BuildIndex]] if the release needs the
    * as-of-now capped answer). */
  def d18AbsorbBatch(newDocs: DataFrame, path: String): Unit =
    d18AbsorbBatch(newDocs, path, NoDfCap)

  /** Capped absorb — the build-cap discipline carried through the
    * absorb cycle: without it, a build-capped index regrows hot keys
    * from every absorbed boilerplate batch and the nightly's df²
    * protection decays until the next release rebuild. `batchMaxDf`'s
    * df basis is the BATCH alone (matching [[d18FromIndex]]'s
    * batch-local cap — one cheap pass over the arrivals, zero scans of
    * the at-rest index), so batch-hot shingles never enter the
    * artifact; like the build cap, capping only removes evidence, and
    * a shingle that goes hot only ACROSS absorbed batches still waits
    * for the release rebuild (per-batch df never sees it). Spec-pinned:
    * the capped chain's artifact physically lacks hot keys, absorbed
    * organic evidence still serves the next night's cross-batch pairs,
    * and a non-biting cap appends row-identical data. */
  def d18AbsorbBatch(newDocs: DataFrame, path: String,
      batchMaxDf: Long): Unit =
    dfCapped(shingleIndexRows(newDocs), "h", batchMaxDf)
      .write.mode("append").parquet(path)

  private def present18(pairs: DataFrame): DataFrame =
    pairs
      .select(col("doc_i"), col("doc_j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_i", "doc_j")

  /** d12: SemDeDup-style semantic dedup decision over d05's BANDED
    * candidates — the hash-gated form (the sign-LSH signature is
    * explicit integer math, so DuckDB reproduces the full drop set).
    * The distributed-safe keep rule is "drop a vector iff it is
    * cosine-near some LOWER-id vector among the candidates": order by
    * id is deterministic on every engine and the rule is a pure
    * anti-join — the sequential greedy scan SemDeDup describes cannot
    * be parallelized, and this monotone over-approximation (a dropped
    * vector's witness may itself be dropped) is the standard
    * distributed substitute — at worst it over-drops within a clique,
    * never under-drops. [[d12bSemDedupIvf]] is the paper-shaped sibling
    * (cluster-first candidates from the persisted IVF index); the two
    * candidate generators are DIFFERENT samplers of the same exact
    * cosine rule — each misses pairs the other catches (measured at
    * every test SF; DedupSpec pins the exact characterization), so they
    * are shipped as two operators, not silently swapped. */
  def d12SemDedup(spark: SparkSession, dir: String): DataFrame =
    d12Rollup(spark, dir, d12DropsBands(spark, dir))

  /** d12b: SemDeDup with candidates generated the way the PAPER does it
    * (Abbas et al. 2023 §3: cluster the embedding space, compare only
    * within a cluster) — within-list pairs of the persisted s03 IVF
    * index, the same build-once-serve-many table similarity search
    * reads. Same keep/drop rule and rollup as d12. Rows-only in the
    * gate (the clustering is a k-means fit, s03's rule); the spec pins
    * the drop set as SOUND (every drop has a real cosine ≥ 0.35
    * lower-id witness — a subset of the exact all-pairs rule) and pins
    * the band/list divergence exactly: a band-only drop's witnesses all
    * straddle list boundaries, never a verify disagreement. */
  def d12bSemDedupIvf(spark: SparkSession, dir: String): DataFrame =
    d12Rollup(spark, dir, d12DropsIvf(spark, dir))

  /** The published SemDeDup candidate stage: CLUSTER FIRST, pairs only
    * within a cluster (Abbas et al. 2023 §3 — k-means clusters, not
    * hash bands). Candidates come from the PERSISTED s03 IVF index's
    * assigned table — build-once-serve-many, and the same clustered
    * layout similarity search serves from — via a (label, list_id)
    * equi-join; the exact cosine ≥ 0.35 verify runs on within-list
    * members only. Shape at 100 TB: the assigned table is already
    * clustered by list at rest, the label tag rides a vec_id equi-join,
    * and the pair join shuffles by (label, list_id) — per-list work,
    * never all-pairs (nLists ≈ √n keeps lists bounded; a hot list —
    * k-means concentrating near-dup mass into one cluster — is
    * sub-bucketed by [[D12bMaxList]] so its pair cost is linear in
    * population, never |list|²). */
  /** Hot-list population cap for [[d12IvfPairs]] — d02's `maxDf` story
    * wired for the IVF candidate stage: k-means over a redundancy-heavy
    * corpus (exactly SemDeDup's target input) can concentrate
    * near-duplicate mass into ONE list, and the within-list self-join
    * then pays |list|². Groups over the cap are SUB-BUCKETED by a
    * deterministic hash of vec_id into ⌈pop/cap⌉ buckets before
    * pairing, so the per-group join cost drops from pop² to
    * ≤ pop·cap — linear in the hot list's population. Unlike d02's
    * drop-the-key cap, sub-bucketing KEEPS within-bucket pairs (a hot
    * list is where SemDeDup's signal lives); the price is the
    * cross-bucket pairs — a bounded recall split of the candidate
    * SAMPLER (d12b is already characterized as one sampler of the
    * exact rule), spec-pinned under a planted mega-cluster. Under-cap
    * groups get a single bucket, so the capped plan is
    * result-identical on a skew-free corpus (spec-pinned). */
  val D12bMaxList: Long = 1024L

  /** d12b's list count is deliberately NOT footer-auto-sized (unlike
    * every retrieval-side IVF default — r12's autoNLists): SemDeDup's
    * candidate generator pairs WITHIN lists only, so nLists here is a
    * cluster GRANULARITY decision — recall of the exact cosine rule
    * falls as lists multiply (boundary-straddling near-dup pairs are
    * the loss, measured: 75-92% at 16 lists vs ~50% at ⌈√n⌉ = 23 on
    * the test corpus), while the retrieval paths recover boundary loss
    * with nProbe. Production sizes this by target cluster population
    * (n / desired docs-per-cluster — the SemDeDup paper's knob), a
    * semantic choice no footer can make. */
  val D12bLists: Int = 16

  /** d12b's verified within-list candidate pairs (label, vec_i, vec_j)
    * — exposed so the spec can characterize them against the exact
    * all-pairs rule. */
  private[graft] def d12IvfPairs(spark: SparkSession, dir: String,
      nLists: Int = D12bLists, maxList: Long = D12bMaxList): DataFrame = {
    val (assigned, _) = Similarity.s03Index(spark, dir, nLists)
    val d0 = assigned
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("label")),
        Seq("vec_id"))
    // per-(label, list) population: ≤ |labels|·nLists rows — broadcast
    // back; one linear partial-agg pass over the assigned table
    val pops = d0.groupBy(col("label"), col("list_id"))
      .agg(count(lit(1)).as("pop"))
      .withColumn("n_sub",
        greatest(lit(1L), ceil(col("pop").cast("double") / lit(maxList)).cast("long")))
      .select(col("label"), col("list_id"), col("n_sub"))
    val d = d0.join(broadcast(pops), Seq("label", "list_id"))
      .withColumn("sub", pmod(xxhash64(col("vec_id")), col("n_sub")))
    d.select(col("label"), col("list_id"), col("sub"),
        col("vec_id").as("vec_i"), col("embedding").as("va"))
      .join(d.select(col("label"), col("list_id"), col("sub"),
        col("vec_id").as("vec_j"), col("embedding").as("vb")),
        Seq("label", "list_id", "sub"))
      .filter(col("vec_i") < col("vec_j"))
      .filter(atLeast(VF.cosine(col("va"), col("vb")), 0.35))
      .select(col("label"), col("vec_i"), col("vec_j"))
  }

  private[graft] def d12DropsIvf(spark: SparkSession, dir: String,
      nLists: Int = D12bLists): DataFrame =
    d12IvfPairs(spark, dir, nLists)
      .select(col("label"), col("vec_j").as("vec_id")).distinct()

  /** The band-candidate drop set (d05's sign-LSH verified pairs) — the
    * hash-gated d12 form. */
  private[graft] def d12DropsBands(spark: SparkSession, dir: String): DataFrame =
    d05EmbeddingDup(spark, dir)
      .select(col("label"), col("vec_j").as("vec_id")).distinct()

  private def d12Rollup(spark: SparkSession, dir: String,
      drops: DataFrame): DataFrame =
    Tables.embeddings(spark, dir).select(col("label"), col("vec_id"))
      .join(drops.withColumn("is_drop", lit(1L)), Seq("label", "vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("is_drop"), lit(0L))).as("n_dropped"))
      .withColumn("n_kept", col("n_vecs") - col("n_dropped"))
      .orderBy("label")

  /** d15 chunking width: 50 tokens ≈ 5 of t20's 10-token lines — a
    * paragraph, the granularity RefinedWeb/CCNet dedup actually operates
    * at (t20 catches single repeated LINES, d02 whole near-dup DOCS;
    * license blurbs / disclaimer paragraphs sit between the two). */
  val ParagraphTokens = 50

  /** Cross-doc boilerplate paragraphs d15 plants (t10/t20 precedent: the
    * synthetic corpus has no natural shared paragraphs beyond its exact
    * dups, so plant deterministically from doc_id, then MEASURE). */
  val PlantedParagraphs: Seq[String] = Seq(
    "this article is distributed under the terms of the creative commons " +
      "attribution license which permits unrestricted use distribution and " +
      "reproduction in any medium provided the original work is properly cited",
    "the views and opinions expressed in this article are those of the " +
      "authors and do not necessarily reflect the official policy or " +
      "position of the publisher or its affiliates")

  /** The (doc_id, source, fp) paragraph-fingerprint relation behind d15 —
    * exposed so the spec recomputes the rollup from the same rows. */
  private[graft] def d15ParagraphFps(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val paras0 = transform(
      sequence(lit(1L), TF.chunkCount(col("toks"), ParagraphTokens)),
      j => TF.tokenChunk(col("toks"), j, ParagraphTokens))
    val empty = array().cast("array<string>")
    val parasCol = concat(
      when(pmod(id, lit(5)) === 0, array(lit(PlantedParagraphs(0)))).otherwise(empty),
      paras0,
      when(pmod(id, lit(11)) === 0, array(lit(PlantedParagraphs(1)))).otherwise(empty))
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
      .select(id, col("source"), explode(parasCol).as("para"))
      .select(id, col("source"), md5(col("para")).as("fp"))
  }

  /** d15: PARAGRAPH-level near-dedup — strip paragraphs that repeat
    * across documents, keeping the occurrence in the lowest doc_id (the
    * canonical-pick rule d01 uses for whole docs). Documents chunk into
    * [[ParagraphTokens]]-token paragraphs (t20's 10-token lines scaled
    * up — the SAME chunking arithmetic, `TF.chunkCount`/`tokenChunk`);
    * the fingerprint is portable md5 of the joined text. Removal rule:
    * an occurrence is dropped iff its doc_id exceeds the fingerprint's
    * minimum doc_id — nd == 1 paragraphs keep themselves for free, and
    * exact-dup documents (which share EVERY paragraph) lose all copies
    * but the canonical doc's. Per-source audit: docs, paragraphs,
    * removed occurrences, affected docs — all integers.
    *
    * Shape at 100 TB: chunking + fingerprint are map-side; the
    * canonical-doc table is ONE partial-aggregable min() shuffle on the
    * 128-bit fp; the removal decision is an fp equi-join (AQE skew-join
    * + the d02 maxDf cap idea cover a pathologically hot license blurb);
    * the two rollups partial-aggregate. No window, no driver state. */
  def d15ParagraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val paras = d15ParagraphFps(spark, dir)
    val canon = paras.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_doc"))
    val perDoc = paras.join(canon, "fp")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("pt"),
        sum(when(col("doc_id") > col("keep_doc"), 1L).otherwise(0L)).as("pr"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pt")).as("paras_total"),
        sum(col("pr")).as("paras_removed"),
        sum(when(col("pr") > 0, 1L).otherwise(0L)).as("docs_affected"))
      .orderBy("source")
  }

  val oracle: Map[String, String] = {
    val toks = TS.toks
    val sh = TS.shingleHashes(toks)
    val sigSql = minhashA.zip(minhashB).map { case (a, b) =>
      s"list_min(list_transform(sh, s -> (s*$a + $b) % $P))"
    }.mkString("[", ",\n              ", "]")
    Map(
      "d16_benchmark_decontam" ->
        s"""WITH base AS (
              SELECT doc_id, $toks AS toks FROM documents
              WHERE doc_id % 17 = 0 AND len($toks) >= 5),
            bench AS (
              SELECT doc_id AS bench_id,
                array_to_string(
                  toks[1 : CAST(greatest(3, (len(toks)*3)//5) AS INT)], ' ')
                  AS text
              FROM base
              UNION ALL
              SELECT -doc_id - 1,
                array_to_string(list_transform(generate_series(1, 8),
                  j -> 'xbench' || CAST(doc_id AS VARCHAR)
                    || 'q' || CAST(j AS VARCHAR)), ' ')
              FROM base),
            corpus AS (
              SELECT DISTINCT unnest($sh) AS h
              FROM documents WHERE len($toks) >= 3),
            b AS (
              SELECT bench_id, $sh AS sh FROM bench WHERE len($toks) >= 3),
            e AS (
              SELECT bench_id, CAST(len(sh) AS BIGINT) AS n_shingles,
                unnest(sh) AS h
              FROM b),
            s AS (
              SELECT bench_id, n_shingles, COUNT(*) AS n_leaked
              FROM e WHERE h IN (SELECT h FROM corpus)
              GROUP BY 1, 2)
            SELECT bench_id, n_shingles,
              CAST(n_leaked AS BIGINT) AS n_leaked,
              ROUND(n_leaked / CAST(n_shingles AS DOUBLE), 4) AS contamination
            FROM s
            WHERE n_leaked / CAST(n_shingles AS DOUBLE) >= 0.3
            ORDER BY bench_id""",
      "d15_paragraph_dedup" ->
        s"""WITH d AS (
              SELECT doc_id, source, $toks AS toks
              FROM documents WHERE len(trim(text)) > 0),
            p0 AS (
              SELECT doc_id, source,
                (CASE WHEN doc_id % 5 = 0
                  THEN ['${PlantedParagraphs(0)}'] ELSE [] END)
                || list_transform(
                     generate_series(1, ${TS.chunkCount("toks", ParagraphTokens)}),
                     j -> ${TS.tokenChunk("toks", "j", ParagraphTokens)})
                || (CASE WHEN doc_id % 11 = 0
                  THEN ['${PlantedParagraphs(1)}'] ELSE [] END) AS paras
              FROM d),
            p AS (SELECT doc_id, source, md5(unnest(paras)) AS fp FROM p0),
            c AS (SELECT fp, MIN(doc_id) AS keep_doc FROM p GROUP BY fp),
            pd AS (SELECT p.doc_id, p.source, COUNT(*) AS pt,
                SUM(CASE WHEN p.doc_id > c.keep_doc THEN 1 ELSE 0 END) AS pr
              FROM p JOIN c USING (fp) GROUP BY 1, 2)
            SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(pt) AS BIGINT) AS paras_total,
              CAST(SUM(pr) AS BIGINT) AS paras_removed,
              CAST(SUM(CASE WHEN pr > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS docs_affected
            FROM pd GROUP BY source ORDER BY source""",
      "d11_winnowed_dup" ->
        s"""WITH pos AS (
              SELECT doc_id, len(text) AS l, text,
                unnest(generate_series(1, len(text) - $WinnowW + 1)) AS i
              FROM documents WHERE len(text) >= $WinnowW),
            h AS (
              SELECT doc_id, i, l,
                CAST(('0x' || substr(md5(substr(text, CAST(i AS INT), $WinnowW)), 1, 15))
                  AS BIGINT) AS hv
              FROM pos),
            wmin AS (
              SELECT doc_id, i, l,
                MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN CURRENT ROW AND ${WinnowK - 1} FOLLOWING) AS fp
              FROM h),
            sel AS (SELECT DISTINCT doc_id, fp FROM wmin
                    WHERE i <= l - ${WinnowW + WinnowK} + 2),
            pairs AS (
              SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_shared
              FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_i, doc_j, n_shared FROM pairs
            WHERE n_shared >= $WinnowMinShared ORDER BY doc_i, doc_j""",
      "d17_exact_substring" ->
        s"""WITH pos AS (
              SELECT doc_id, text,
                unnest(generate_series(1, len(text) - $ExactSpanChars + 1)) AS i
              FROM documents WHERE len(text) >= $ExactSpanChars),
            sel AS (
              SELECT DISTINCT doc_id,
                CAST(('0x' || substr(md5(substr(text, CAST(i AS INT),
                  $ExactSpanChars)), 1, 15)) AS BIGINT) AS fp
              FROM pos),
            pairs AS (
              SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS n_shared
              FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_i, doc_j, n_shared FROM pairs ORDER BY doc_i, doc_j""",
      // d19 mirror: same per-position hash as d17's `sel` but WITHOUT
      // DISTINCT (every occurrence counts), canonical-first via a
      // ROW_NUMBER over (doc_id, i) — rn >= 2 ⟺ "df >= 2 and not the
      // min (doc_id, i) occurrence", the engine's agg+join form —
      // then the gaps-and-islands merge with the gap > span-length rule.
      "d19_dup_spans" ->
        s"""WITH $d19SpanCtes
            SELECT doc_id, span_start, span_end, n_windows
            FROM sp ORDER BY doc_id, span_start""",
      // d20 mirror: the identical span chain folded back onto documents
      // — per-source surgery accounting (one LEFT JOIN + rollup)
      "d20_span_surgery" ->
        s"""WITH $d19SpanCtes,
            cut AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                CAST(SUM(span_end - span_start + 1) AS BIGINT) AS chars_cut
              FROM sp GROUP BY doc_id)
            SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN cut.doc_id IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS docs_affected,
              CAST(COALESCE(SUM(cut.n_spans), 0) AS BIGINT) AS spans_cut,
              CAST(COALESCE(SUM(cut.chars_cut), 0) AS BIGINT) AS chars_removed,
              CAST(SUM(len(d.text)) AS BIGINT) AS chars_total
            FROM documents d LEFT JOIN cut ON d.doc_id = cut.doc_id
            GROUP BY d.source ORDER BY d.source""",
      "d10_cross_split_leakage" ->
        s"""WITH d AS (
              SELECT doc_id,
                CASE WHEN (${TS.polyFingerprint(toks)}) % 100 < 80 THEN 'train'
                     WHEN (${TS.polyFingerprint(toks)}) % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split,
                $sh AS sh
              FROM documents WHERE len($toks) >= 3),
            tr AS (SELECT DISTINCT unnest(sh) AS h FROM d WHERE split = 'train'),
            te AS (SELECT doc_id, split, len(sh) AS n_shingles, unnest(sh) AS h
                   FROM d WHERE split <> 'train'),
            lk AS (SELECT doc_id, split, n_shingles, COUNT(*) AS n_leaked
                   FROM te WHERE h IN (SELECT h FROM tr)
                   GROUP BY 1, 2, 3)
            SELECT doc_id, split, n_shingles, n_leaked,
              round(n_leaked / CAST(n_shingles AS DOUBLE), 4) AS contamination
            FROM lk WHERE n_leaked / CAST(n_shingles AS DOUBLE) >= 0.3
            ORDER BY doc_id""",
      "d13_semantic_decontamination" ->
        // brute eval×train cosine join: the oracle mirrors the SEMANTICS
        // (exact range search), not the pruned plan — the Spark side is
        // result-identical to brute by the triangle-bound argument
        // (s06 precedent). Norms come from a per-vector CTE: sqrt(dot)
        // then multiply is the same float op sequence as the inline
        // cosine, just not recomputed per pair.
        s"""WITH b AS (SELECT vec_id, embedding,
              CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
                % 100 AS bucket
              FROM embeddings
              WHERE ${VS.dot("embedding", "embedding")} > 0),
            tr AS (SELECT vec_id, embedding,
                sqrt(${VS.dot("embedding", "embedding")}) AS nrm
              FROM b WHERE bucket < 80),
            ev AS (SELECT vec_id, embedding,
                sqrt(${VS.dot("embedding", "embedding")}) AS nrm
              FROM b WHERE bucket >= 80),
            pairs AS (SELECT ev.vec_id AS eval_id,
                ${VS.dot("ev.embedding", "tr.embedding")} / (ev.nrm * tr.nrm) AS cos
              FROM ev, tr)
            SELECT eval_id, COUNT(*) AS n_near, ROUND(MAX(cos), 4) AS max_cos
            FROM pairs WHERE cos >= $D13Tau
            GROUP BY eval_id ORDER BY eval_id""",
      "d01_exact_dedup" ->
        """SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS dup_group,
           doc_id = min(doc_id) OVER (
             PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS is_canonical
           FROM documents ORDER BY doc_id""",
      "d02_ngram_jaccard" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM d),
            p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.n AS ni, b.n AS nj,
                    COUNT(*) AS shared
                  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4)
            SELECT doc_i, doc_j, round(shared / (ni + nj - shared), 4) AS jaccard
            FROM p WHERE shared / (ni + nj - shared) >= 0.2
            ORDER BY doc_i, doc_j""",
      // d18's oracle IS d02's restricted to pairs touching a new doc:
      // the semantics under test is "the incremental join loses nothing
      // and invents nothing vs the full pair join" — the Spark side
      // never computes old×old, the oracle computes everything and
      // filters, and the hash gate holds them equal.
      "d18_incremental_neardup" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM d),
            p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.n AS ni, b.n AS nj,
                    COUNT(*) AS shared
                  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4)
            SELECT doc_i, doc_j, round(shared / (ni + nj - shared), 4) AS jaccard
            FROM p WHERE shared / (ni + nj - shared) >= 0.2
              AND (doc_i % $IncrementalNewMod = $IncrementalNewRem
                OR doc_j % $IncrementalNewMod = $IncrementalNewRem)
            ORDER BY doc_i, doc_j""",
      "d09_containment" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM d),
            p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.n AS ni, b.n AS nj,
                    COUNT(*) AS shared
                  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4),
            dir AS (SELECT doc_i AS contained, doc_j AS container, shared / ni AS c FROM p
                    UNION ALL
                    SELECT doc_j, doc_i, shared / nj FROM p)
            SELECT contained, container, round(c, 4) AS containment
            FROM dir WHERE c >= 0.4
            ORDER BY contained, container""",
      "d08_neardup_by_source" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM d),
            p AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.n AS ni, b.n AS nj,
                    COUNT(*) AS shared
                  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
                  GROUP BY 1, 2, 3, 4),
            pr AS (SELECT doc_i, doc_j, shared / (ni + nj - shared) AS jaccard
                   FROM p WHERE shared / (ni + nj - shared) >= 0.2)
            SELECT least(si.source, sj.source) AS src_a,
              greatest(si.source, sj.source) AS src_b,
              COUNT(*) AS n_pairs, ROUND(AVG(jaccard), 4) AS avg_jaccard
            FROM pr JOIN documents si ON pr.doc_i = si.doc_id
                    JOIN documents sj ON pr.doc_j = sj.doc_id
            GROUP BY 1, 2 ORDER BY 1, 2""",
      "d03_minhash_lsh" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            sig AS (SELECT doc_id, sh, $sigSql AS sig FROM d),
            bands AS (SELECT doc_id, j, sig[CAST(2*j+1 AS INT)]*$P + sig[CAST(2*j+2 AS INT)] AS key
                      FROM sig, generate_series(0, 15) AS t(j)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
                     FROM bands a JOIN bands b
                     ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id),
            v AS (SELECT doc_i, doc_j,
                    len(list_intersect(x.sh, y.sh)) /
                      (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
                  FROM cand JOIN d x ON x.doc_id = cand.doc_i
                            JOIN d y ON y.doc_id = cand.doc_j)
            SELECT doc_i, doc_j, round(jac, 4) AS jaccard FROM v WHERE jac >= 0.2
            ORDER BY doc_i, doc_j""",
      "d14_minhash_calibration" ->
        s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents WHERE len($toks) >= 3),
            sig AS (SELECT doc_id, sh, $sigSql AS sig FROM d),
            bands AS (SELECT doc_id, j, sig[CAST(2*j+1 AS INT)]*$P + sig[CAST(2*j+2 AS INT)] AS key
                      FROM sig, generate_series(0, 15) AS t(j)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
                     FROM bands a JOIN bands b
                     ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT doc_i, doc_j,
              CAST(list_sum(list_transform(generate_series(1, 32),
                i -> CASE WHEN x.sig[CAST(i AS INT)] = y.sig[CAST(i AS INT)]
                     THEN 1 ELSE 0 END)) AS BIGINT) AS est_matches,
              CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS shared,
              CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))
                AS BIGINT) AS uni
            FROM cand JOIN sig x ON x.doc_id = cand.doc_i
                      JOIN sig y ON y.doc_id = cand.doc_j
            ORDER BY doc_i, doc_j""",
      "d04_simhash" ->
        s"""SELECT doc_id,
            CAST(list_sum(list_transform(generate_series(0, 62), b ->
              CASE WHEN list_sum(list_transform(
                list_transform($toks, t -> ${TS.tokenVal("t")}), v ->
                  CASE WHEN ((v * (((b+1) * 1103515245) % $P) + (b*12345 + 6789)) % $P) % 2 = 1
                       THEN 1 ELSE -1 END)) > 0
                   THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
            FROM documents ORDER BY doc_id""",
      "d06_simhash_pairs" ->
        s"""WITH s AS (SELECT doc_id,
              CAST(list_sum(list_transform(generate_series(0, 62), b ->
                CASE WHEN list_sum(list_transform(
                  list_transform($toks, t -> ${TS.tokenVal("t")}), v ->
                    CASE WHEN ((v * (((b+1) * 1103515245) % $P) + (b*12345 + 6789)) % $P) % 2 = 1
                         THEN 1 ELSE -1 END)) > 0
                     THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h
              FROM documents),
            bands AS (SELECT doc_id, h, b, (h >> CAST(b*16 AS INT)) & 65535 AS key
                      FROM s, generate_series(0, 3) t(b)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j,
                       CAST(bit_count(CAST(xor(a.h, b.h) AS BIGINT)) AS BIGINT) AS hamming
                     FROM bands a JOIN bands b
                     ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id)
            SELECT doc_i, doc_j, hamming FROM cand WHERE hamming <= 8
            ORDER BY doc_i, doc_j""",
      "d07_dup_clusters" ->
        s"""WITH RECURSIVE $d07CcCtes
            SELECT cluster AS cluster_id, COUNT(*) AS n_docs,
              MAX(doc_id) AS max_doc
            FROM lab GROUP BY cluster ORDER BY cluster_id""",
      // d21 mirror: the identical cluster chain, canonical picked by
      // ROW_NUMBER over the same (q_ppm DESC, doc_id ASC) order the
      // engine's lexicographic (q_ppm, -doc_id) struct max encodes
      "d21_quality_canonical" ->
        s"""WITH RECURSIVE $d07CcCtes,
            q AS (
              SELECT doc_id,
                ${TS.markerHits(toks, TF.stopwords)} * 1000000
                  // len($toks) AS q_ppm
              FROM documents WHERE len($toks) >= 3),
            lq AS (
              SELECT lab.cluster, lab.doc_id, q.q_ppm,
                ROW_NUMBER() OVER (PARTITION BY lab.cluster
                  ORDER BY q.q_ppm DESC, lab.doc_id ASC) AS rn
              FROM lab JOIN q USING (doc_id))
            SELECT cluster AS cluster_id, COUNT(*) AS n_docs,
              MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
              MAX(CASE WHEN rn = 1 THEN q_ppm END) AS canonical_q_ppm
            FROM lq GROUP BY cluster ORDER BY cluster_id""",
      "d05_embedding_dup" -> d05Sql,
      "d12_semdedup" ->
        s"""WITH pairs AS ($d05Sql),
            drops AS (SELECT DISTINCT label, vec_j AS vec_id FROM pairs)
            SELECT e.label, COUNT(*) AS n_vecs,
              CAST(SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
              CAST(COUNT(*) - SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1
                ELSE 0 END) AS BIGINT) AS n_kept
            FROM embeddings e LEFT JOIN drops d
              ON e.label = d.label AND e.vec_id = d.vec_id
            GROUP BY e.label ORDER BY e.label""",
    )
  }

  /** DuckDB mirror of d05's default (bandBits=2, nBands=4) banding —
    * shared verbatim by the d05 gate and d12's pair source. */
  private def d05Sql: String = {
    val branches = (0 until 4).map { j =>
      s"""SELECT a.label, a.vec_id AS vec_i, b.vec_id AS vec_j,
              ${VS.cosine("a.embedding", "b.embedding")} AS cos
            FROM e2 a JOIN e2 b
            ON a.label = b.label AND a.b$j = b.b$j AND a.vec_id < b.vec_id"""
    }.mkString("\n              UNION\n              ")
    s"""WITH e AS (SELECT label, vec_id, embedding,
              ${VS.signBucket("embedding")} AS bkt FROM embeddings),
        e2 AS (SELECT label, vec_id, embedding,
              (bkt >> 0) & 3 AS b0, (bkt >> 2) & 3 AS b1,
              (bkt >> 4) & 3 AS b2, (bkt >> 6) & 3 AS b3 FROM e),
        p AS (
          $branches)
        SELECT label, vec_i, vec_j, round(cos, 4) AS cosine
        FROM p WHERE cos >= 0.35 ORDER BY vec_i, vec_j"""
  }
}
