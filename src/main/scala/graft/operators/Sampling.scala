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

  /** p04: temperature-flattened mixture sample — the source-reweighting
    * step of a training-data pipeline (the GPT-3/PaLM "mixture weights"
    * shape): target T = ⌊20% of corpus⌋ documents drawn with per-source
    * probability ∝ n_s^τ, τ = 0.5 (√-flattening: rare sources are
    * upweighted relative to their share, big sources downweighted),
    * realized as a DETERMINISTIC per-source ppm threshold on the
    * document fingerprint — the same engine-portable uniform p01/p02
    * key off, so membership is reproducible anywhere and sampling
    * 100 TB stays a broadcast-join + map-side filter (the per-source
    * count agg is the only shuffle, and it partial-aggregates).
    *
    * FP-determinism: the cross-source Σ√n_s is folded over a SORTED
    * list (collect_list → sort_array → aggregate), because float
    * addition is order-sensitive and a plain window SUM's order is
    * engine-/partition-dependent; integer totals are exact and sqrt is
    * IEEE-exact, so both engines floor identical doubles into identical
    * ppm thresholds. Output is all-integer — no rounding boundary in
    * the gate at all. */
  def p04MixtureSample(spark: SparkSession, dir: String): DataFrame =
    p04MixtureSample(spark, dir, frac = 0.2)

  /** `frac` scales the target sample size (T = ⌊frac·N⌋); τ stays the
    * √-flattening because sqrt is IEEE-exact in both engines — a generic
    * pow(n, τ) is the one place cross-engine float parity could crack,
    * so other temperatures belong behind a rows-only gate. */
  def p04MixtureSample(spark: SparkSession, dir: String, frac: Double): DataFrame = {
    val docs = withFp(spark, dir).select(col("source"), col("fp"))
    // Cross-source totals as DRIVER SCALARS over the snapshotted
    // ≤|sources|-row aggregate — NOT an unpartitioned window: the frame
    // is tiny so a Window.partitionBy() was harmless, but it flooded
    // the log with single-partition WindowExec warnings
    // indistinguishable from a real scale-killer. The snapshot
    // (q36/q46 rule) runs the corpus agg once; the fold over the
    // SORTED w list is the identical IEEE left-to-right sum the
    // previous sort_array/aggregate form computed, so thresholds are
    // bit-identical, and the scalars enter the plan as literals (no
    // join, no window — stricter than q31's 1-row crossJoin, which
    // PlanAuditSpec bans here as a nested-loop join).
    val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      .withColumn("w", sqrt(col("n_total").cast("double")))
      .localCheckpoint()
    val srcRows = bySrc.collect()
    val wSum = srcRows.map(_.getAs[Double]("w")).sorted.foldLeft(0.0)(_ + _)
    val tTarget = math.floor(frac * srcRows.map(_.getAs[Long]("n_total")).sum.toDouble)
    val thr = bySrc
      .withColumn("sample_ppm", least(lit(1000000L),
        floor(lit(tTarget) * col("w") / lit(wSum) /
          col("n_total").cast("double") * lit(1000000.0)).cast("long")))
      .select(col("source"), col("n_total"), col("sample_ppm"))
    docs.join(broadcast(thr), Seq("source"))
      .groupBy(col("source"), col("n_total"), col("sample_ppm"))
      .agg(sum(when(pmod(col("fp"), lit(1000000L)) < col("sample_ppm"), 1L)
        .otherwise(0L)).as("n_sampled"))
      .select(col("source"), col("n_total"), col("sample_ppm"), col("n_sampled"))
      .orderBy("source")
  }

  /** Token budget for [[p06TokenBudgetMix]]: the target size of the
    * assembled training mix, in tokens. 10k is ~37% of the sf0.01 corpus
    * (every source samples) and ~3.7% of sf0.1; production budgets are
    * trillions with the identical all-integer plan. */
  val MixTokenBudget = 10000L

  /** p06: token-BUDGET mixture — the "assemble a B-token training mix"
    * step: every source gets an equal token share B/|S| (source-balanced
    * rebalancing — p04 reweights by document COUNT with a temperature;
    * this targets the budget in TOKENS, the unit training actually
    * buys), realized as a deterministic per-source ppm threshold on the
    * document fingerprint. A source with fewer tokens than its share
    * clamps to keep-everything (rate 1e6 ppm) — the standard undersized-
    * source behaviour (upsampling/epoch-repeat is a separate knob).
    *
    * ALL-INTEGER end to end: the rate is (share·1e6) div tok_total in
    * BIGINT (no float anywhere — stricter than p04, whose √-weights
    * need one sorted fold), so the gate has no rounding boundary at
    * all. Shape at 100 TB: one partial-aggregable shuffle for
    * per-source token totals, the |S|-row rate table broadcast back,
    * membership a map-side fingerprint predicate — sampling the corpus
    * is a filtered scan, like p01/p02/p04. */
  def p06TokenBudgetMix(spark: SparkSession, dir: String): DataFrame =
    p06TokenBudgetMix(spark, dir, MixTokenBudget)

  def p06TokenBudgetMix(spark: SparkSession, dir: String,
      budget: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("source"),
        graft.functions.NativeFunctions.polyFingerprint(col("toks")).as("fp"),
        size(col("toks")).cast("long").as("n_tok"))
    // keep-all clamp FIRST, so the ppm product only forms when
    // share < tok_total — then share·1e6 < tok_total·1e6, which fits
    // Long for any source up to ~9.2e12 tokens (a 100 TB corpus split
    // over a handful of sources; beyond that, shard the source). A
    // plain least(1e6, share·1e6 div tok_total) would instead wrap
    // share·1e6 negative at multi-trillion-token budgets and silently
    // emit an empty mix.
    // |S| as a driver scalar over the snapshotted per-source view —
    // integer-exact, enters the plan as a literal (p04's note: no
    // unpartitioned window, no 1-row join). max(1, …) guards the empty
    // corpus: rates is empty then anyway, but the driver division must
    // not throw where the old window form simply never evaluated.
    val totals = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("tok_total"))
      .localCheckpoint()
    val share = budget / math.max(1L, totals.count()) // Long div == BIGINT div
    val rates = totals
      .withColumn("share", lit(share))
      .withColumn("rate_ppm",
        when(col("share") >= col("tok_total"), lit(1000000L))
          .otherwise(expr("(share * 1000000L) div tok_total")))
      .select(col("source"), col("tok_total"), col("share"), col("rate_ppm"))
    docs.join(broadcast(rates), Seq("source"))
      .groupBy(col("source"), col("tok_total"), col("share"), col("rate_ppm"))
      .agg(
        sum(when(pmod(col("fp"), lit(1000000L)) < col("rate_ppm"), 1L)
          .otherwise(0L)).as("n_docs_kept"),
        sum(when(pmod(col("fp"), lit(1000000L)) < col("rate_ppm"), col("n_tok"))
          .otherwise(0L)).as("tok_kept"))
      .orderBy("source")
  }

  /** Keep rates per quality tier (ppm), tier = #passed rules (0..3):
    * full-quality docs keep everything, partial-quality docs are
    * down-sampled hard, zero-rule docs drop — the DCLM/FineWeb-style
    * "sample by quality bucket" recipe with knob-shaped rates. */
  val QualityKeepPpm: IndexedSeq[Long] = IndexedSeq(0L, 100000L, 300000L, 1000000L)

  /** p08: QUALITY-TIERED sampling — the stage between a quality
    * classifier and the mixture: instead of a hard keep/drop filter
    * (t14) or a source-balanced rate (p04/p06), each document's keep
    * probability follows its QUALITY TIER (the DCLM/FineWeb recipe:
    * high-quality buckets keep more, low-quality buckets are
    * down-sampled, junk drops). Tier = number of passed integer rules
    * (t14's Gopher family, cross-multiplied so no ratio ever exists):
    * mean word length in [3,10] as 3·n_tok ≤ Σlen ≤ 10·n_tok, ≥80%
    * alphabetic words as 5·n_alpha ≥ 4·n_tok, ≥2 distinct stopwords.
    * Membership is the deterministic fingerprint-ppm predicate
    * (p01/p02/p04/p06's portable key — reproducible on any engine, any
    * cluster). ALL-INTEGER end to end: integer token sums are exact and
    * order-independent, so unlike t02's float score there is no
    * rounding boundary anywhere in the gate.
    *
    * Shape at 100 TB: every feature is a map-side column expression on
    * the token array; the only shuffle is the ≤ |sources|·4-group
    * rollup (partial-aggregable). Sampling the corpus stays a filtered
    * scan — the tier CASE and the fp predicate push into it. */
  /** The 3-rule integer quality TIER over a token array (0..3) — p08's
    * bucket key, and t28's weak training label (single-sourced so the
    * classifier is trained on exactly the rules the sampler gates on):
    * mean word length in [3,10] (cross-multiplied), ≥80% alphabetic
    * words, ≥2 distinct stopwords. */
  private[graft] def qualityTier(toks: Column): Column = {
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(transform(toks, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = size(filter(toks, w => w.rlike("[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(toks),
      array(TF.stopwords.map(lit): _*))).cast("long")
    when(lit(3L) * nTok <= sumLen && sumLen <= lit(10L) * nTok, 1L).otherwise(0L) +
      when(lit(5L) * nAlpha >= lit(4L) * nTok, 1L).otherwise(0L) +
      when(nStop >= 2L, 1L).otherwise(0L)
  }

  def p08QualitySample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("fp", graft.functions.NativeFunctions.polyFingerprint(col("toks")))
    val nTok = size(col("toks")).cast("long")
    val tier = qualityTier(col("toks"))
    val keepPpm =
      when(col("tier") === 3, QualityKeepPpm(3))
        .when(col("tier") === 2, QualityKeepPpm(2))
        .when(col("tier") === 1, QualityKeepPpm(1))
        .otherwise(QualityKeepPpm(0))
    val kept = pmod(col("fp"), lit(1000000L)) < col("keep_ppm")
    docs.select(col("source"), col("fp"), nTok.as("n_tok"), tier.as("tier"))
      .withColumn("keep_ppm", keepPpm)
      .groupBy(col("source"), col("tier"), col("keep_ppm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tok_total"),
        sum(when(kept, col("n_tok")).otherwise(0L)).as("tok_kept"))
      .orderBy("source", "tier")
  }

  /** Epoch-repeat cap for [[p09EpochMix]] — the data-constrained-scaling
    * bound (Muennighoff et al. 2023: value decays fast past ~4 repeats;
    * beyond it, spend budget elsewhere). */
  val MaxEpochs = 4L

  /** p09: EPOCH-REPEAT mixture plan — the step between p06's one-pass
    * budget mix and a real data-constrained training run: when a
    * source's token count is SMALLER than its budget share, the recipe
    * repeats it for multiple epochs (the LLaMA/data-constrained-scaling
    * pattern) rather than silently under-filling the mix. Per source:
    * full epochs = share div tokens (capped at [[MaxEpochs]] — past the
    * cap the share is deliberately left unfilled), then ONE partial
    * pass at rate (share mod tokens)·1e6 div tokens ppm realized by the
    * deterministic fingerprint predicate (p01/p06 rule). Planned tokens
    * = full·tokens + the partial pass's realized doc tokens —
    * ALL-INTEGER end to end, so the plan is bit-reproducible and
    * auditable before any data moves.
    *
    * Shape at 100 TB: one partial-aggregable per-source token shuffle,
    * the |S|-row epoch/rate table broadcast back, membership of the
    * partial pass a map-side fingerprint predicate — the plan costs a
    * filtered scan, and the realized mix writes epochs as replay
    * passes (p07's epoch shuffle orders each one). */
  def p09EpochMix(spark: SparkSession, dir: String): DataFrame =
    // 10x p06's one-pass budget: big enough that undersized sources hit
    // the repeat (and at small SFs the cap) branch, small enough that
    // large-SF sources exercise the partial-pass branch — the gate runs
    // both arms across its SFs
    p09EpochMix(spark, dir, MixTokenBudget * 10, MaxEpochs)

  def p09EpochMix(spark: SparkSession, dir: String, budget: Long,
      maxEpochs: Long): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("source"),
        graft.functions.NativeFunctions.polyFingerprint(col("toks")).as("fp"),
        size(col("toks")).cast("long").as("n_tok"))
    // |S| as a driver scalar over the snapshotted per-source view
    // (p04's note: no unpartitioned window, no 1-row join; max(1, …)
    // keeps the empty corpus an empty result, not a division error)
    val totals = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("tok_total"))
      .localCheckpoint()
    val plan = totals
      .withColumn("share", lit(budget / math.max(1L, totals.count())))
      .withColumn("full_epochs",
        least(expr("share div tok_total"), lit(maxEpochs)))
      // the partial pass exists only below the cap; share mod tok_total
      //·1e6 stays in Long for the same range bound as p06 (the clamp
      // guard there); at the cap the remainder is deliberately unfilled
      .withColumn("partial_ppm",
        when(col("full_epochs") >= maxEpochs, lit(0L))
          .otherwise(expr("((share % tok_total) * 1000000L) div tok_total")))
      .select(col("source"), col("tok_total"), col("share"),
        col("full_epochs"), col("partial_ppm"))
    docs.join(broadcast(plan), Seq("source"))
      .groupBy(col("source"), col("tok_total"), col("share"),
        col("full_epochs"), col("partial_ppm"))
      .agg(sum(when(pmod(col("fp"), lit(1000000L)) < col("partial_ppm"),
        col("n_tok")).otherwise(0L)).as("partial_tok"))
      .withColumn("tok_planned",
        col("full_epochs") * col("tok_total") + col("partial_tok"))
      .orderBy("source")
  }

  /** Shard count for [[p07EpochShuffle]] — files-per-epoch of the
    * training order. 64 keeps shards multi-doc at test SFs; production
    * sizes shards to ~256 MB like shuffle partitions. */
  val ShuffleShards = 64

  /** LCG mixing constants for the epoch key (glibc's multiplier; any
    * fixed odd pair works — the key only needs to decorrelate doc_id
    * order, not survive cryptanalysis). */
  val EpochA = 1103515245L
  val EpochB = 12345L

  /** p07: epoch shuffle — the deterministic GLOBAL training-order
    * shuffle every pretraining run does per epoch: each doc gets a
    * pseudorandom-but-reproducible sort key from (doc_id, epoch), is
    * range-assigned to a shard, and shards are written ordered by key.
    * Changing `epoch` re-permutes the corpus; re-running the same epoch
    * reproduces it bit-for-bit on any engine/cluster (no rand(), no
    * partition-order dependence — the p01/p02 determinism rule applied
    * to ordering). Output audits the layout: docs/tokens and the key
    * range per shard.
    *
    * Shape at 100 TB: the key and shard are map-side integer column
    * ops (all products stay under 2^63 — no overflow wrap on Spark, no
    * BIGINT error on DuckDB); the real pipeline then repartitions by
    * shard and sorts within shards — exactly one shuffle, the point of
    * the op — while the audit here aggregates the same assignment
    * partial-aggregably. */
  def p07EpochShuffle(spark: SparkSession, dir: String): DataFrame =
    p07EpochShuffle(spark, dir, epoch = 1L)

  def p07EpochShuffle(spark: SparkSession, dir: String, epoch: Long,
      shards: Int = ShuffleShards): DataFrame = {
    val P = TF.HashMod
    // epoch enters the MULTIPLIER, not an additive offset: key =
    // doc_id·(A + epoch·B) mod P. P is prime, so any nonzero multiplier
    // is invertible mod P and each epoch is a genuinely different
    // permutation of the id space — an additive epoch term would only
    // rotate one fixed order. (doc_id mod P)·m ≤ (P−1)² ≈ 1e18 < 2^63:
    // no Long wrap on Spark, no BIGINT error on DuckDB.
    val m = java.lang.Math.floorMod(EpochA + epoch * EpochB, P)
    require(m != 0, s"degenerate epoch $epoch: multiplier is 0 mod $P")
    val key = (pmod(col("doc_id"), lit(P)) * lit(m)) % lit(P)
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        size(TF.tokens(col("text"))).cast("long").as("n_tok"),
        key.as("key"))
      // RANGE-binned shard ((key·shards) div P): concatenating shards in
      // shard order replays the full key-permuted corpus order — a
      // pmod-hashed shard would balance but lose the global ordering.
      .withColumn("shard", expr(s"(key * ${shards}L) div ${P}L"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy("shard")
  }

  /** Context-window budget for [[p05PackChunks]] — tokens per packed
    * training sequence. 512 keeps multiple chunks per source at test SFs;
    * production LLM pipelines use 2048–8192 with the identical plan. */
  val PackBudget = 512L

  /** p05: sequence-packing layout — the "concatenate-and-chop" packing
    * every LLM pretraining pipeline runs last: documents are laid out in
    * a deterministic order (doc_id within source shard), token offsets
    * accumulate, and the stream is chopped into fixed
    * [[PackBudget]]-token context windows; a document belongs to the
    * chunk its first token lands in (docs may span boundaries — that is
    * the standard GPT-style packing semantics). Output audits the
    * layout: docs and tokens starting per (source, chunk).
    *
    * Shape at 100 TB: packing is per-SOURCE-shard (the window partitions
    * by source), so the running sum is a per-shard window over rows
    * already co-located by the one source shuffle — there is no global
    * cumsum barrier; shards pack independently and in parallel, exactly
    * like per-file packing in a real pipeline (a global layout would
    * instead do the classic two-pass prefix-sum: per-partition subtotals
    * → broadcast offsets). All outputs are integers — no float boundary
    * anywhere. */
  def p05PackChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), col("doc_id"),
        size(TF.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("start_off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk", floor(col("start_off") / lit(PackBudget.toDouble)))
      .groupBy(col("source"), col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("source", "chunk")
  }

  // ── p13: classifier-score-tiered sampling (the DCLM loop's SAMPLE) ──

  /** Per-doc INTEGER classifier score under t17's deterministic hashed
    * weight stream (w = (tokenVal·A + B) mod P per occurrence) — the
    * SQL-expressible scoring that lets p13's tiering machinery be
    * hash-gated end to end. Same explode → one-doc-shuffle shape as the
    * gated t17; fp and token count ride the group key so no second
    * corpus pass is needed. */
  private[graft] def p13ScoredHashed(spark: SparkSession, dir: String): DataFrame = {
    val w = (TF.tokenVal(col("t")) * lit(TextAnalysis.ClfA)
      + lit(TextAnalysis.ClfB)) % lit(TF.HashMod)
    Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        graft.functions.NativeFunctions.polyFingerprint(col("toks")).as("fp"),
        size(col("toks")).cast("long").as("n_tok"),
        explode(col("toks")).as("t"))
      .withColumn("w", w)
      .groupBy(col("doc_id"), col("source"), col("fp"), col("n_tok"))
      .agg(sum(col("w")).as("score_q"))
  }

  /** Per-doc integer score under t28's TRAINED quantized weight table —
    * the production scoring, run through the SAME
    * [[TextAnalysis.quantizedDocScores]] core the t28 bridge spec and
    * the streaming twin score with (single-sourced — the sampler can
    * never drift from the deployed scorer), with fp and token count
    * carried on the group key. Deterministic once the weight table is
    * fixed: the export is quantized integers, so the score has no float
    * anywhere. */
  private[graft] def p13ScoredTrained(spark: SparkSession, dir: String): DataFrame = {
    val (weights, interceptQ) = TextAnalysis.t28ExportWeights(spark, dir)
    val base = Tables.documents(spark, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("fp",
        graft.functions.NativeFunctions.polyFingerprint(col("toks")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
    TextAnalysis.quantizedDocScores(base, weights, interceptQ,
        carry = Seq("source", "fp", "n_tok"))
      .select("doc_id", "source", "fp", "n_tok", "score_q")
  }

  /** Quartile cut scores from the DETERMINISTIC stride sample (s03's
    * driver-bounded-fit rule: ≤4096 rows reach the driver at any corpus
    * size, and the doc_id-stride membership is reproducible on any
    * engine): boundary k = the sample's (ns·k/4)-th score in
    * (score, doc_id) order. Exactly what a production pipeline does —
    * cut points are estimated once from a sample, then tier assignment
    * is a map-side comparison against three literals.
    *
    * The stride class is ANCHORED at the minimum surviving doc_id's
    * remainder (`minId % stride`), not at 0: doc_id spaces need not
    * start at 0 or be dense, and an id space that skips the stride's
    * zero-multiples would otherwise yield an EMPTY sample — a crash
    * here and, worse, a silent NULL-cut divergence in the SQL mirror.
    * Anchoring keeps the filter a pushed-down map-side literal
    * comparison (a rank-based row_number sample would cost a global
    * window barrier over the corpus) while making the sample non-empty
    * by construction — the anchor doc itself is always a member. The
    * require is a belt-and-braces fail-fast, mirrored loudly rather
    * than diverging quietly. */
  private[graft] def p13Boundaries(scored: DataFrame, n: Long,
      minId: Long): (Long, Long, Long) = {
    require(n > 0, "p13: no scored documents")
    val stride = math.max(1L, n / 4096)
    val sample = scored
      .filter(pmod(col("doc_id"), lit(stride)) === lit(minId % stride))
      .select(col("score_q"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    require(sample.nonEmpty,
      s"p13: empty stride sample (stride=$stride, anchor=${minId % stride})" +
        " — minId must be the minimum doc_id of the scored relation")
    val ns = sample.length
    def bnd(k: Int): Long = sample(math.max(0, ns * k / 4 - 1))._1
    (bnd(1), bnd(2), bnd(3))
  }

  /** The shared tier→sample tail: tier = #cut-scores strictly below the
    * doc's score (0..3), keep rate rides [[QualityKeepPpm]] (p08's
    * knob), membership is the p01/p02 fingerprint-ppm predicate. Output
    * is p08's all-integer per-(source, tier) audit. The scored relation
    * is referenced for the boundary sample and the full rollup — two
    * passes over a corpus-sized lineage on purpose (p10's rule: never
    * cache corpus-sized tables; at scale the stride filter pushes below
    * the scoring, so the sample pass scores ~4096 docs, not the
    * corpus). The stride's doc count comes from the CHEAP base-doc
    * count (one column scan — scored has exactly one row per surviving
    * doc, so the values are equal by construction), not from executing
    * the scoring lineage a third time. */
  /** The tier / keep-rate / membership column trio — single-sourced so
    * the batch rollup and the STREAMING sampler
    * ([[graft.streaming.StreamSample]]) decide identically: tier =
    * #cut-scores strictly below `score_q`, rate = [[QualityKeepPpm]] of
    * the `tier` column, membership = the fingerprint-ppm predicate. */
  private[graft] def p13TierCol(b1: Long, b2: Long, b3: Long): Column =
    when(col("score_q") > b1, 1L).otherwise(0L) +
      when(col("score_q") > b2, 1L).otherwise(0L) +
      when(col("score_q") > b3, 1L).otherwise(0L)

  private[graft] def p13KeepPpmCol: Column =
    when(col("tier") === 3, QualityKeepPpm(3))
      .when(col("tier") === 2, QualityKeepPpm(2))
      .when(col("tier") === 1, QualityKeepPpm(1))
      .otherwise(QualityKeepPpm(0))

  private[graft] def p13KeptCol: Column =
    pmod(col("fp"), lit(1000000L)) < col("keep_ppm")

  private[graft] def p13TieredRollup(spark: SparkSession, dir: String,
      scored: DataFrame): DataFrame = {
    // count AND min in the same cheap base-column pass (the stride's
    // anchor needs the minimum surviving id — see p13Boundaries)
    val nm = Tables.documents(spark, dir)
      .filter(length(trim(col("text"))) > 0)
      .agg(count(lit(1)), min(col("doc_id"))).first()
    val n = nm.getLong(0)
    val (b1, b2, b3) = p13Boundaries(scored, n, if (n == 0) 0L else nm.getLong(1))
    val kept = p13KeptCol
    scored.withColumn("tier", p13TierCol(b1, b2, b3))
      .withColumn("keep_ppm", p13KeepPpmCol)
      .groupBy(col("source"), col("tier"), col("keep_ppm"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tok_total"),
        sum(when(kept, col("n_tok")).otherwise(0L)).as("tok_kept"))
      .orderBy("source", "tier")
  }

  /** p13: CLASSIFIER-SCORE-tiered sampling — p08 gates on 3 heuristic
    * rules; the DCLM/FineWeb recipe gates on a trained classifier's
    * score QUANTILES (top quartile keeps everything, bottom drops).
    * This gated form runs the machinery on t17's deterministic hashed
    * score so every stage — stride sample, cut scores, tier assignment,
    * keep rates, rollup — hash-matches the DuckDB oracle; [[
    * p13bTrainedSample]] is the same code under the trained table. */
  def p13ScoreSample(spark: SparkSession, dir: String): DataFrame =
    p13TieredRollup(spark, dir, p13ScoredHashed(spark, dir))

  /** p13b: the DCLM loop CLOSED — t28 trains on p08's weak labels,
    * exports the quantized table, and THIS op samples the corpus by
    * quantiles of that trained score (train → score → sample).
    * Rows-only in the gate (the weight table rides an LBFGS fit, t28's
    * rule); the spec pins cut scores and tier counts against a driver
    * recompute under the exported table. */
  def p13bTrainedSample(spark: SparkSession, dir: String): DataFrame =
    p13TieredRollup(spark, dir, p13ScoredTrained(spark, dir))

  val oracle: Map[String, String] = {
    val fp = TS.polyFingerprint(TS.toks)
    Map(
      "p13_score_sample" ->
        s"""WITH d AS (
              SELECT doc_id, source, ${TS.toks} AS toks, ($fp) AS fp
              FROM documents WHERE len(trim(text)) > 0),
            s AS (
              SELECT doc_id, source, fp,
                CAST(len(toks) AS BIGINT) AS n_tok,
                CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(toks, t ->
                    (${TS.tokenVal("t")}*${TextAnalysis.ClfA}
                      + ${TextAnalysis.ClfB}) % ${TF.HashMod})),
                  (a, x) -> a + x) AS BIGINT) AS score_q
              FROM d),
            n0 AS (SELECT COUNT(*) AS n, MIN(doc_id) AS mid FROM s),
            samp AS (
              SELECT score_q, doc_id FROM s, n0
              WHERE doc_id % greatest(1, n // 4096)
                  = mid % greatest(1, n // 4096)),
            r AS (
              SELECT score_q,
                row_number() OVER (ORDER BY score_q, doc_id) AS rn
              FROM samp),
            nsx AS (SELECT COUNT(*) AS ns FROM samp),
            b AS (
              SELECT
                MAX(CASE WHEN rn = greatest(1, (ns*1) // 4) THEN score_q END) AS b1,
                MAX(CASE WHEN rn = greatest(1, (ns*2) // 4) THEN score_q END) AS b2,
                MAX(CASE WHEN rn = greatest(1, (ns*3) // 4) THEN score_q END) AS b3
              FROM r, nsx),
            t AS (
              SELECT source, fp, n_tok,
                CAST(CASE WHEN score_q > b1 THEN 1 ELSE 0 END
                  + CASE WHEN score_q > b2 THEN 1 ELSE 0 END
                  + CASE WHEN score_q > b3 THEN 1 ELSE 0 END AS BIGINT) AS tier
              FROM s, b),
            k AS (
              SELECT source, tier, fp, n_tok,
                CAST(CASE tier WHEN 3 THEN ${QualityKeepPpm(3)}
                  WHEN 2 THEN ${QualityKeepPpm(2)}
                  WHEN 1 THEN ${QualityKeepPpm(1)}
                  ELSE ${QualityKeepPpm(0)} END AS BIGINT) AS keep_ppm
              FROM t)
            SELECT source, tier, keep_ppm, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN fp % 1000000 < keep_ppm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
              CAST(SUM(n_tok) AS BIGINT) AS tok_total,
              CAST(SUM(CASE WHEN fp % 1000000 < keep_ppm THEN n_tok ELSE 0 END)
                AS BIGINT) AS tok_kept
            FROM k GROUP BY 1, 2, 3 ORDER BY 1, 2""",
      "p05_pack_chunks" ->
        s"""WITH d AS (
              SELECT source, doc_id,
                CAST(len(${TS.toks}) AS BIGINT) AS n_tok
              FROM documents WHERE len(trim(text)) > 0),
            o AS (
              SELECT source, doc_id, n_tok,
                COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS start_off
              FROM d)
            SELECT source,
              CAST(FLOOR(start_off / ${PackBudget}.0) AS BIGINT) AS chunk,
              COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
            FROM o GROUP BY 1, 2 ORDER BY 1, 2""",
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
      "p07_epoch_shuffle" ->
        s"""WITH d AS (
              SELECT doc_id,
                CAST(len(${TS.toks}) AS BIGINT) AS n_tok,
                ((doc_id % ${TF.HashMod}) * (($EpochA + 1 * $EpochB)
                  % ${TF.HashMod})) % ${TF.HashMod} AS key
              FROM documents WHERE len(trim(text)) > 0)
            SELECT (key * $ShuffleShards) // ${TF.HashMod} AS shard,
              COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              MIN(key) AS min_key, MAX(key) AS max_key
            FROM d GROUP BY 1 ORDER BY 1""",
      "p06_token_budget_mix" ->
        s"""WITH d AS (
              SELECT source, ($fp) AS fp,
                CAST(len(${TS.toks}) AS BIGINT) AS n_tok
              FROM documents WHERE len(trim(text)) > 0),
            t AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tok_total
              FROM d GROUP BY source),
            r AS (SELECT source, tok_total,
                $MixTokenBudget // (SELECT COUNT(*) FROM t) AS share,
                CASE WHEN $MixTokenBudget // (SELECT COUNT(*) FROM t)
                    >= tok_total THEN 1000000
                  ELSE (($MixTokenBudget // (SELECT COUNT(*) FROM t))
                    * 1000000) // tok_total END AS rate_ppm
              FROM t)
            SELECT d.source, r.tok_total, r.share, r.rate_ppm,
              CAST(SUM(CASE WHEN d.fp % 1000000 < r.rate_ppm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
              CAST(SUM(CASE WHEN d.fp % 1000000 < r.rate_ppm
                THEN d.n_tok ELSE 0 END) AS BIGINT) AS tok_kept
            FROM d JOIN r USING (source)
            GROUP BY 1, 2, 3, 4 ORDER BY 1""",
      "p09_epoch_mix" ->
        s"""WITH d AS (
              SELECT source, ($fp) AS fp,
                CAST(len(${TS.toks}) AS BIGINT) AS n_tok
              FROM documents WHERE len(trim(text)) > 0),
            t AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tok_total
              FROM d GROUP BY source),
            p AS (SELECT source, tok_total,
                ${MixTokenBudget * 10} // (SELECT COUNT(*) FROM t) AS share
              FROM t),
            e AS (SELECT source, tok_total, share,
                LEAST(share // tok_total, $MaxEpochs) AS full_epochs,
                CASE WHEN LEAST(share // tok_total, $MaxEpochs) >= $MaxEpochs
                  THEN 0
                  ELSE ((share % tok_total) * 1000000) // tok_total
                END AS partial_ppm
              FROM p)
            SELECT d.source, e.tok_total, e.share, e.full_epochs, e.partial_ppm,
              CAST(SUM(CASE WHEN d.fp % 1000000 < e.partial_ppm
                THEN d.n_tok ELSE 0 END) AS BIGINT) AS partial_tok,
              CAST(e.full_epochs * e.tok_total
                + SUM(CASE WHEN d.fp % 1000000 < e.partial_ppm
                    THEN d.n_tok ELSE 0 END) AS BIGINT) AS tok_planned
            FROM d JOIN e USING (source)
            GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""",
      "p08_quality_sample" ->
        s"""WITH d AS (
              SELECT source, ($fp) AS fp, ${TS.toks} AS toks
              FROM documents WHERE len(trim(text)) > 0),
            f AS (
              SELECT source, fp,
                CAST(len(toks) AS BIGINT) AS n_tok,
                CAST(list_reduce(list_prepend(0, list_transform(toks, w -> len(w))),
                  (a, x) -> a + x) AS BIGINT) AS sum_len,
                CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                  AS BIGINT) AS n_alpha,
                CAST(len(list_intersect(list_distinct(toks),
                  ${TS.inList(TF.stopwords)})) AS BIGINT) AS n_stop
              FROM d),
            t AS (
              SELECT source, fp, n_tok,
                CAST(CASE WHEN 3*n_tok <= sum_len AND sum_len <= 10*n_tok
                    THEN 1 ELSE 0 END
                  + CASE WHEN 5*n_alpha >= 4*n_tok THEN 1 ELSE 0 END
                  + CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS tier
              FROM f),
            k AS (
              SELECT source, fp, n_tok, tier,
                CAST(CASE tier WHEN 3 THEN ${QualityKeepPpm(3)}
                  WHEN 2 THEN ${QualityKeepPpm(2)}
                  WHEN 1 THEN ${QualityKeepPpm(1)}
                  ELSE ${QualityKeepPpm(0)} END AS BIGINT) AS keep_ppm
              FROM t)
            SELECT source, tier, keep_ppm, COUNT(*) AS n_docs,
              CAST(SUM(CASE WHEN fp % 1000000 < keep_ppm THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
              CAST(SUM(n_tok) AS BIGINT) AS tok_total,
              CAST(SUM(CASE WHEN fp % 1000000 < keep_ppm THEN n_tok ELSE 0 END)
                AS BIGINT) AS tok_kept
            FROM k GROUP BY 1, 2, 3 ORDER BY 1, 2""",
      "p04_mixture_sample" ->
        s"""WITH f AS (SELECT source, ($fp) AS fp FROM documents),
            c AS (SELECT source, COUNT(*) AS n_total FROM f GROUP BY source),
            g AS (SELECT source, n_total,
                sqrt(CAST(n_total AS DOUBLE)) AS w,
                list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_sort(list(sqrt(CAST(n_total AS DOUBLE))) OVER ())),
                  (acc, v) -> acc + v) AS w_sum,
                CAST(floor(0.2 * CAST(SUM(n_total) OVER () AS DOUBLE)) AS BIGINT)
                  AS t_target
              FROM c),
            thr AS (SELECT source, n_total,
                LEAST(1000000, CAST(floor(CAST(t_target AS DOUBLE) * w / w_sum
                  / CAST(n_total AS DOUBLE) * 1000000.0) AS BIGINT)) AS sample_ppm
              FROM g)
            SELECT f.source, t.n_total, t.sample_ppm,
              CAST(SUM(CASE WHEN (f.fp % 1000000) < t.sample_ppm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
            FROM f JOIN thr t ON f.source = t.source
            GROUP BY 1, 2, 3 ORDER BY 1""",
    )
  }
}
