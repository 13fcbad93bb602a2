package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writes PLANS.md: formatted physical plans for representative queries,
  * the evidence behind SURVEY §5's scale claims (pushdown, broadcast,
  * partial agg, heap top-k). Run: `sbt "runMain graft.PlanDump"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cases: Seq[(String, String, String)] = Seq(
      ("q02_filter_project",
        "Filters reach the parquet scan (PushedFilters) and ReadSchema is pruned to 5 of 16 lineitem columns."),
      ("q05_local_supplier",
        "Snowflake: only constant dims (region/nation) carry broadcast HINTS; customer/supplier are unhinted and AQE still picks BroadcastHashJoin at this SF (at 100 TB the same plan degrades safely to shuffle joins). The lineitem fact shuffles only for the final aggregation."),
      ("q01_pricing_summary",
        "Partial HashAggregate before the exchange, final after — map-side combine."),
      ("d03_minhash_lsh",
        "LSH candidates via equi-join on (band, key); no cartesian anywhere; verify join touches candidates only."),
      ("s01_knn_brute",
        "Query set broadcast (BroadcastNestedLoopJoin build-right); custom TopKPerGroup partial/final heap pair replaces window sort — the only exchange carries ≤ k rows per query per partition."),
      ("q21_exclusive_supplier",
        "EXISTS/NOT EXISTS become left-semi + left-anti joins, all three lineitem branches keyed on l_orderkey."),
      ("a01_asof_join",
        "As-of join as union + carry-forward window: ONE shuffle on user_id, a partition-local sort, no range-join explosion."),
      ("a02_band_join",
        "Banded time join: bucket replication turns the +/-300s range predicate into a pure equi-join (SortMergeJoin/ShuffledHashJoin on user_id+bucket), exact |dt| filter after."),
      ("q24_market_share",
        "TPC-H Q8 shape: 7-table tree. Region/nation (incl. nation twice) broadcast by hint; part/customer/supplier joins are AQE's cost-based choice (broadcast here, shuffle at scale); the fact side shuffles once for the year aggregation."),
      ("d05_embedding_dup",
        "Embedding dedup blocked on (label, sign-LSH band): candidates come from two band equi-joins (never a cross join), deduped by the post-union HashAggregate; block sizes shrink multiplicatively with band width."),
      ("s02_ann_lsh",
        "ANN with flip-1-bit multi-probe: the corpus is scanned once and equi-joined on the bucket id against the (tiny, broadcast) expanded probe set; TopKPerGroup partial/final heaps bound the shuffle to <= k rows per query per partition."),
      ("t08_cms_counts",
        "Count-min sketch: ObjectHashAggregate partial/final over the 32KB buffer — the shuffle carries one sketch per partition, not per-token rows."),
      ("s05_ann_multitable",
        "Multi-table ANN: the corpus explodes to L=4 (table, bucket) index entries per vector and equi-joins the broadcast probed query set on (t, bucket) — recall amplification with no cross join; DISTINCT dedupes cross-table hits before the heap top-k."),
      ("d11_winnowed_dup",
        "Winnowing exact-substring dedup: per-doc fingerprint selection fused into the native graft_winnow_fps expression (md5 + monotonic-deque minima + distinct in one compiled pass — no window shuffle), then the d02-style SHUFFLE_HASH inverted-index self-join — index density ~2/(K+1), no cartesian."),
      ("t12_entropy_filter",
        "Character entropy: explode -> partial-aggregable (doc, char) counts (map-side combine caps rows at |alphabet| per doc) -> per-doc algebraic entropy -> per-source rollup; three partial/final aggregate pairs, no join."),
      ("p04_mixture_sample",
        "Temperature mixture sample: per-source count agg (one partial-agg shuffle), threshold table broadcast back, membership is a map-side pmod filter on the fingerprint — the 100 TB pass is a filtered scan."),
      ("t13_unigram_surprisal",
        "Unigram surprisal: corpus token counts (partial agg), count join by token (AQE broadcast while the vocab is small), per-doc sorted fold, source rollup — the corpus-as-LM perplexity proxy with no cross join and integer totals."),
      ("t15_hll_distinct",
        "HyperLogLog cardinality: register build is a partial-aggregable max() capped at 256 rows per source per partition — the sketch shuffle carries |sources|*256 rows regardless of corpus size; the exact COUNT(DISTINCT) branch beside it is the test-SF accuracy reference the sketch replaces at 100 TB."),
      ("t14_gopher_rules",
        "Gopher rule bundle: all seven rules evaluate as projected column expressions over one document scan (structure planting and line/word measures are codegen'd array HOFs, no UDF, no explode), then a single partial/final aggregate pair — the only exchange carries |sources| rows."),
      ("q28_cube",
        "CUBE: one Expand between the partial and final HashAggregate — the fact is scanned once; the shuffle carries at most |sets|x|groups| partial rows."),
      ("q29_pivot",
        "Explicit-value-list pivot: single events scan, map-side partial pivot aggregate, ONE (day)-keyed exchange — no distinct-discovery pass, no join."),
      ("q30_set_ops",
        "INTERSECT/EXCEPT: each set op plans as distinct + left-semi/anti join co-partitioned on o_custkey; three year-filtered branches over the same scan, integer-only output."),
      ("t16_tfidf_keywords",
        "TF-IDF: tf and df are partial-agg shuffles, the tf-df term join is AQE-broadcast while the vocab is small, N joins as a broadcast scalar, and the top-20 is TakeOrderedAndProject (per-partition heap) — never a global sort."),
      ("p05_pack_chunks",
        "Sequence packing: per-source window cumsum (one source shuffle), chunk id by integer division, (source, chunk) aggregate reuses the source partitioning — join-free, no global cumsum barrier."),
      ("q31_important_parts",
        "Q11 shape: per-part partial agg (one fact shuffle), the scalar mean re-aggregates the |parts| grouped rows — not the fact — and joins back as a broadcast; the filter runs post-agg on grouped rows."),
      ("q32_range_window",
        "Calendar RANGE frame: daily pre-aggregation collapses events to |types|x|days| rows BEFORE the window; the frame sort runs over day counts on an integer order key."),
      ("t17_hashed_classifier",
        "Hashed-classifier inference as columnar arithmetic: explode -> ALL-INTEGER partial-aggregable (doc) weight sum -> one edge divide -> per-source rollup; no UDF, no join, whole plan inside codegen."),
      ("d12_semdedup",
        "SemDeDup decision: d05's banded equi-join pairs -> distinct drop set -> left join back to the corpus; the keep rule is an anti-join-shaped aggregate, no new join geometry."),
      ("s06_range_search",
        "EXACT pruned range search: corpus assigned to inverted lists by argmax native-cosine against driver-fitted unit-centroid literals (spherical k-means on a bounded sample — no UDF, no MLlib job), per-query probe lists cut by the triangle-inequality bound dist(q,c) <= radius + sqrt(2-2*tau), candidates from a list_id equi-join against the broadcast surviving probes, exact coalesce-guarded cosine >= tau verify on candidates only — result-identical to the brute scan by the triangle inequality (spec-pinned)."),
      ("t18_url_filter",
        "URL triage: planting, host extraction, and registered-domain normalization are one chain of codegen'd regex column ops over a single scan; blocklist is a literal IN-list; one |domains|-group aggregate."),
      ("q20b_percentile_sketch",
        "Percentile via mergeable sketch: approx_percentile partial+final aggregate pair around one event_type shuffle — executor memory bounded by the accuracy knob; the exact-percentile q20 exists only as the quantile_cont oracle mirror."),
      ("q33_dominant_supplier",
        "Argmax-per-group written as row_number()=1: WindowTopKRule re-plans the window onto the TopKPerGroup partial/final heap pair, so only <=1 row per part per partition reaches the rank shuffle — the Window node survives merely to number the survivors."),
      ("t19_bigram_surprisal",
        "Bigram-LM perplexity: bigram and context counts are partial-aggregable shuffles on derived keys (the LM 'train' IS the aggregation, contexts derived off the count table, not a second corpus pass); scoring equi-joins the per-doc bigram multiset to the two count tables (AQE broadcasts the model while small), vocab joins as a broadcast scalar, per-doc sorted fold, source rollup — no cross join beyond the 1-row vocab broadcast."),
      ("p06_token_budget_mix",
        "Token-budget mix: one partial-aggregable shuffle for per-source token totals, the |S|-row all-integer rate table broadcast back, membership a map-side fingerprint pmod predicate — assembling a 100 TB mix is a filtered scan."),
      ("q34_small_quantity_revenue",
        "Q17 correlated-avg shape: the per-part stats aggregate and the fact both shuffle on l_partkey (co-partitioned SMJ; the brand-narrowed fact is read twice — the canonical Q17 trade vs a materialization barrier); the 20%-of-avg gate is integer cross-multiplied, so the filter is exact in any engine."),
      ("t20_line_dedup",
        "Line-level dedup: ONE partial-aggregable line-frequency shuffle (map-side combine collapses per-partition repeats), removal decided by a line equi-join, then per-doc and per-source partial/final rollups — no cartesian anywhere, the d02 maxDf logic applies if one line dominates."),
      ("q35_volume_shipping",
        "Q7 shape: nation in TWO roles, both broadcast by the constant-cardinality hint and pre-narrowed by the IN-half of the pair predicate; supplier/customer unhinted (AQE); the fact shuffles on l_orderkey to meet orders, and the final aggregate carries <= 2x|years| groups."),
      ("d13_semantic_decontamination",
        "Semantic decontamination: the eval split is a corpus-sized query set, so probes are NOT broadcast — the train-side inverted lists and surviving (list, query) probes meet in a list_id equi-join (AQE broadcasts while small, shuffles at scale); assignment and probe cosines are native codegen'd against driver-fitted centroid literals; exact cosine >= tau verify on candidates only, result-identical to the brute eval x train join (spec + hash gate)."),
      ("r01_record_count",
        "Metadata-only count: ONE job whose input is (table, file) pairs — executors read parquet FOOTERS (no data pages, no per-table scan jobs), one <=|tables|-group sum; the scan-count form exists only as the spec's equality baseline."),
      ("s08_kcenter_coreset",
        "k-center coreset: greedy farthest-point selection runs driver-side on the bounded stride sample (a FIT, like s03's quantizer); the corpus pass is one map-side argmax-cosine scan against k broadcast centroid literals feeding a <=k-group partial/final aggregate — no join wider than the k-row center table."),
      ("q36_spend_deciles",
        "Exact global NTILE without a single-partition window: the per-customer aggregate range-repartitions on the sort key (RangePartitioning in the exchange), row_number runs per slice, and the per-slice counts (<= #partitions rows) take a bounded prefix-sum offset that broadcast-joins back; decile is all-integer arithmetic on the exact rank."),
      ("q37_table_profile",
        "Single-pass profile: ONE FileScan feeds an Expand (fan-out = #distinct-profiled columns) whose partial aggregates collapse before the shuffle — six exact distinct counts + null counts + the row count in one pass, unpivoted by stack into the long-form report."),
      ("d14_minhash_calibration",
        "Estimator calibration: candidates come from d03's single-sourced band-key equi-join (SHUFFLE_HASH, never all-pairs); signatures are map-side native expressions, and the 32-position compare + exact-overlap arithmetic run only on candidate rows."),
      ("q38_incremental_rollup",
        "Incremental rollup: the history side collapses to (type, day) partial aggregates before the union, so the merge shuffle carries state + delta-days rows — counts and integer-cent sums recombine exactly (no float drift), which is what lets maintenance replace a history rescan."),
      ("q39_snapshot_diff",
        "Snapshot diff: both versions fingerprint map-side, then ONE co-partitioned FULL OUTER sort-merge join on doc_id classifies added/removed/changed/same in a single pass — no second anti-join sweep — feeding a conditional-count rollup per source."),
      ("q26_cheapest_supplier",
        "Q2 correlated-MIN shape: the per-part min aggregate joins back on l_partkey ONLY (the price match is a post-join filter), so the aggregation exchange satisfies the join's partitioning at scale — no composite-key re-shuffle of the fact; dims are AQE's choice, nation broadcast by hint, hash joins everywhere (PlanAuditSpec pins no-SMJ + the bounded at-scale shuffle count)."),
      ("d15_paragraph_dedup",
        "Paragraph dedup: chunking and md5 fingerprints are map-side column ops; the canonical-doc table is one partial-aggregable min() shuffle on the fp; the removal decision is an fp equi-join (AQE-broadcast while small), then per-doc and per-source partial/final rollups — t20's plan shape at paragraph granularity."),
      ("t25_bpe_tokenize",
        "Tokenizer application: the trained merge rules fold into the projection as chained regexp_replace literals (broadcast-as-expression — no join, no state), symbol counts are length arithmetic, and the only exchange carries |sources| rollup rows; training cost is one word-count shuffle + a bounded driver digest, amortized across applications."),
      ("p08_quality_sample",
        "Quality-tiered sampling: all three integer rules and the tier CASE evaluate as codegen'd column expressions over one scan; membership is the fingerprint pmod predicate; one |sources|x4-group partial/final aggregate — sampling 100 TB by quality is a filtered scan."),
      ("s09_pq_ann",
        "PQ ANN: corpus encoded map-side against sub-centroid literals (argmin per subspace), per-query ADC tables broadcast (the plan's only join is that 8-row broadcast), approximate distance is a fold over code lookups, and top-3 rides the TopKPerGroup heap — no shuffle wider than k x |queries| rows."),
      ("m04_phash_neardup",
        "Perceptual-hash near-dup: the 63-bit byte-stream dHash evaluates as one codegen'd expression chain (the shared SQL text both engines run), bands explode x7, candidates come from the SHUFFLE_HASH (band, key) equi-join — exact for hamming <= 6 by pigeonhole — and the 1-word XOR verify touches candidate rows only."),
      ("q40_big_orders",
        "Q18 large-volume shape: the quantity rollup is the fact's one l_orderkey shuffle and the join-back keys on that same column, so the aggregate's partitioning satisfies the join (no composite-key re-shuffle — the q26 lesson applied from the start); orders/customer joins are AQE's choice; top-20 is TakeOrderedAndProject."),
      ("s10_ivfpq_ann",
        "IVF-PQ: the persisted IVF lists bound the touched vectors (list_id equi-join against broadcast probes — s03's own candidate join), PQ codes + broadcast ADC tables bound the per-vector cost, and the two TopKPerGroup heap stages (ADC shortlist, exact rescore) are the only wide operators; rescore >= probed population degenerates to exactly s03 (spec-pinned)."),
      ("q41_profit_by_nation",
        "Q9 profit star: the p_name LIKE filter is pushed to the part scan (the filtered slice joins before anything wide), nation broadcasts by the constant-dim hint, supplier is AQE's choice, and the fact shuffles once per fact-side equi-key into a <=|nations|x|years| rollup of integer cents."),
      ("q42_returned_top_customers",
        "Q10 returned-item shape: returnflag and the quarter window are both scan-pushed before the o_orderkey shuffle; the per-customer rollup keys on c_custkey so the dependent group columns ride one exchange; top-20 is TakeOrderedAndProject on integer cents."),
      ("q43_priority_shipping",
        "Q12 shape: the ship-year window reaches the lineitem scan, ONE o_orderkey exchange meets the header, the priority CASE evaluates map-side post-join, and the rollup carries <=|classes| all-integer groups."),
      ("q44_promo_share",
        "Q14 conditional share: the month window is scan-pushed so the part join touches a sliver of the fact (AQE broadcasts the survivor); promo and total cents come from the SAME single aggregation pass — the plan scans lineitem once and part once."),
      ("q45_supplier_count_by_class",
        "Q16 shape: the part-supplier relation is a map-side-combined DISTINCT over the fact (its one shuffle), the low-standing exclusion is a LEFT ANTI equi-join (never NOT IN's null-trapped nested loop), brand/type prune part before its join, and count(DISTINCT) re-shuffles only the surviving slice."),
      ("q46_top_supplier",
        "Q15 global argmax with ties: the quarter revenue view (the fact's one l_suppkey shuffle) is snapshotted once — |suppliers| rows — and BOTH the winner filter and the MAX branch read the materialization, so the fact appears in the final plan zero times; MAX broadcasts back as a 1-row filter and integer cents make tie equality exact."),
      ("t26_pmi_collocations",
        "PMI collocations: bigram and unigram counts are the two partial-agg shuffles; the three unigram-table references (c_u, c_w, totals) ride ReusedExchange instead of recomputation; totals join as a broadcast 1-row table; ordering on the ROUNDED score keeps the top-25 engine-portable."),
      ("p10_neardup_corpus",
        "Near-dup corpus build: p03's cleaned corpus feeds d03's band equi-join candidates + exact-Jaccard verify, components resolve by pointer-jumping rounds (O(log d), checkpointed), the canonical-keep rule is d01's lowest-id, and the report is one <=|lang|x|split|-group rollup — every stage the bucketed shape its gated primitive ships."),
      ("p11_leakage_repair",
        "Leakage repair: d10's distinct-shingle index (one shuffle) + left-semi probe decide the drop set; the repair join is a doc_id equi-join back to the prepared corpus and a <=3-group rollup — no new join geometry beyond the detector's."),
      ("s12_ann_ivf2",
        "Two-level IVF: level-1 cell ranking scans k1 ~ sqrt(nLists) broadcast cell centroids, the codebook join fans each probed cell to its k2 local centroids (per-query distance work = nCells x k2, never nLists), candidates come from the flat list_id equi-join against broadcast probes, and top-3 rides the TopKPerGroup heap — s03's serving shape with the nLists-linear stages removed."),
      ("m05_frame_reuse",
        "Frame-level clip reuse: fixed-cadence segment digests are map-side column work, (doc, digest) DISTINCT collapses within-asset repeats, candidates ride the SHUFFLE_HASH frame-digest equi-join (d09's containment shape on binary frames — never asset x asset), and the pair rollup partial-aggregates with the shared-frame floor as a post-agg filter."),
      ("s14_ann_pca",
        "Dimension-reduced ANN: the corpus projects once through the codegen'd graft_pca_project mat-vec, the per-pair shortlist distance is the codegen'd graft_sqdist over k dims (not d), the query set broadcasts, TopKPerGroup bounds the shortlist shuffle, and the exact-cosine rescore touches shortlist rows only."),
      ("p12_training_shards",
        "Training-shard export audit: tokenize (codegen'd graft_bpe_apply), epoch key, and shard id are all map-side projections over one documents scan; the ONE wide exchange is the shard shuffle feeding the per-shard window cumsum (co-located rows, no global barrier), and the rollup partial-aggregates to |shards| rows."),
      ("p13_score_sample",
        "Score-tiered sampling: the integer classifier score is t17's explode + one doc-keyed partial/final aggregate; the cut scores enter as driver literals (the boundary pass scored only the pushed-down stride sample), so tier + keep evaluate map-side and the final rollup carries |sources|x4 groups."),
      ("d16_benchmark_decontam",
        "External-benchmark decontamination: the corpus side collapses to ONE distinct-shingle index shuffle; the planted benchmark (tiny) explodes its shingles and meets the index in a left-semi equi-join (AQE broadcast), then a per-item containment rollup — d10's exact scoring tail with the whole corpus as the index."),
      ("d12b_semdedup_ivf",
        "Cluster-first SemDeDup: candidates are within-list pairs of the PERSISTED s03 assigned table via a (label, list_id) equi-join (never all-pairs), the exact cosine verify runs on candidates only, and the drop set left-joins back to the corpus for the per-label rollup."),
      ("s15_sq8_mips",
        "SQ8 MIPS: the corpus encodes map-side through the codegen'd graft_sq8_encode (scale is a folded literal), the broadcast query codes score through the codegen'd INTEGER graft_sq8_dot, and TopKPerGroup partial/final heaps bound the only shuffle to <= k rows per query per partition — s01's shape at a quarter of the bytes."),
      ("t29_vocab_growth",
        "Vocab growth curve: min-bucket-per-token is the one corpus-sized partial-agg shuffle (|vocab| rows out); per-bucket doc/occurrence counts partial-aggregate to <= 100 rows; both tiny tables fan out to their thresholds by sequence-explode and re-aggregate — no unpartitioned window, no nested-loop join."),
      ("d17_exact_substring",
        "Exact-substring dedup: every 63-char window hashes in ONE compiled pass per doc (d11's graft_winnow_fps with the winnow selection degenerated to k=1 — one shared hash definition), the per-position index meets itself in the SHUFFLE_HASH fingerprint equi-join (dfCapped stop-key path available for hot boilerplate spans), and the pair rollup partial-aggregates — exactness costs ~(K+1)/2 x d11's index DENSITY, never different join geometry."),
      ("q37b_profile_approx",
        "Approx profile: HLL++ sketches are mergeable partial aggregates, so the multi-column distinct profile is ONE scan + ONE plain partial/final aggregate with NO Expand — q37's #columns fan-out removed, which is the whole at-scale point; stack unpivots the single wide row into the report."),
      ("t30_novelty_scan",
        "Novelty scan: the shingle-df table is ONE partial-aggregable shuffle over d02's exploded index, the df join back is SHUFFLE_HASH on the shingle hash (the Generate output defeats sort-merge sizing), and the per-doc + per-source rollups are all-integer partial aggregates — memorization triage at the cost of one extra aggregation over the dedup index."),
      ("p16_span_layout",
        "Chunk-span mask table: offsets ride the export's one shard shuffle + per-shard window (co-located rows), the doc→chunks explode emits |docs|+|chunks| rows (never tokens), and the span arithmetic is map-side greatest/least on longs — the attention-mask table costs nothing beyond the layout pass that already ran."),
      ("s17_sq8_recall",
        "SQ8 recall audit: the exact reference side is one broadcast-queries x corpus pass through the codegen'd graft_dot into the TopKPerGroup heap (s01's shape on raw inner product); the SQ8 side is s15 unchanged; the audit itself is a |queries|x3-row left join + rollup — quality measurement costs two scans, no new geometry."),
    ).map { case (name, note) => (name, note, name) }

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence for SURVEY §5\n\n")
    sb.append(s"Generated by `graft.PlanDump` at `$sfDir`. Plans are AQE-final.\n")
    cases.foreach { case (name, note, key) =>
      val df: DataFrame = SparkEntry.queries(key)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
