package graft

/** Structural pins for the shared-intermediate oracle forms. The REAL
  * equivalence gate is DuckDB-side (`scripts/check_heavy.py
  * --selfcheck` hash-compares shared vs standalone per query, run at
  * sf0.01 and docs4x before any 16x gate) — this spec pins what the
  * JVM can see: the rewritten set is exactly the r13 docs16x
  * heavy-oracle exclusion list, every entry has a standalone twin to
  * be checked against, and the prelude is well-formed. */
class OracleSharedSpec extends GraftSuite {

  private val r13Exclusions = Set(
    "s25_label_prop", "d21_quality_canonical", "d07_dup_clusters",
    "s26_knn_outlier", "s19_knn_graph", "p10_neardup_corpus",
    "d09_containment", "d14_minhash_calibration", "t30_novelty_scan",
    "d02_ngram_jaccard", "d18_incremental_neardup", "d03_minhash_lsh",
    "d08_neardup_by_source", "p11_leakage_repair",
    "d10_cross_split_leakage", "d16_benchmark_decontam",
    "t11_repetition_filter", "t19_bigram_surprisal", "d06_simhash_pairs",
    "t26_pmi_collocations", "t06_bigram_counts",
    "d13_semantic_decontamination")

  test("rewritten + direct covers exactly the r13 heavy exclusion list") {
    val covered = OracleShared.queries.keySet ++ OracleShared.direct
    assert(covered === r13Exclusions,
      s"missing=${r13Exclusions -- covered} extra=${covered -- r13Exclusions}")
    assert(OracleShared.queries.keySet.intersect(OracleShared.direct.toSet).isEmpty)
  }

  test("every shared entry has a standalone twin and a sane prelude") {
    val oracle = SparkEntry.oracleSql
    (OracleShared.queries.keySet ++ OracleShared.direct).foreach { k =>
      assert(oracle.contains(k), s"$k has no standalone oracle to verify against")
    }
    val names = OracleShared.prelude.map(_._1)
    assert(names.distinct === names, "duplicate prelude table")
    // later tables may reference earlier ones, never the reverse
    OracleShared.prelude.zipWithIndex.foreach { case ((name, sql), i) =>
      val later = OracleShared.prelude.drop(i + 1).map(_._1)
      later.foreach(l => assert(!sql.contains(l),
        s"prelude $name references later table $l"))
    }
    // every rewritten query reads at least one prelude table
    OracleShared.queries.foreach { case (k, sql) =>
      assert(names.exists(sql.contains), s"$k references no shared table")
    }
  }
}
