package graft

import graft.functions.{TextFunctions => TF, TextSql => TS, VectorSql => VS}
import graft.operators.{Dedup, Pipelines, Similarity, TextAnalysis}

/** SHARED-INTERMEDIATE oracle forms for the heavy-oracle family (round
  * 14, verdict item 2): at docs16x the 22 heavy entries' standalone
  * DuckDB mirrors cost 34–287 s at docs4x and ~16× that at 16× — but
  * the cost is largely SELF-INFLICTED: d02/d07/d08/d09/d18/d21 each
  * re-derive the same inverted-index pair join, d03/d14 the same
  * minhash band join, d07/d21 the same recursive component fixpoint,
  * and s19/s25/s26 the same |V|² exact k-NN graph — and DuckDB inlines
  * a CTE per reference, so even within ONE query the chain can run
  * twice. This object factors each shared chain into a named
  * intermediate (materialized once per gate run as a DuckDB temp
  * table) and re-expresses each mirror against it.
  *
  * EQUIVALENCE DISCIPLINE: every fragment here is interpolated from
  * the SAME Scala constants and [[graft.functions.TextSql]] /
  * [[graft.functions.VectorSql]] helpers as the standalone
  * `SparkEntry.oracleSql` entries (minhash coefficients, band count,
  * thresholds, residue classes), and the CTE bodies are the standalone
  * texts verbatim with only the shared block replaced by a table
  * reference — plus the gate script re-verifies shared ≡ standalone
  * output hash per query at the smaller SFs before any 16× run is
  * trusted. The driver's own per-round gate keeps using the standalone
  * `oracle_sql.json` unchanged; these forms exist for the scale ladder.
  *
  * Layout: [[prelude]] is an ORDERED list of (table, SELECT) — later
  * tables read earlier ones — and [[queries]] maps the rewritten
  * entries (same result schema/ordering as their standalone twins).
  * [[direct]] lists the heavy entries that stay standalone (their
  * mirrors are near-linear and share no chain worth materializing). */
object OracleShared {
  private val P = TF.HashMod
  private val toks = TS.toks
  private val sh = TS.shingleHashes(toks)
  private val sigSql = Dedup.minhashA.zip(Dedup.minhashB).map { case (a, b) =>
    s"list_min(list_transform(sh, s -> (s*$a + $b) % $P))"
  }.mkString("[", ",\n              ", "]")
  private val jac = "shared / (ni + nj - shared)"
  private val split =
    s"""CASE WHEN (${TS.polyFingerprint(toks)}) % 100 < 80 THEN 'train'
             WHEN (${TS.polyFingerprint(toks)}) % 100 < 90 THEN 'val'
             ELSE 'test' END"""
  // the minhash band+candidate chain over a (doc_id, sh, sig) relation
  private def candOver(sigRel: String): String =
    s"""WITH bands AS (SELECT doc_id, j,
              sig[CAST(2*j+1 AS INT)]*$P + sig[CAST(2*j+2 AS INT)] AS key
            FROM $sigRel, generate_series(0, 15) AS t(j))
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
        FROM bands a JOIN bands b
        ON a.j = b.j AND a.key = b.key AND a.doc_id < b.doc_id"""
  // the connected-component fixpoint over a (doc_i, doc_j) pair relation
  private def labOver(pairSql: String): String =
    s"""WITH RECURSIVE p AS ($pairSql),
            e AS (SELECT doc_i AS s, doc_j AS t FROM p
                  UNION SELECT doc_j, doc_i FROM p),
            r(s, t) AS (SELECT s, t FROM e
                        UNION SELECT r.s, e.t FROM r JOIN e ON r.t = e.s)
        SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster FROM r GROUP BY s"""

  /** Ordered (tableName, selectSql): `CREATE TEMP TABLE <name> AS <sql>`. */
  def prelude: Seq[(String, String)] = {
    val langs = Pipelines.CleanLangs.map(l => s"'$l'").mkString(", ")
    Seq(
      // d02/d03/d07/d08/d09/d14/d18's `d` CTE (+ source for t30's twin)
      "g_dsh" ->
        s"""SELECT doc_id, source, $sh AS sh
            FROM documents WHERE len($toks) >= 3""",
      // the exploded inverted index — d02-family `ex` + t30's df rows
      "g_ex" ->
        "SELECT doc_id, source, len(sh) AS n, unnest(sh) AS h FROM g_dsh",
      // THE pair join (the quadratic term every jaccard mirror pays)
      "g_pairs" ->
        s"""SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
              a.n AS ni, b.n AS nj, COUNT(*) AS shared
            FROM g_ex a JOIN g_ex b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4""",
      // minhash signatures + band-join candidates (d03/d14)
      "g_sig" -> s"SELECT doc_id, sh, $sigSql AS sig FROM g_dsh",
      "g_cand" -> candOver("g_sig"),
      // component labels (d07/d21); p = d07CcCtes' HAVING, off g_pairs
      "g_lab" -> labOver(
        s"SELECT doc_i, doc_j FROM g_pairs WHERE $jac >= 0.2"),
      // the exact corpus k-NN graph — s19's output relation (s25/s26 twins)
      "g_knn3" ->
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings),
            s AS (SELECT query_id, e.vec_id AS neighbor_id,
                    ${VS.cosine("qv", "e.embedding")} AS cos
                  FROM embeddings e, q WHERE e.vec_id <> query_id),
            r AS (SELECT query_id, neighbor_id, cos,
                    ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY round(cos, 6) DESC, neighbor_id) AS rk
                  FROM s)
            SELECT query_id, rk, neighbor_id, round(cos, 4) AS cosine
            FROM r WHERE rk <= 3""",
      // d10/p11's split-annotated shingle relation
      "g_split" ->
        s"""SELECT doc_id, $split AS split, $sh AS sh
            FROM documents WHERE len($toks) >= 3""",
      // p10's chain over the CLEANED corpus (its own pair set + labels)
      "p10_c" ->
        s"""WITH q AS (
              SELECT doc_id, lang, source, text
              FROM documents
              WHERE lang IN ($langs)
                AND len($toks) >= ${Pipelines.CleanMinTokens}
                AND ${Pipelines.oracleQualitySql} >= ${Pipelines.CleanMinQuality})
            SELECT doc_id, lang, source, text
            FROM q
            QUALIFY doc_id = min(doc_id) OVER (PARTITION BY
              md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))))""",
      "p10_d" -> s"SELECT doc_id, $sh AS sh FROM p10_c WHERE len($toks) >= 3",
      "p10_sig" -> s"SELECT doc_id, sh, $sigSql AS sig FROM p10_d",
      "p10_cand" -> candOver("p10_sig"),
      "p10_v" ->
        s"""SELECT doc_i, doc_j FROM p10_cand cand
            JOIN p10_d x ON x.doc_id = cand.doc_i
            JOIN p10_d y ON y.doc_id = cand.doc_j
            WHERE len(list_intersect(x.sh, y.sh)) /
              (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.2""",
      "p10_lab" -> labOver("SELECT doc_i, doc_j FROM p10_v")
    )
  }

  /** Heavy entries re-expressed against [[prelude]] — same schema and
    * ORDER BY as their `SparkEntry.oracleSql` twins. */
  def queries: Map[String, String] = Map(
    "d02_ngram_jaccard" ->
      s"""SELECT doc_i, doc_j, round($jac, 4) AS jaccard
          FROM g_pairs WHERE $jac >= 0.2 ORDER BY doc_i, doc_j""",
    "d18_incremental_neardup" ->
      s"""SELECT doc_i, doc_j, round($jac, 4) AS jaccard
          FROM g_pairs WHERE $jac >= 0.2
            AND (doc_i % ${Dedup.IncrementalNewMod} = ${Dedup.IncrementalNewRem}
              OR doc_j % ${Dedup.IncrementalNewMod} = ${Dedup.IncrementalNewRem})
          ORDER BY doc_i, doc_j""",
    "d09_containment" ->
      s"""WITH dir AS (SELECT doc_i AS contained, doc_j AS container,
              shared / ni AS c FROM g_pairs
            UNION ALL
            SELECT doc_j, doc_i, shared / nj FROM g_pairs)
          SELECT contained, container, round(c, 4) AS containment
          FROM dir WHERE c >= 0.4
          ORDER BY contained, container""",
    "d08_neardup_by_source" ->
      s"""WITH pr AS (SELECT doc_i, doc_j, $jac AS jaccard
                 FROM g_pairs WHERE $jac >= 0.2)
          SELECT least(si.source, sj.source) AS src_a,
            greatest(si.source, sj.source) AS src_b,
            COUNT(*) AS n_pairs, ROUND(AVG(jaccard), 4) AS avg_jaccard
          FROM pr JOIN documents si ON pr.doc_i = si.doc_id
                  JOIN documents sj ON pr.doc_j = sj.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2""",
    "d03_minhash_lsh" ->
      s"""WITH v AS (SELECT doc_i, doc_j,
              len(list_intersect(x.sh, y.sh)) /
                (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jac
            FROM g_cand cand JOIN g_dsh x ON x.doc_id = cand.doc_i
                             JOIN g_dsh y ON y.doc_id = cand.doc_j)
          SELECT doc_i, doc_j, round(jac, 4) AS jaccard FROM v WHERE jac >= 0.2
          ORDER BY doc_i, doc_j""",
    "d14_minhash_calibration" ->
      s"""SELECT doc_i, doc_j,
            CAST(list_sum(list_transform(generate_series(1, 32),
              i -> CASE WHEN x.sig[CAST(i AS INT)] = y.sig[CAST(i AS INT)]
                   THEN 1 ELSE 0 END)) AS BIGINT) AS est_matches,
            CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS shared,
            CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))
              AS BIGINT) AS uni
          FROM g_cand cand JOIN g_sig x ON x.doc_id = cand.doc_i
                           JOIN g_sig y ON y.doc_id = cand.doc_j
          ORDER BY doc_i, doc_j""",
    "d07_dup_clusters" ->
      s"""SELECT cluster AS cluster_id, COUNT(*) AS n_docs,
            MAX(doc_id) AS max_doc
          FROM g_lab GROUP BY cluster ORDER BY cluster_id""",
    "d21_quality_canonical" ->
      s"""WITH q AS (
            SELECT doc_id,
              ${TS.markerHits(toks, TF.stopwords)} * 1000000
                // len($toks) AS q_ppm
            FROM documents WHERE len($toks) >= 3),
          lq AS (
            SELECT lab.cluster, lab.doc_id, q.q_ppm,
              ROW_NUMBER() OVER (PARTITION BY lab.cluster
                ORDER BY q.q_ppm DESC, lab.doc_id ASC) AS rn
            FROM g_lab lab JOIN q USING (doc_id))
          SELECT cluster AS cluster_id, COUNT(*) AS n_docs,
            MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc,
            MAX(CASE WHEN rn = 1 THEN q_ppm END) AS canonical_q_ppm
          FROM lq GROUP BY cluster ORDER BY cluster_id""",
    "s19_knn_graph" ->
      """SELECT query_id, rk, neighbor_id, cosine
         FROM g_knn3 ORDER BY query_id, rk""",
    "s26_knn_outlier" ->
      s"""WITH m AS (SELECT query_id,
                SUM(CAST(ROUND(cosine * 10000) AS BIGINT)) AS iso
              FROM g_knn3 GROUP BY 1)
          SELECT e.label, COUNT(*) AS n_vecs,
            CAST(SUM(CASE WHEN m.iso < ${Similarity.S26IsolationMicro}
              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
            CAST(CASE WHEN SUM(m.iso) >= 0 THEN SUM(m.iso) // COUNT(*)
              ELSE -((-SUM(m.iso)) // COUNT(*)) END AS BIGINT)
              AS mean_iso_micro
          FROM embeddings e JOIN m ON e.vec_id = m.query_id
          GROUP BY 1 ORDER BY 1""",
    "s25_label_prop" ->
      s"""WITH g AS (SELECT query_id, neighbor_id FROM g_knn3),
          l0 AS (SELECT vec_id, label AS plabel, 0 AS round
                 FROM embeddings WHERE vec_id % ${Similarity.S25SeedMod} = 0),
          c1 AS (SELECT g.query_id, l.plabel, COUNT(*) AS c
                 FROM g JOIN l0 l ON g.neighbor_id = l.vec_id
                 WHERE g.query_id NOT IN (SELECT vec_id FROM l0)
                 GROUP BY 1, 2),
          p1 AS (SELECT query_id, plabel, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY c DESC, plabel ASC) AS rn
                 FROM c1),
          l1 AS (SELECT * FROM l0 UNION ALL
                 SELECT query_id, plabel, 1 FROM p1 WHERE rn = 1),
          c2 AS (SELECT g.query_id, l.plabel, COUNT(*) AS c
                 FROM g JOIN l1 l ON g.neighbor_id = l.vec_id
                 WHERE g.query_id NOT IN (SELECT vec_id FROM l1)
                 GROUP BY 1, 2),
          p2 AS (SELECT query_id, plabel, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY c DESC, plabel ASC) AS rn
                 FROM c2),
          l2 AS (SELECT * FROM l1 UNION ALL
                 SELECT query_id, plabel, 2 FROM p2 WHERE rn = 1)
          SELECT l2.plabel AS label,
            CAST(SUM(CASE WHEN l2.round = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_seed,
            CAST(SUM(CASE WHEN l2.round > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_propagated,
            CAST(SUM(CASE WHEN l2.round > 0 AND l2.plabel = e.label
              THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
            CAST(SUM(CASE WHEN l2.round > 0 AND l2.plabel = e.label
              THEN 1 ELSE 0 END) * 1000000
              // GREATEST(1, SUM(CASE WHEN l2.round > 0 THEN 1 ELSE 0 END))
              AS BIGINT) AS acc_ppm
          FROM l2 JOIN embeddings e ON l2.vec_id = e.vec_id
          GROUP BY 1 ORDER BY 1""",
    "d10_cross_split_leakage" ->
      s"""WITH tr AS (SELECT DISTINCT unnest(sh) AS h FROM g_split
                 WHERE split = 'train'),
          te AS (SELECT doc_id, split, len(sh) AS n_shingles, unnest(sh) AS h
                 FROM g_split WHERE split <> 'train'),
          lk AS (SELECT doc_id, split, n_shingles, COUNT(*) AS n_leaked
                 FROM te WHERE h IN (SELECT h FROM tr)
                 GROUP BY 1, 2, 3)
          SELECT doc_id, split, n_shingles, n_leaked,
            round(n_leaked / CAST(n_shingles AS DOUBLE), 4) AS contamination
          FROM lk WHERE n_leaked / CAST(n_shingles AS DOUBLE) >= ${Pipelines.RepairTau}
          ORDER BY doc_id""",
    "p11_leakage_repair" ->
      s"""WITH tr AS (SELECT DISTINCT unnest(sh) AS h FROM g_split
                 WHERE split = 'train'),
          te AS (SELECT doc_id, split, len(sh) AS n_shingles, unnest(sh) AS h
                 FROM g_split WHERE split <> 'train'),
          lk AS (SELECT doc_id FROM (
                   SELECT doc_id, n_shingles, COUNT(*) AS n_leaked
                   FROM te WHERE h IN (SELECT h FROM tr)
                   GROUP BY 1, 2)
                 WHERE n_leaked / CAST(n_shingles AS DOUBLE) >= ${Pipelines.RepairTau})
          SELECT split,
            CAST(COUNT(*) AS BIGINT) AS n_docs_before,
            CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM lk)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
            CAST(COUNT(*) - SUM(CASE WHEN doc_id IN (SELECT doc_id FROM lk)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_after
          FROM g_split GROUP BY split ORDER BY split""",
    "t30_novelty_scan" ->
      s"""WITH f AS (SELECT h, COUNT(*) AS df FROM g_ex GROUP BY h),
          pd AS (
            SELECT doc_id, source, COUNT(*) AS n_sh,
              SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_unique
            FROM g_ex JOIN f USING (h) GROUP BY 1, 2),
          fl AS (
            SELECT source, n_sh, n_unique,
              CASE WHEN (CAST(n_unique AS BIGINT) * 1000000)
                     // CAST(n_sh AS BIGINT) < ${TextAnalysis.NoveltyFlagPpm}
                   THEN 1 ELSE 0 END AS flag
            FROM pd)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(flag) AS BIGINT) AS n_flagged,
            CAST(SUM(n_sh) AS BIGINT) AS sh_total,
            CAST(SUM(n_unique) AS BIGINT) AS sh_unique,
            (CAST(SUM(n_unique) AS BIGINT) * 1000000)
              // CAST(SUM(n_sh) AS BIGINT) AS novelty_ppm
          FROM fl GROUP BY 1 ORDER BY 1""",
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
          corpus AS (SELECT DISTINCT h FROM g_ex),
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
    "p10_neardup_corpus" ->
      s"""WITH sdoc AS (
            SELECT doc_id, lang, source, $split AS split FROM p10_c),
          drops AS (SELECT doc_id FROM p10_lab WHERE cluster <> doc_id),
          k AS (SELECT sdoc.lang, sdoc.split, sdoc.source,
              CASE WHEN drops.doc_id IS NULL THEN 0 ELSE 1 END AS is_dup
            FROM sdoc LEFT JOIN drops ON sdoc.doc_id = drops.doc_id)
          SELECT lang, split,
            CAST(SUM(1 - is_dup) AS BIGINT) AS n_docs,
            CAST(SUM(is_dup) AS BIGINT) AS n_neardup_dropped,
            COUNT(DISTINCT CASE WHEN is_dup = 0 THEN source END) AS n_sources
          FROM k GROUP BY 1, 2 ORDER BY 1, 2"""
  )

  /** Heavy entries left standalone (near-linear mirrors, nothing shared
    * worth materializing) — the gate runs them from `oracle_sql.json`. */
  val direct: Seq[String] = Seq("d06_simhash_pairs", "d13_semantic_decontamination",
    "t06_bigram_counts", "t11_repetition_filter", "t19_bigram_surprisal",
    "t26_pmi_collocations")
}
