package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text-hash / tokenization column builders.
  *
  * Everything here is a pure Catalyst expression tree — no UDFs, no Scala
  * closures at row scope — so plans stay inside whole-stage codegen and
  * scale to the 100 TB documents table as map-side column work. All hashes
  * use explicit integer arithmetic mod 1e9+7 (never engine hash builtins)
  * so the DuckDB oracle reproduces values exactly (SURVEY §6).
  *
  * Mirrors of these expressions as DuckDB SQL fragments live in
  * [[TextSql]]; keep the two in lockstep.
  */
object TextFunctions {

  val HashMod = 1000000007L

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Portable per-token value: length*961 + ascii(first)*31 + ascii(last).
    * Cheap, deterministic, and identical in DuckDB — collisions only merge
    * hash buckets, which every consumer tolerates. */
  def tokenVal(t: Column): Column =
    length(t) * lit(961) + ascii(t) * lit(31) + ascii(reverse(t))

  /** Left-fold polynomial fingerprint over per-token values (Rabin–Karp
    * style; reference: the record-identity checks hadoop-stuff does by
    * re-scanning batches, RecordFinderMap.java:50). */
  def polyFingerprint(toks: Column): Column =
    aggregate(transform(toks, tokenVal(_)), lit(0L),
      (acc, v) => (acc * lit(31L) + v) % lit(HashMod))

  /** Number of n-token line chunks of a token array: ceil(len/n).
    * Single source of the chunking arithmetic shared by t14 (Gopher
    * line rules) and t20 (line dedup) — mirrored in [[TextSql]]. */
  def chunkCount(toks: Column, n: Int): Column =
    floor((size(toks) + lit(n - 1)) / lit(n.toDouble)).cast("long")

  /** The j-th (1-based) n-token chunk of a token array, space-joined. */
  def tokenChunk(toks: Column, j: Column, n: Int): Column =
    array_join(slice(toks, (j * lit(n) - lit(n - 1)).cast("int"), lit(n)), " ")

  /** Per-token values of a token array, as longs. Materialize this as its
    * own column before building shingles: referencing the transform three
    * times inside the shingle lambda would re-evaluate the tokenization
    * per element access (CollapseProject inlines single-use aliases). */
  def tokenVals(toks: Column): Column = transform(toks, t => tokenVal(t).cast("long"))

  /** Distinct word-3-gram shingle hashes over a PREcomputed token-value
    * array ([[tokenVals]]): (v1*1000003 + v2*31 + v3) mod P. Requires
    * size >= 3 — callers filter first (Spark `sequence(1, n)` turns
    * DESCENDING for n < 1, unlike DuckDB generate_series → empty). */
  def shingleHashesFromVals(tv: Column): Column =
    array_distinct(transform(sequence(lit(1), size(tv) - lit(2)),
      i => (element_at(tv, i) * lit(1000003L)
        + element_at(tv, i + lit(1)) * lit(31L)
        + element_at(tv, i + lit(2))) % lit(HashMod)))

  /** Distinct word-3-gram shingle hashes straight off the token array.
    * Prefer the [[tokenVals]] + [[shingleHashesFromVals]] split in plans —
    * this single-expression form re-derives each token value per shingle. */
  def shingleHashes(toks: Column): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - lit(2)),
      i => (tokenVal(element_at(toks, i)) * lit(1000003L)
        + tokenVal(element_at(toks, i + lit(1))) * lit(31L)
        + tokenVal(element_at(toks, i + lit(2)))) % lit(HashMod)))

  /** Distinct word-3-gram shingle strings (for set-based Jaccard). */
  def shingles(toks: Column): Column =
    array_distinct(transform(sequence(lit(1), size(toks) - lit(2)),
      i => concat_ws(" ", slice(toks, i, lit(3)))))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  /** Language-marker token lists for the n-gram/stopword language
    * heuristic. Markers chosen to be disjoint across languages. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "fast", "slow"),
    "es" -> Seq("el", "la", "los", "las", "una"),
    "de" -> Seq("der", "die", "das", "und", "ein"))

  def markerHits(toks: Column, language: String): Column =
    size(filter(toks, t => t.isin(langMarkers(language): _*)))
}

/** DuckDB SQL fragments mirroring [[TextFunctions]] expression-for-
  * expression, used to assemble oracle SQL. Integer fold order and mod
  * points match exactly so values agree bit-for-bit. */
object TextSql {
  val toks = "regexp_split_to_array(trim(text), '\\s+')"

  def tokenVal(t: String): String =
    s"(length($t)*961 + ascii($t)*31 + ascii(reverse($t)))"

  def polyFingerprint(toks: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform($toks, t -> ${tokenVal("t")})),
        (acc, v) -> (acc*31 + v) % 1000000007)"""

  def shingleHashes(toks: String): String =
    s"""list_distinct(list_transform(generate_series(1, len($toks)-2),
        i -> (${tokenVal(s"$toks[i]")}*1000003
            + ${tokenVal(s"$toks[i+1]")}*31
            + ${tokenVal(s"$toks[i+2]")}) % 1000000007))"""

  def shingles(toks: String): String =
    s"""list_distinct(list_transform(generate_series(1, len($toks)-2),
        i -> array_to_string($toks[i:i+2], ' ')))"""

  def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  def markerHits(toks: String, words: Seq[String]): String =
    s"len(list_filter($toks, t -> list_contains(${inList(words)}, t)))"

  /** Mirrors of [[TextFunctions.chunkCount]]/[[TextFunctions.tokenChunk]]. */
  def chunkCount(toks: String, n: Int): String =
    s"CAST(floor((len($toks) + ${n - 1}) / $n.0) AS BIGINT)"

  def tokenChunk(toks: String, j: String, n: Int): String =
    s"array_to_string($toks[CAST($j*$n-${n - 1} AS INT) : CAST($j*$n AS INT)], ' ')"
}
