package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (Array[Float] embedding) column builders.
  *
  * Pure Catalyst higher-order-function expressions — no UDFs — so scoring
  * stays inside whole-stage codegen and distributes as map-side work over
  * the 100 TB embeddings side. Elements are cast to double BEFORE any
  * arithmetic and folded strictly left-to-right, matching the
  * [[VectorSql]] DuckDB fragments bit-for-bit (float→double widening and
  * IEEE double ops are exact and order-fixed in both engines).
  */
object VectorFunctions {

  /** Strict left-fold dot product in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity — the native codegen'd expression
    * ([[CosineSimExpr]]); value-identical to [[cosineDeclarative]]
    * (same fold order), ~10x faster per pair (compiled loop vs
    * interpreted HOF tree). */
  def cosine(a: Column, b: Column): Column = NativeFunctions.cosine(a, b)

  /** Declarative HOF form kept as the parity reference for the spec. */
  def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket over `bits` deterministic pseudo-hyperplanes: bit i
    * is set when v[2i+1] > v[2i+33] (1-indexed), i.e. the sign of the
    * projection onto e_{2i+1} - e_{2i+33}. 2^bits buckets; an equi-join
    * on the bucket id replaces the O(n²) cross join — the ANN scale path.
    *
    * SIZING RULE: the number of buckets must grow with the corpus —
    * with B buckets an n-row corpus pairs ~n/B rows per bucket, so for a
    * target per-bucket candidate set c choose bits ≈ log2(n/c) (≈√n
    * buckets balances bucket count against bucket size). The default 8
    * bits is right for the 10³–10⁶ test range; at 100 TB (~10¹¹ vectors)
    * use 20+ bits, which this encoding supports up to the vector
    * dimension budget (bit i reads elements 2i+1 and 2i+33, so d-dim
    * vectors support (d-33)/2+1 bits — 16 for the 64-dim testdata; wider
    * vectors or a second hash family extend it).
    *
    * Out-of-range reads go through [[try_element_at]] so a shorter vector
    * yields NULL comparisons → bit 0, exactly DuckDB's out-of-bounds
    * `v[i] → NULL` behavior — instead of an ANSI
    * ARRAY_INDEX_OUT_OF_BOUNDS crash. Vectors with too few dims thus
    * degrade to fewer effective hash bits rather than failing the query
    * or diverging from the oracle. */
  def signBucket(v: Column, bits: Int = 8): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc + when(
        try_element_at(v, (i * lit(2) + lit(1)).cast("int")) >
          try_element_at(v, (i * lit(2) + lit(33)).cast("int")),
        pow(2.0, i).cast("long")).otherwise(lit(0L)))

  /** Table-`t` member of a FAMILY of sign-LSH hashes for multi-table
    * ANN ([[graft.operators.Similarity.s05AnnMultiTable]]): bit i
    * compares v[(2i+7t) mod 64 + 1] with v[(2i+32+7t) mod 64 + 1], so
    * each table reads a 7-rotated pattern of coordinate pairs and the
    * per-bit agreement events are (near-)independent across tables —
    * the property multi-table recall amplification needs. Table 0 with
    * bits ≤ 16 reads exactly [[signBucket]]'s pairs (2i+1, 2i+33).
    * The mod-64 wrap assumes the 64-dim testdata embedding; shorter
    * vectors degrade per-bit to 0 via [[try_element_at]] exactly like
    * [[signBucket]]. */
  def signBucketT(v: Column, bits: Int, table: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc + when(
        try_element_at(v, (pmod(i * lit(2) + lit(7 * table), lit(64)) + lit(1)).cast("int")) >
          try_element_at(v, (pmod(i * lit(2) + lit(32 + 7 * table), lit(64)) + lit(1)).cast("int")),
        pow(2.0, i).cast("long")).otherwise(lit(0L)))
}

/** DuckDB SQL fragments mirroring [[VectorFunctions]] expression-for-
  * expression (same double widening, same fold order). */
object VectorSql {

  def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(generate_series(1, len($a)),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (acc, v) -> acc + v)"""

  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

  def signBucket(v: String, bits: Int = 8): String =
    s"""list_sum(list_transform(generate_series(0, ${bits - 1}),
        i -> CASE WHEN $v[CAST(i*2+1 AS INT)] > $v[CAST(i*2+33 AS INT)]
                  THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))"""

  /** Mirror of [[VectorFunctions.signBucketT]]; `t` is a SQL expression
    * (column or literal) for the table index. */
  def signBucketT(v: String, bits: Int, t: String): String =
    s"""list_sum(list_transform(generate_series(0, ${bits - 1}),
        i -> CASE WHEN $v[CAST((i*2 + 7*($t)) % 64 + 1 AS INT)]
                     > $v[CAST((i*2 + 32 + 7*($t)) % 64 + 1 AS INT)]
                  THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END))"""
}
