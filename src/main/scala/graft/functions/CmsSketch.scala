package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Portable count-min sketch over token streams.
  *
  * The sketch is a depth×width counter grid; every token instance
  * increments one counter per row (universal hash per row), and a point
  * estimate is the min over rows — an upper bound on the true count with
  * error ≤ εN. The aggregation buffer is a single fixed 4×1024 long
  * array (32 KB): at 100 TB each partition reduces its billions of
  * token instances map-side into one buffer and the shuffle carries one
  * buffer per partition — the canonical sketch trade of memory for a
  * full groupBy's linear shuffle.
  *
  * All hashing is the portable tokenVal (codepoint-based, SURVEY §6)
  * composed with (a·v + b) mod P mod width — counter-for-counter
  * reproducible in DuckDB SQL, so the sketch itself is oracle-gated
  * (sums are commutative: partitioning never changes the counters).
  */
object CmsSketch {
  val Depth = 4
  val Width = 1024
  val P: Long = ShingleHashUtil.P

  /** Per-row universal-hash params, same schedule family as MinHash. */
  val A: Array[Long] = (1 to Depth).map(i => (1103515245L * i) % P).toArray
  val B: Array[Long] = (1 to Depth).map(i => (12345L * i + 6789L) % P).toArray

  /** Codepoint tokenVal on a JVM String — mirrors
    * [[ShingleHashUtil.tokenVal]] / TextSql.tokenVal. */
  def tokenValString(s: String): Long = {
    if (s == null || s.isEmpty) 0L
    else {
      val len = s.codePointCount(0, s.length).toLong
      len * 961L + s.codePointAt(0).toLong * 31L + s.codePointBefore(s.length).toLong
    }
  }

  def bucket(d: Int, tokenVal: Long): Int =
    (((tokenVal * A(d) + B(d)) % P) % Width).toInt

  private class CmsAgg extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](Depth * Width)
    override def reduce(buf: Array[Long], tok: String): Array[Long] = {
      val tv = tokenValString(tok)
      var d = 0
      while (d < Depth) { buf(d * Width + bucket(d, tv)) += 1L; d += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Aggregate column: array<string>-exploded token column → 4096-long
    * sketch. Usage: df.agg(CmsSketch.cms(col("token"))). */
  def cms(token: Column): Column = udaf(new CmsAgg, Encoders.STRING)(token)
}
