package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout maintenance: Z-order clustering for multi-column scan
  * pruning. Parquet (and every table format over it) prunes files and
  * row groups by min/max stats; stats only help when values are
  * clustered. Sorting by one column clusters that column alone —
  * interleaving the bits of two columns (a Morton / Z-value) and
  * range-partitioning + sorting by it clusters BOTH, so selective
  * filters on either column skip most files. At 100 TB this is the
  * difference between a full scan and reading a few percent for
  * point-ish predicates on secondary dimensions. */
object Layout {

  /** Morton Z-value of two pre-normalized integer columns in
    * [0, 2^bits): bit i of `a` lands at 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Min/max-normalize a numeric column to [0, 2^bits). */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = math.max(hi - lo, 1e-12)
    least(lit((1 << bits) - 1),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit((1 << bits) - 1)).cast("long"))
  }

  /** Rewrite `df` into `nFiles` parquet files Z-ordered on (c1, c2).
    * One stats pass (tiny agg), one range shuffle; files carry tight
    * min/max on BOTH columns. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, outDir: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).collect().head
    val z = zValue(
      normalize(col(c1), r.getDouble(0), r.getDouble(1), bits),
      normalize(col(c2), r.getDouble(2), r.getDouble(3), bits), bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(outDir)
  }
}
