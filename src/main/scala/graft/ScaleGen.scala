package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the RELATIONAL gate (round 12):
  * replicates the TPC-H-ish star schema N× with key-space-shifted
  * replicas, so section A can be gated and benched at sf1 (~6M lineitem
  * rows) even though the driver testdata stops at sf0.1 — the regime
  * where AQE's broadcast-vs-shuffle decisions flip and exchange-reuse
  * regressions actually show.
  *
  * Replication discipline (ScaleProbe's rule, applied to a star
  * schema): every replica i shifts each FK/PK family by i × (max key +
  * 1), so replicas are disjoint, join cardinalities scale linearly, and
  * per-replica relational structure is IDENTICAL to the base — a
  * linear-shaped query should time ~N×, a broadcast-side dim stays a
  * dim. region/nation are the constant-cardinality dims (the
  * broadcastableDims contract) and are copied unshifted; documents/
  * embeddings are copied verbatim (the document operators have their
  * own ScaleProbe — this tool feeds the RELATIONAL gate). Timestamps
  * are read raw and never cast, so the parquet physical type (NTZ
  * micros) survives and the DuckDB oracle sees the same instants.
  *
  * The gate itself is unchanged: `graft.Verify <outDir> <dump> <A-ids>`
  * then `scripts/check.py <outDir> <dump> --present` — parity at sf1 is
  * the same hash compare as every other SF.
  *
  * Usage: runMain graft.ScaleGen [baseSfDir] [outDir] [replicas] */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val n = if (args.length > 2) args(2).toInt else 10
    require(n >= 1, s"replicas must be >= 1: $n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, base, out, n) finally spark.stop()
  }

  /** Strides derive from footer-cheap max-key aggregates of the BASE —
    * one tiny job per keyed table, then every replica is a map-side
    * projection; the whole generation is one write pass per table. */
  private[graft] def generate(spark: SparkSession, base: String,
      out: String, n: Int): Unit = {
    def raw(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def maxKey(t: String, c: String): Long = {
      val r = raw(t).agg(max(col(c).cast("long"))).head()
      // an empty table (or all-NULL key) has no stride to derive —
      // refuse with the table/column named, not a bare NPE
      require(!r.isNullAt(0),
        s"$base/$t.parquet: key column $c has no non-NULL values — " +
          "cannot derive a replication stride")
      r.getLong(0) + 1L
    }
    val custStride = maxKey("customer", "c_custkey")
    val suppStride = maxKey("supplier", "s_suppkey")
    val partStride = maxKey("part", "p_partkey")
    val orderStride = maxKey("orders", "o_orderkey")
    val eventStride = maxKey("events", "event_id")
    val userStride = maxKey("events", "user_id")

    def replicate(t: String, shifts: Map[String, Long]): Unit = {
      val df = raw(t)
      (0 until n).map { i =>
        df.select(df.columns.map { c =>
          shifts.get(c) match {
            // add on the ORIGINAL type's long view, cast back — replica
            // columns keep the base schema exactly (BIGINT keys stay
            // BIGINT, the oracle's int-width rules unchanged)
            case Some(stride) => (col(c) + lit(i * stride)).cast(
              df.schema(c).dataType).as(c)
            case None => col(c)
          }
        }: _*)
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    // constant dims + document tables: verbatim copies
    Seq("region", "nation", "documents", "embeddings").foreach { t =>
      raw(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    replicate("customer", Map("c_custkey" -> custStride))
    replicate("supplier", Map("s_suppkey" -> suppStride))
    replicate("part", Map("p_partkey" -> partStride))
    replicate("orders", Map(
      "o_orderkey" -> orderStride, "o_custkey" -> custStride))
    replicate("lineitem", Map(
      "l_orderkey" -> orderStride, "l_partkey" -> partStride,
      "l_suppkey" -> suppStride))
    replicate("events", Map(
      "event_id" -> eventStride, "user_id" -> userStride))
    println(s"SCALEGEN {" +
      s""""base":"$base","out":"$out","replicas":$n,""" +
      s""""lineitem_rows":${spark.read.parquet(s"$out/lineitem.parquet").count()}}""")
  }
}
