package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables.
  *
  * Each table is a single parquet per scale-factor directory. At 100 TB
  * these would be multi-file partitioned datasets; nothing here assumes a
  * single file — `spark.read.parquet(dir)` works identically on a
  * directory of thousands of files, and every downstream operator relies
  * on Catalyst pushdown (filters + column pruning reach the scan) rather
  * than pre-materialized projections.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough (TPC-H dim ratios) to broadcast at any SF. */
  val broadcastableDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table carries a TIMESTAMP(NANOS) parquet column, which
    * Spark has no native type for. Read it as a raw long (legacy conf) and
    * truncate ns→µs with integer division — exactly what DuckDB/Arrow do
    * when they downcast nanos to their microsecond timestamps, so the
    * oracle sees identical values. (Integer `div`, not `/`: the ns epoch
    * ~1.7e18 exceeds double's 53-bit mantissa.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Table-name dispatch that routes through the type-correcting loaders
    * (notably `events`' nanos→micros handling) rather than raw `load`. */
  def byName(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case other    => load(s, d, other)
  }

  /** Register every table as a temp view — the SQL-first entry point:
    * after this, `spark.sql` reaches the whole catalog (plus the
    * graft_* native functions when GraftExtensions is active). */
  def registerAll(s: SparkSession, d: String): Unit =
    all.foreach(t => byName(s, d, t).createOrReplaceTempView(t))
}
