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

  /** Tables with CONSTANT cardinality (region 5, nation 25) — the only
    * ones safe to broadcast-hint at any SF. customer/part/supplier grow
    * linearly with SF and must be left to AQE's cost-based choice. */
  val broadcastableDims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact row count of a table from parquet FOOTER metadata only — a
    * driver-side O(#files) pass (the same footer reads the scan planner
    * performs), no Spark job, no data pages touched. For operators that
    * need the corpus size at plan-build time (e.g. a sampling stride)
    * without running an eager count() scan. */
  def parquetRowCount(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    leafParquetFiles(root.getFileSystem(conf), root)
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** Total at-rest bytes of a table's parquet data files — one driver
    * listing (no footer reads, no data pages): the sizing signal for
    * persist-vs-restream policies (d19's occurrence index). */
  def parquetBytes(spark: SparkSession, dir: String, name: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    leafParquetFiles(root.getFileSystem(conf), root).map(_.getLen).sum
  }

  /** Footer-statistics (min, max) of an integer column across a table's
    * parquet files — driver-side O(#files), no data pages (the same
    * footer the scan planner reads). None when any row group lacks the
    * statistic (write-side stats disabled) — callers must treat None as
    * "unbounded" and take their conservative path. Plan-build-time
    * sizing signal (d19's packed-canonical bit budget). */
  def parquetLongColumnRange(spark: SparkSession, dir: String, name: String,
      column: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val ranges = leafParquetFiles(root.getFileSystem(conf), root).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .map(_.getStatistics)
          .filter(st => st != null && st.hasNonNullValue)
          .flatMap { st =>
            (st.genericGetMin, st.genericGetMax) match {
              case (lo: java.lang.Long, hi: java.lang.Long) => Some((lo.toLong, hi.toLong))
              case (lo: java.lang.Integer, hi: java.lang.Integer) => Some((lo.toLong, hi.toLong))
              case _ => None
            }
          }
      } finally r.close()
    }
    if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
    else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
  }

  /** Leaf `.parquet` data files under a table root — the ONE
    * listing-and-filter rule shared by [[parquetRowCount]] and r01's
    * distributed footer count, so a future listing fix (skipping
    * `_temporary` dirs, following symlinks) lands in one place instead
    * of silently diverging between the two counts. */
  private[graft] def leafParquetFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    def leaves(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(leaves)
      else Seq(st)
    leaves(fs.getFileStatus(root))
      .filter(_.getPath.getName.endsWith(".parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events table's `ts` column has shipped in two physical forms
    * across driver generations: TIMESTAMP(NANOS) (no native Spark type —
    * read as a raw long via the legacy conf, truncated ns→µs with integer
    * `div`, matching the Arrow/DuckDB nanos→micros downcast) and plain
    * TIMESTAMP(MICROS) (read natively as TIMESTAMP_NTZ). Normalize both
    * to session-local TIMESTAMP; every session here pins UTC, so the
    * NTZ→LTZ cast is value-identical and the oracle sees the same
    * instants either way. Dispatch on the *observed* schema so a future
    * regeneration in either form keeps working.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      // NTZ→LTZ is value-identical under the pinned-UTC sessions here.
      // Any OTHER physical form must fail fast: e.g. a numeric ts without
      // the nanos annotation would go through Spark's numeric→timestamp
      // cast, which scales by SECONDS — silently wrong instants.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other; " +
          "expected TIMESTAMP, TIMESTAMP_NTZ, or nanos-as-long")
    }
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
