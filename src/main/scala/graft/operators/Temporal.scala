package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins — as-of join and
  * banded time-range join — re-expressed in shapes that scale to a
  * 100 TB event log instead of the naive range-predicate joins.
  *
  * - As-of join: the classic union-and-carry-forward formulation — tag
  *   both streams, single shuffle on (key), one ordered window pass that
  *   carries the last left-side timestamp forward. No range explosion,
  *   no per-row probe: O(n log n) partition-local sort, exactly one
  *   shuffle by user_id. (A range-predicate join would be a
  *   BroadcastNestedLoop or cross product.)
  * - Band join: bucket timestamps to the band width; each pair within
  *   ±band shares equal or adjacent buckets, so replicating ONE side at
  *   {b-1, b, b+1} turns the range predicate into an equi-join that
  *   shuffles linearly, then the exact |Δt| filter verifies. The same
  *   pattern as the LSH candidate joins in Dedup (SURVEY §5).
  *
  * All comparisons are on microsecond epochs (`unix_micros`); the DuckDB
  * mirrors truncate their nanosecond timestamps to micros first so both
  * engines compare identical values.
  */
object Temporal {

  /** a01: as-of join — each purchase event matched to the most recent
    * view (view.ts <= purchase.ts) by the same user. The canonical
    * "enrich fact with latest dimension state" temporal primitive. */
  def a01AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // side 0 = view, 1 = purchase: at an equal timestamp the view sorts
    // first, making the match inclusive (>=), same as ASOF JOIN.
    val tagged = ev.filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("view_us",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("user_id"), col("event_id"),
        col("ts_us").as("purchase_us"), col("view_us"),
        (col("ts_us") - col("view_us")).as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** a03: FORWARD as-of join — each view matched to the next purchase
    * (purchase.ts >= view.ts) by the same user: time-to-conversion, the
    * mirror of a01's latest-prior-state enrichment. Same single-shuffle
    * union-and-carry formulation, with the window frame flipped to
    * [current, unbounded following] and first() instead of last(); views
    * with no later purchase keep NULLs (left-join semantics). The DuckDB
    * mirror reduces forward-ASOF to the engine's backward ASOF by
    * negating the epoch column (max(−t) = min(t)). */
  def a03AsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // side 0 = view, 1 = purchase: at an equal timestamp the view sorts
    // first, so the forward frame still sees the same-instant purchase
    // (inclusive >=, matching the negated-ASOF oracle).
    val tagged = ev.filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tagged
      .withColumn("purchase_us",
        first(when(col("side") === 1, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("user_id"), col("event_id"),
        col("ts_us").as("view_us"), col("purchase_us"),
        (col("purchase_us") - col("ts_us")).as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** a04 freshness bound, seconds (1 day — sized to the corpus's gap
    * distribution so both verdicts populate at every test SF: the
    * median view→purchase gap at sf0.1 is ~1.4 days). */
  val AsofToleranceSec = 86400L

  /** a04: as-of join WITH TOLERANCE — a01's latest-prior-state
    * enrichment bounded by a freshness window, the contract every
    * production as-of enrichment actually carries (state older than the
    * tolerance must NOT enrich: last week's quote is not "the current
    * price"; a session attributed to a week-old page view is noise).
    * Built ON a01 — the same single-shuffle union-and-carry plan, with
    * the tolerance applied as a map-side CASE after the carry — so the
    * match semantics can never drift from the unbounded form: a stale
    * match degrades to the no-match NULLs, and the explicit `fresh`
    * flag separates "no prior view ever" from "prior view too old"
    * downstream without re-deriving the gap. All-integer microsecond
    * comparison — no float boundary on the tolerance edge. */
  def a04AsofTolerance(spark: SparkSession, dir: String): DataFrame =
    a04AsofTolerance(spark, dir, AsofToleranceSec)

  def a04AsofTolerance(spark: SparkSession, dir: String,
      tolSec: Long): DataFrame = {
    val tolUs = tolSec * 1000000L
    val fresh = col("gap_us").isNotNull && col("gap_us") <= tolUs
    a01AsofJoin(spark, dir)
      .select(col("user_id"), col("event_id"), col("purchase_us"),
        when(fresh, col("view_us")).as("view_us"),
        when(fresh, col("gap_us")).as("gap_us"),
        fresh.as("fresh"))
      .orderBy("user_id", "event_id")
  }

  /** Band width for a02, seconds. */
  val BandSec = 300L

  /** a02: banded self-join — pairs of events from the same user within
    * ±300 s, counted per (event_type, event_type). Candidate generation
    * replicates one side at bucket {b-1, b, b+1} (each qualifying pair
    * shares equal-or-adjacent buckets exactly once), equi-joins on
    * (user_id, bucket) — a linear shuffle — and verifies |Δt| exactly. */
  def a02BandJoin(spark: SparkSession, dir: String): DataFrame = {
    // FLOOR division (exact integer form: subtract the positive mod,
    // then divide — no double rounding), NOT Spark's `div`, which
    // truncates toward zero: for pre-1970 (negative-epoch) timestamps
    // trunc-div shifts sec by +1 relative to the DuckDB oracle's `//`
    // floor semantics and silently drops boundary pairs. Buckets floor
    // the same way so every bucket spans exactly BandSec.
    def floorDiv(a: String, b: Long): String = s"($a - pmod($a, $b)) div $b"
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr(floorDiv("unix_micros(ts)", 1000000L)).as("sec"))
    val a = ev.withColumn("bucket", expr(floorDiv("sec", BandSec)))
    val b = ev.withColumn("bucket",
      explode(array(expr(floorDiv("sec", BandSec) + " - 1"),
        expr(floorDiv("sec", BandSec)),
        expr(floorDiv("sec", BandSec) + " + 1"))))
    a.as("a").join(b.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.bucket") === col("b.bucket") &&
          col("a.event_id") < col("b.event_id"))
      .filter(abs(col("a.sec") - col("b.sec")) <= BandSec)
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("type_a", "type_b")
  }

  val oracle: Map[String, String] = Map(
    "a01_asof_join" ->
      """WITH p AS (SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts
                    FROM events WHERE event_type = 'purchase'),
          v AS (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts
                FROM events WHERE event_type = 'view')
          SELECT p.user_id, p.event_id,
            epoch_us(p.ts) AS purchase_us,
            epoch_us(v.ts) AS view_us,
            epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
          FROM p ASOF LEFT JOIN v
            ON p.user_id = v.user_id AND p.ts >= v.ts
          ORDER BY p.user_id, p.event_id""",
    "a03_asof_forward" ->
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS view_us,
                    -epoch_us(ts) AS neg_us
                    FROM events WHERE event_type = 'view'),
          p AS (SELECT user_id, epoch_us(ts) AS purchase_us,
                -epoch_us(ts) AS neg_us
                FROM events WHERE event_type = 'purchase')
          SELECT v.user_id, v.event_id, v.view_us,
            p.purchase_us, p.purchase_us - v.view_us AS gap_us
          FROM v ASOF LEFT JOIN p
            ON v.user_id = p.user_id AND v.neg_us >= p.neg_us
          ORDER BY v.user_id, v.event_id""",
    "a04_asof_tolerance" ->
      s"""WITH p AS (SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts
                    FROM events WHERE event_type = 'purchase'),
          v AS (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts
                FROM events WHERE event_type = 'view'),
          base AS (
            SELECT p.user_id, p.event_id,
              epoch_us(p.ts) AS purchase_us,
              epoch_us(v.ts) AS view_us,
              epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts)
          SELECT user_id, event_id, purchase_us,
            CASE WHEN gap_us <= ${AsofToleranceSec * 1000000L}
                 THEN view_us END AS view_us,
            CASE WHEN gap_us <= ${AsofToleranceSec * 1000000L}
                 THEN gap_us END AS gap_us,
            COALESCE(gap_us <= ${AsofToleranceSec * 1000000L}, FALSE) AS fresh
          FROM base ORDER BY user_id, event_id""",
    "a02_band_join" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
                 epoch_us(ts) // 1000000 AS sec FROM events)
          SELECT a.event_type AS type_a, b.event_type AS type_b,
            COUNT(*) AS n_pairs
          FROM e a JOIN e b
            ON a.user_id = b.user_id AND a.event_id < b.event_id
            AND abs(a.sec - b.sec) <= $BandSec
          GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
