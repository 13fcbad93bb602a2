package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Semantics of the temporal joins, pinned independently of the DuckDB
  * gate: the as-of union-window formulation must equal a direct
  * "max view ts <= purchase ts" correlated lookup, and the banded
  * equi-join must equal the naive range join it replaces. */
class TemporalSpec extends GraftSuite {

  test("a01 as-of match equals the correlated max-prior-view per purchase") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("pus"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vuid"), unix_micros(col("ts")).as("vus"))
    // reference: plain join + max aggregation (quadratic; test-scale only)
    val expect = p.join(v, col("user_id") === col("vuid") && col("vus") <= col("pus"), "left")
      .groupBy(col("user_id"), col("event_id"))
      .agg(max(col("vus")).as("view_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val got = Temporal.a01AsofJoin(spark, sf).collect()
    assert(got.nonEmpty && got.length == expect.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val vUs = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(expect(k) == vUs, s"purchase $k: asof=$vUs expected=${expect(k)}")
      if (vUs.isDefined) assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
  }

  test("a03 forward as-of equals the correlated min-next-purchase per view") {
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("vus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("puid"), unix_micros(col("ts")).as("pus"))
    // reference: plain join + min aggregation (quadratic; test-scale only)
    val expect = v.join(p, col("user_id") === col("puid") && col("pus") >= col("vus"), "left")
      .groupBy(col("user_id"), col("event_id"))
      .agg(min(col("pus")).as("purchase_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val got = Temporal.a03AsofForward(spark, sf).collect()
    assert(got.nonEmpty && got.length == expect.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val pUs = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(expect(k) == pUs, s"view $k: asof=$pUs expected=${expect(k)}")
      if (pUs.isDefined) assert(r.getLong(4) == r.getLong(3) - r.getLong(2))
    }
  }

  test("a02 banded equi-join equals the naive range join") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000000").as("sec"))
    val naive = ev.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.sec") - col("b.sec")) <= Temporal.BandSec)
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Temporal.a02BandJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got == naive, s"banded=$got naive=$naive")
  }

  test("a04: tolerance degrades stale matches to the no-match NULLs, nothing else changes") {
    val tolUs = Temporal.AsofToleranceSec * 1000000L
    val base = Temporal.a01AsofJoin(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("event_id"))) ->
        (r.getLong(r.fieldIndex("purchase_us")),
          if (r.isNullAt(r.fieldIndex("view_us"))) None else Some(r.getLong(r.fieldIndex("view_us"))),
          if (r.isNullAt(r.fieldIndex("gap_us"))) None else Some(r.getLong(r.fieldIndex("gap_us")))))
      .toMap
    val got = Temporal.a04AsofTolerance(spark, sf).collect()
    assert(got.length == base.size, "a04 must keep every a01 purchase row")
    var freshN = 0; var staleN = 0; var noneN = 0
    got.foreach { r =>
      val k = (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("event_id")))
      val (pUs, view, gap) = base(k)
      assert(r.getLong(r.fieldIndex("purchase_us")) == pUs)
      val fresh = r.getBoolean(r.fieldIndex("fresh"))
      gap match {
        case Some(g) if g <= tolUs =>
          freshN += 1
          assert(fresh && r.getLong(r.fieldIndex("view_us")) == view.get &&
            r.getLong(r.fieldIndex("gap_us")) == g, s"$k: fresh match must pass through")
        case Some(_) =>
          staleN += 1
          assert(!fresh && r.isNullAt(r.fieldIndex("view_us")) &&
            r.isNullAt(r.fieldIndex("gap_us")), s"$k: stale match must null out")
        case None =>
          noneN += 1
          assert(!fresh && r.isNullAt(r.fieldIndex("view_us")), s"$k: no-match stays null")
      }
    }
    // the tolerance is sized so BOTH verdicts populate on this corpus
    assert(freshN > 0 && staleN > 0,
      s"fixture must exercise both fresh ($freshN) and stale ($staleN) paths")
  }

  test("cms estimates upper-bound exact counts; absent tokens near zero") {
    val rows = operators.TextAnalysis.t08CmsCounts(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == operators.TextAnalysis.cmsQueryTokens.sorted)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: est $est < exact $exact")
    }
    val absent = rows.find(_.getString(0) == "zzz_absent").get
    assert(absent.getLong(2) == 0L)
  }
}
