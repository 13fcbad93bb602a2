package graft

import java.sql.Timestamp
import scala.collection.mutable
import graft.streaming._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Deterministic clock for TTL specs: a top-level object so the
  * processor's clock closure captures only a static reference
  * (serializable; executors share the JVM in local mode). */
object TestClock {
  val now = new java.util.concurrent.atomic.AtomicLong(0L)
}

class StreamingSpec extends GraftSuite {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("wiretap routes by regex and picks up registrations between batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val wt = new Wiretap
    wt.register("alice", "ERROR \\d+")
    val got = mutable.Buffer.empty[(String, String)]
    val q = wt.routeDynamic(input.toDF(), b =>
      got.synchronized { got ++= b.collect().map(r => (r.getString(0), r.getString(1))) })
    try {
      input.addData("ERROR 42 disk full", "INFO all good")
      q.processAllAvailable()
      assert(got.toSet == Set("alice" -> "ERROR 42 disk full"))
      // dynamic registration: next batch sees the new interest
      wt.register("bob", "INFO .*")
      input.addData("INFO warm", "ERROR 7 net down")
      q.processAllAvailable()
      assert(got.toSet == Set(
        "alice" -> "ERROR 42 disk full",
        "alice" -> "ERROR 7 net down",
        "bob" -> "INFO warm"))
      wt.deregister("alice")
      input.addData("ERROR 99 ignored now")
      q.processAllAvailable()
      assert(!got.exists(_._2.contains("ERROR 99")))
    } finally q.stop()
  }

  test("stream_rollup maintains batch-identical daily state across late arrivals") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("rollup_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rollup_ckpt").toString
    def dayTs(day: Int, hour: Int): Timestamp =
      new Timestamp(1700000000000L + day * 86400000L + hour * 3600000L)
    val b1 = Seq((dayTs(0, 1), "click", 1.25), (dayTs(0, 2), "view", 2.50),
      (dayTs(1, 1), "click", 3.00))
    val b2 = Seq((dayTs(1, 2), "click", 4.75), (dayTs(2, 1), "view", 0.10))
    // batch 3 is pure late arrival: it only touches days 0 and 1,
    // which the state already covers
    val b3 = Seq((dayTs(0, 3), "click", 9.99), (dayTs(1, 3), "view", 7.77))
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamRollup.maintain(
      input.toDF().toDF("ts", "event_type", "value"), stateDir, ckpt)
    try {
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = StreamRollup.readState(spark, stateDir)
      .orderBy("event_type", "day").collect().toSeq
    val want = graft.operators.Relational
      .dailyState((b1 ++ b2 ++ b3).toDF("ts", "event_type", "value"))
      .orderBy("event_type", "day").collect().toSeq
    assert(got == want, s"stream state diverged from batch recompute:\n$got\n$want")
    assert(got.nonEmpty && got.map(_.getAs[Long]("n_events")).sum == 7L)
  }

  test("stream_rollup retention bound dead-letters too-late events into the sentinel row") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("rollup_ret_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rollup_ret_ckpt").toString
    def dayTs(day: Int, hour: Int): Timestamp =
      new Timestamp(1700000000000L + day * 86400000L + hour * 3600000L)
    // batch 1 establishes days 10/11; batch 2 advances the high-water
    // mark to day 12 AND carries one event from day 2 (far past the
    // 7-day retention: 12 − 7 = day-5 cutoff) plus one in-window late
    // arrival on day 10 that must still fold into its day
    val b1 = Seq((dayTs(10, 1), "click", 1.00), (dayTs(11, 1), "view", 2.00))
    val b2 = Seq((dayTs(12, 1), "click", 4.00), (dayTs(2, 1), "click", 8.88),
      (dayTs(10, 2), "view", 0.50))
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamRollup.maintain(
      input.toDF().toDF("ts", "event_type", "value"), stateDir, ckpt,
      retentionDays = Some(7))
    try {
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = StreamRollup.readState(spark, stateDir).collect()
    val sentinel = got.filter(_.getAs[String]("event_type") == StreamRollup.LateDroppedType)
    assert(sentinel.length == 1, s"expected one dead-letter row, got:\n${got.toSeq}")
    assert(sentinel.head.isNullAt(sentinel.head.fieldIndex("day")))
    assert(sentinel.head.getAs[Long]("n_events") == 1L)
    assert(sentinel.head.getAs[Long]("cents") == 888L)
    // every retained day ≥ cutoff, and the in-window events all folded
    val days = got.filterNot(_.getAs[String]("event_type") == StreamRollup.LateDroppedType)
    assert(days.forall(!_.isNullAt(1)))
    val want = graft.operators.Relational
      .dailyState((b1 ++ b2.filterNot(_._3 == 8.88)).toDF("ts", "event_type", "value"))
      .orderBy("event_type", "day").collect().toSeq
    assert(days.sortBy(r => (r.getString(0), r.getDate(1).toString)).toSeq == want,
      s"retained state diverged:\n${days.toSeq}\n$want")
  }

  test("stream_rollup clamps the retention high-water mark against future-dated events") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("rollup_fut_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rollup_fut_ckpt").toString
    // legit traffic "today"; one producer with a clock 100 days fast.
    // Without the HWM clamp the skewed event advances the cutoff to
    // (now+100d − 7d) and EVERY legitimate event is dead-lettered; with
    // it, only the future event lands in the sentinel.
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    def onDay(d: java.time.LocalDate, hour: Int): Timestamp =
      Timestamp.valueOf(d.atStartOfDay.plusHours(hour.toLong))
    val b1 = Seq((onDay(today, 1), "click", 1.00), (onDay(today.minusDays(1), 1), "view", 2.00))
    val b2 = Seq((onDay(today.plusDays(100), 1), "click", 5.55),
      (onDay(today, 2), "view", 0.50))
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = StreamRollup.maintain(
      input.toDF().toDF("ts", "event_type", "value"), stateDir, ckpt,
      retentionDays = Some(7))
    try {
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = StreamRollup.readState(spark, stateDir).collect()
    val sentinel = got.filter(_.getAs[String]("event_type") == StreamRollup.LateDroppedType)
    assert(sentinel.length == 1 && sentinel.head.getAs[Long]("n_events") == 1L &&
      sentinel.head.getAs[Long]("cents") == 555L,
      s"future-dated event must be the only dead-letter:\n${got.toSeq}")
    val days = got.filterNot(_.getAs[String]("event_type") == StreamRollup.LateDroppedType)
    val want = graft.operators.Relational
      .dailyState((b1 ++ b2.filterNot(_._3 == 5.55)).toDF("ts", "event_type", "value"))
      .orderBy("event_type", "day").collect().toSeq
    assert(days.sortBy(r => (r.getString(0), r.getDate(1).toString)).toSeq == want,
      s"legit events must survive the skewed producer:\n${days.toSeq}\n$want")
  }

  test("stream_vecindex assigns arriving vectors to the same lists as the batch index") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val indexDir = java.nio.file.Files.createTempDirectory("vecidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vecidx_ckpt").toString
    // frozen quantizer = the batch index's centroids (the production
    // split: quantizer retrains offline, assignments stream against it)
    val (assigned, centDf) = graft.operators.Similarity.s03Index(spark, sf, 16)
    val cents = centDf.orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray).toIndexedSeq
    // stream 9 corpus vectors (id-shifted — "new" arrivals with known
    // batch-side assignments) across 3 micro-batches
    val src = Tables.embeddings(spark, sf).orderBy("vec_id")
      .select(col("vec_id"), col("embedding")).limit(9).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamVecIndex.maintain(
      input.toDF().toDF("vec_id", "embedding").withColumn("vec_id", col("vec_id") + 100000L),
      cents, indexDir, ckpt)
    try {
      src.grouped(3).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val streamed = StreamVecIndex.readIndex(spark, indexDir).collect()
      .map(r => (r.getLong(0) - 100000L, r.getAs[Int]("list_id"))).toMap
    assert(streamed.size == 9)
    // batch parity: the SAME vectors sit in the persisted batch index —
    // streamed assignment must agree list-for-list
    val batchLists = assigned.filter(col("vec_id") < 9)
      .select(col("vec_id"), col("list_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("list_id")).toMap
    src.foreach { case (id, _) =>
      assert(streamed(id) == batchLists(id),
        s"vector $id streamed into list ${streamed(id)} but batch index has ${batchLists(id)}")
    }
    // stats audit: totals conserved
    val stats = StreamVecIndex.indexStats(spark, indexDir).collect()
    assert(stats.map(_.getAs[Long]("n_vecs")).sum == 9L)
  }

  test("stream_vecindex generation tree (r12): replay idempotent, collision refuses, compact + retire keep the guard") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("vecidx_tree").toString
    val (_, centDf) = graft.operators.Similarity.s03Index(spark, sf, 16)
    val cents = centDf.orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray).toIndexedSeq
    def slice(lo: Int, hi: Int) = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val b0 = slice(0, 6); val b1 = slice(6, 10); val b2 = slice(10, 13)
    StreamVecIndex.processVecBatch(b0, cents, dir, 0L)
    val after0 = StreamVecIndex.readIndex(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(after0.size == 6)
    // genuine replay (same id, same content): idempotent no-op
    StreamVecIndex.processVecBatch(b0, cents, dir, 0L)
    assert(StreamVecIndex.readIndex(spark, dir).collect()
      .map(_.toString).sorted.toSeq == after0)
    // batch-id collision (same id, DIFFERENT content): loud refusal,
    // absorbed vectors untouched — the hole the v= overwrite scheme had
    val ex = intercept[IllegalArgumentException] {
      StreamVecIndex.processVecBatch(b1, cents, dir, 0L)
    }
    assert(ex.getMessage.contains("collision"))
    assert(StreamVecIndex.readIndex(spark, dir).collect()
      .map(_.toString).sorted.toSeq == after0)
    // more generations, then compact: rows conserved, horizon advances
    StreamVecIndex.processVecBatch(b1, cents, dir, 1L)
    StreamVecIndex.processVecBatch(b2, cents, dir, 2L)
    val allRows = StreamVecIndex.readIndex(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    assert(allRows.size == 13)
    val (folded, h) = GenerationTree.compact(spark, dir)
    assert(folded == 2 && h == 1L)
    assert(StreamVecIndex.readIndex(spark, dir).collect()
      .map(_.toString).sorted.toSeq == allRows,
      "compaction must fold rows unchanged")
    // a recycled id at/below the horizon refuses even though its dir is gone
    intercept[IllegalArgumentException] {
      StreamVecIndex.processVecBatch(b0, cents, dir, 1L)
    }
    // retire (the refit consumed the tree): empty reads, guard SURVIVES
    val (retired, h2) = GenerationTree.retire(spark, dir)
    assert(retired == 1 && h2 == 2L)
    assert(StreamVecIndex.readIndex(spark, dir).count() == 0L)
    intercept[IllegalArgumentException] {
      StreamVecIndex.processVecBatch(b0, cents, dir, 2L)
    }
    // and the stream continues above the horizon
    StreamVecIndex.processVecBatch(b0, cents, dir, 3L)
    assert(StreamVecIndex.readIndex(spark, dir).count() == 6L)
    // r12 review: a pre-r12 `v=<id>` version dir must REFUSE with the
    // migration recipe, not silently read as empty
    val legacyDir = java.nio.file.Files.createTempDirectory("vecidx_legacy").toString
    b0.select(col("vec_id"), col("embedding"),
        org.apache.spark.sql.functions.lit(0).as("list_id"))
      .write.parquet(s"$legacyDir/v=0")
    val exLegacy = intercept[IllegalArgumentException] {
      StreamVecIndex.readIndex(spark, legacyDir).count()
    }
    assert(exLegacy.getMessage.contains("batch-<id>"),
      s"legacy refusal must carry the migration recipe: ${exLegacy.getMessage}")
  }

  test("stream_vecindex drift consumer: refit fires on drift, not on a stable stream") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nLists = 16
    val (baseAssigned, centDf) = graft.operators.Similarity.s03Index(spark, sf, nLists)
    val cents = centDf.orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray).toIndexedSeq

    def streamInto(tag: String, rows: Seq[(Long, Seq[Float])]): String = {
      val indexDir = java.nio.file.Files.createTempDirectory(tag).toString
      val ckpt = java.nio.file.Files.createTempDirectory(tag + "_ckpt").toString
      val input = MemoryStream[(Long, Seq[Float])]
      val q = StreamVecIndex.maintain(
        input.toDF().toDF("vec_id", "embedding"), cents, indexDir, ckpt)
      try rows.grouped(40).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      finally q.stop()
      indexDir
    }

    // STABLE: arrivals stride-drawn from the corpus itself — same
    // distribution the quantizer was fit on → no refit
    val stable = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(4)) === 0).orderBy("vec_id").collect()
      .map(r => (r.getLong(0) + 200000L, r.getSeq[Float](1)))
    val stableDir = streamInto("vdrift_stable", stable.toSeq)
    val dStable = StreamVecIndex.refitDecision(spark, stableDir, baseAssigned, nLists)
    assert(!dStable.refit, s"stable stream must not trigger a refit: $dStable")

    // DRIFTED: a new out-of-distribution content cluster lands whole
    // inside one coarse cell → hot-list ratio crosses the threshold
    val drifted = (0 until 60).map(i => (300000L + i, Seq.fill(64)(10.0f)))
    val driftDir = streamInto("vdrift_hot", drifted)
    val (dec, rebuilt) = StreamVecIndex.maybeRefit(spark, sf, driftDir, nLists)
    assert(dec.refit, s"drifted stream must trigger a refit: $dec")
    val (assigned2, cents2) = rebuilt.get
    assert(assigned2.count() == 500L + 60L,
      "refit index must contain base corpus plus absorbed arrivals")
    // the refit moved quantizer resolution onto the drifted mass
    def distToDrift(cs: IndexedSeq[Array[Float]]): Double =
      cs.map(_.map(x => (x - 10.0) * (x - 10.0)).sum).min
    val cents2Arr = cents2.orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray).toIndexedSeq
    val (before, after) = (distToDrift(cents), distToDrift(cents2Arr))
    assert(after < before / 100.0,
      s"refit must place a centroid on the drifted cluster: $after vs $before")
    // arrivals were compacted into the published generation — the next
    // decision sees an empty stream: convergent, not self-triggering
    val dAfter = StreamVecIndex.refitDecision(spark, driftDir, assigned2, nLists)
    assert(dAfter.streamedVecs == 0L && !dAfter.refit, s"$dAfter")
  }

  test("stream_quality scores arrivals exactly like the batch classifier core") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // trained model (t28's export) as the static side
    val (weights, interceptQ) = TextAnalysis.t28ExportWeights(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").orderBy("doc_id").limit(90).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Buffer.empty[(Long, Long, Boolean)]
    val q = StreamQuality.run(
      input.toDF().toDF("doc_id", "source", "text"), weights, interceptQ) { b =>
      got.synchronized {
        got ++= b.collect().map(r =>
          (r.getLong(0), r.getAs[Long]("score_q"), r.getAs[Boolean]("flagged")))
      }
    }
    try docs.grouped(30).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    // all-integer core ⇒ streamed verdicts equal the batch pass EXACTLY
    val want = TextAnalysis.quantizedDocScores(
        Tables.documents(spark, sf).filter(col("doc_id").isin(docs.map(_._1): _*)),
        weights, interceptQ)
      .collect().map(r =>
        (r.getLong(0), r.getAs[Long]("score_q"), r.getAs[Boolean]("flagged"))).toSet
    assert(got.toSet == want,
      s"streamed verdicts diverged from batch:\nextra=${got.toSet -- want}\nmissing=${want -- got.toSet}")
    assert(got.exists(_._3) && got.exists(!_._3),
      "both verdict classes should appear on this corpus")
  }

  test("stream_route: per-batch code/prose routing equals the batch t32 core on each slice") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamRoute
    // plant the code snippet on the driver so the stream carries BOTH
    // routing classes (the production core never plants — fixture here)
    val snippet = graft.operators.TextAnalysis.CodeSnippet
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").orderBy("doc_id").limit(90)
      .collect().map { r =>
        val (id, src, t) = (r.getLong(0), r.getString(1), r.getString(2))
        (id, src, if (id % 7 == 3 && t.nonEmpty)
          t + snippet * (t.length / 64 + 1) else t)
      }.filter(_._3.nonEmpty)
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Set[(String, Long, Long, Long, Long)]]
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet.map {
      (r: org.apache.spark.sql.Row) =>
        (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_code"), r.getAs[Long]("code_share_ppm"),
          r.getAs[Long]("mean_sym_ppm"))
    }
    val q = StreamRoute.run(
      input.toDF().toDF("doc_id", "source", "text")) { (id, b) =>
      got.synchronized { got(id) = rows(b) }
    }
    val slices = docs.grouped(30).toSeq
    try slices.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == slices.size)
    slices.zipWithIndex.foreach { case (slice, i) =>
      val want = rows(graft.operators.TextAnalysis.t32CodeDetectOf(
        slice.toSeq.toDF("doc_id", "source", "text")))
      assert(got(i.toLong) == want,
        s"batch $i routing diverged:\n got  ${got(i.toLong)}\n want $want")
    }
    // the fixture exercised both classes and no doc was lost
    assert(got.values.flatten.map(_._3).sum > 0, "no code-routed docs")
    assert(got.values.flatten.map(_._2).sum == docs.length.toLong)
  }

  test("stream_funnel previews p17's report per micro-batch, equal to the batch operator on each slice") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Pipelines
    import graft.streaming.StreamFunnel
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "text").orderBy("doc_id").limit(90)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val input = MemoryStream[(Long, String, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[(Int, String, Long, Long, Long, Option[Long])]]
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map { r =>
      (r.getAs[Int]("stage"), r.getAs[String]("stage_name"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"),
        if (r.isNullAt(r.fieldIndex("n_sole_fail"))) None
        else Some(r.getAs[Long]("n_sole_fail")))
    }
    val q = StreamFunnel.run(
      input.toDF().toDF("doc_id", "lang", "source", "text")) { (id, b) =>
      got.synchronized { got(id) = rows(b) }
    }
    val slices = docs.grouped(30).toSeq
    try slices.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == slices.size, s"expected ${slices.size} batch reports, got ${got.size}")
    // each batch's report equals the BATCH operator run over that slice
    // through its own independent path (temp dir -> Tables.documents)
    slices.zipWithIndex.foreach { case (slice, i) =>
      val dir = java.nio.file.Files.createTempDirectory(s"sfunnel$i").toString
      slice.toSeq.toDF("doc_id", "lang", "source", "text")
        .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
        .write.parquet(s"$dir/documents.parquet")
      val want = rows(Pipelines.p17FilterFunnel(spark, dir))
      assert(got(i.toLong) == want,
        s"batch $i funnel diverged:\n got  ${got(i.toLong)}\n want $want")
    }
    // stage-1 inputs tile the stream: no doc lost or double-counted
    assert(got.values.map(_.head._3).sum == docs.length.toLong)
  }

  test("stream_drift: frozen-blend scoring matches the batch core per batch; alien vocab maxes drift") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    import graft.streaming.StreamDrift
    val corpus = Tables.documents(spark, sf)
    // the release blend, FROZEN (localCheckpoint cuts the lineage — the
    // static side the monitor ships with)
    val blend = TextAnalysis.t31Blend(TextAnalysis.t31TokenCounts(corpus))
      .localCheckpoint()
    val corpTotal = blend.agg(sum(col("nc"))).first().getLong(0)
    val docs = corpus.select("doc_id", "source", "text").orderBy("doc_id")
      .limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // a batch the release has NEVER seen: fully disjoint vocabulary
    val alien = (0 until 10).map(i =>
      (9000L + i, "alien_src", (1 to 30).map(j => s"zzq${i}x$j").mkString(" ")))
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long, Long)]]
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("l1_ppm")))).toMap
    val q = StreamDrift.run(
      input.toDF().toDF("doc_id", "source", "text"), blend, corpTotal) { (id, b) =>
      got.synchronized { got(id) = rows(b) }
    }
    val slices: Seq[Seq[(Long, String, String)]] =
      docs.grouped(30).map(_.toSeq).toSeq :+ alien.toSeq
    try slices.foreach { s => input.addData(s); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == slices.size, s"expected ${slices.size} reports, got ${got.size}")
    // per-batch equality with the batch core over the same slice
    slices.zipWithIndex.foreach { case (s, i) =>
      val tot = spark.range(1).select(lit(corpTotal).as("corp_total"))
      val want = rows(TextAnalysis.t31Drift(
        s.toDF("doc_id", "source", "text"), blend, tot))
      assert(got(i.toLong) == want,
        s"batch $i drift diverged:\n got  ${got(i.toLong)}\n want $want")
    }
    // every alien token hits the blend's left join at ppm_c = 0: the
    // full source mass plus the full absent mass — ~2e6 ppm of drift
    val alienDrift = got(slices.size - 1L)("alien_src")._3
    assert(alienDrift > 1900000L, s"alien batch must max drift: $alienDrift")
    // and a batch OF release docs stays well under the alien ceiling
    assert(got(0L).values.map(_._3).max < alienDrift,
      "release-doc batches must drift less than the alien batch")
  }

  test("stream_sample decides tier and keep/drop at ingest exactly like the batch sampler") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Sampling, TextAnalysis}
    // static sides: the trained table and the offline-estimated cuts
    val (weights, interceptQ) = TextAnalysis.t28ExportWeights(spark, sf)
    val scored = Sampling.p13ScoredTrained(spark, sf)
    val nm = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .agg(count(lit(1)), min(col("doc_id"))).first()
    val cuts = Sampling.p13Boundaries(scored, nm.getLong(0), nm.getLong(1))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").orderBy("doc_id").limit(90).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val got = scala.collection.mutable.Buffer.empty[(Long, Long, Long, Boolean)]
    val q = StreamSample.run(
      input.toDF().toDF("doc_id", "source", "text"), weights, interceptQ, cuts) { b =>
      got.synchronized {
        got ++= b.collect().map(r => (r.getLong(0), r.getAs[Long]("score_q"),
          r.getAs[Long]("tier"), r.getAs[Boolean]("kept")))
      }
    }
    try docs.grouped(30).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    // all-integer core on a deterministic fingerprint ⇒ streamed
    // verdicts equal the batch tier/keep decision EXACTLY
    val want = scored
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .withColumn("tier", Sampling.p13TierCol(cuts._1, cuts._2, cuts._3))
      .withColumn("keep_ppm", Sampling.p13KeepPpmCol)
      .withColumn("kept", Sampling.p13KeptCol)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_q"),
        r.getAs[Long]("tier"), r.getAs[Boolean]("kept"))).toSet
    assert(got.toSet == want,
      s"streamed sampling diverged from batch:\nextra=${got.toSet -- want}\nmissing=${want -- got.toSet}")
    assert(got.exists(_._4) && got.exists(!_._4),
      "both keep and drop verdicts should appear on this corpus")
  }

  test("stream_shards assigns tokenizer ids and shards at ingest exactly like the batch export") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Pipelines
    // frozen tokenizer artifacts — trained ONCE offline, shipped to the
    // ingest job (the stream_vecindex frozen-quantizer split)
    val rules = Pipelines.p12Rules(spark, sf, 20, 4096)
    val vocab = Pipelines.p12Vocab(spark, sf)
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select("doc_id", "text").orderBy("doc_id").limit(90).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer.empty[(Long, Long, Long, Long, List[Int])]
    val q = StreamShards.run(
      input.toDF().toDF("doc_id", "text"), rules, vocab) { b =>
      got.synchronized {
        got ++= b.collect().map(r => (r.getLong(0), r.getAs[Long]("key"),
          r.getAs[Long]("shard"), r.getAs[Long]("n_ids"),
          r.getSeq[Int](r.fieldIndex("token_ids")).toList))
      }
    }
    // three micro-batches; the last also carries a doc with characters
    // the frozen tokenizer never saw — the streaming OOV default must
    // map it to the UNK sentinel, NOT kill the query (one poisoned
    // arrival must not drop every later one)
    val exotic = (999999L, "αβγ the δεζ")
    try docs.grouped(30).zipWithIndex.foreach { case (b, i) =>
      input.addData(if (i == 2) b.toSeq :+ exotic else b.toSeq)
      q.processAllAvailable()
    }
    finally q.stop()
    // deterministic rules + integer arithmetic ⇒ streamed assignments
    // equal the BATCH export surface (p12TokenizedDocs + graft_sym_ids)
    // for the same documents, token-for-token
    val want = Pipelines.p12TokenizedDocs(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .withColumn("token_ids",
        graft.functions.NativeFunctions.symIds(col("enc"), vocab))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("key"),
        r.getAs[Long]("shard"), r.getAs[Long]("n_ids"),
        r.getSeq[Int](r.fieldIndex("token_ids")).toList)).toSet
    val gotCorpus = got.toSet.filter(_._1 != exotic._1)
    assert(gotCorpus == want,
      s"streamed shard assignment diverged from batch:\n" +
        s"extra=${(gotCorpus -- want).take(3)}\nmissing=${(want -- gotCorpus).take(3)}")
    // the stream genuinely spreads across shards (range binning active)
    assert(got.map(_._3).distinct.size > 1, "stream must hit multiple shards")
    // the exotic doc survived ingest with OOV mapped to the sentinel
    val exoticRows = got.filter(_._1 == exotic._1)
    assert(exoticRows.size == 1, "exotic doc must stream through, not kill the query")
    assert(exoticRows.head._5.contains(vocab.size),
      "OOV symbols must map to the reserved vocab.size sentinel")
  }

  test("stream_enrich: as-of enrichment at ingest equals the batch a04 join under in-order arrival") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Temporal
    val events = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"))
      .collect()
      .map(r => EnrichEvent(r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      // the order contract: per-user event-time order across batches —
      // a global (ts, side, id) sort satisfies it for every user
      .sortBy(e => (e.ts_us, e.side, e.event_id))
    val input = MemoryStream[EnrichEvent]
    val q = StreamEnrich.enrich(input.toDS())
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("enrich_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5))).toMap
    val want = Temporal.a04AsofTolerance(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("event_id"))) ->
        (r.getLong(r.fieldIndex("purchase_us")),
          if (r.isNullAt(r.fieldIndex("view_us"))) None else Some(r.getLong(r.fieldIndex("view_us"))),
          if (r.isNullAt(r.fieldIndex("gap_us"))) None else Some(r.getLong(r.fieldIndex("gap_us"))),
          r.getBoolean(r.fieldIndex("fresh")))).toMap
    assert(got.size == want.size,
      s"streamed enrichment emitted ${got.size} purchases, batch has ${want.size}")
    assert(got == want, {
      val diff = want.keySet.filter(k => got.get(k) != want.get(k)).take(3)
      s"streamed enrichment diverged from batch a04 on $diff"
    })
    // both verdicts flow through the stream
    assert(got.values.exists(_._4) && got.values.exists(!_._4),
      "stream must carry both fresh and stale/no-match verdicts")
  }

  test("cms sketch aggregates incrementally over a stream (complete mode)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.CmsSketch
    val input = MemoryStream[String]
    val q = input.toDF().toDF("token")
      .agg(CmsSketch.cms(col("token")).as("sk"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val b1 = Seq("spark", "hash", "spark")
      val b2 = Seq("window", "spark", "hash")
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect().head.getSeq[Long](0)
      val batch = (b1 ++ b2).toDF("token")
        .agg(CmsSketch.cms(col("token"))).collect().head.getSeq[Long](0)
      assert(streamed == batch,
        "incremental sketch must equal the batch sketch over the same tokens")
      val tv = CmsSketch.tokenValString("spark")
      val est = (0 until CmsSketch.Depth)
        .map(d => streamed(d * CmsSketch.Width + CmsSketch.bucket(d, tv))).min
      assert(est >= 3, s"'spark' occurs 3 times, sketch says $est")
    } finally q.stop()
  }

  test("windowed agg with watermark aggregates by 10-minute window") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamAgg.windowedCounts(input.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(5), "click", 2.0), (ts(12), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("winagg").collect()
        .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      assert(rows.exists { case (_, et, n, s) => et == "click" && n == 2 && s == 3.0 })
      assert(rows.exists { case (_, et, n, s) => et == "view" && n == 1 && s == 4.0 })
    } finally q.stop()
  }

  test("sessionize closes sessions on gap and on event-time timeout") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[SessionEvent]
    val sessions = Sessionize.sessionize(input.toDS(), gapMinutes = 30, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 60-min gap event
      input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(5), 2.0))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts(65), 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("sessions").as[ClosedSession].collect()
      assert(afterGap.exists(s => s.user_id == 1L && s.n_events == 2 && s.sum_value == 3.0),
        s"first session not closed by gap: ${afterGap.toSeq}")
      // advance watermark far past the open session's timeout → it closes
      input.addData(SessionEvent(2L, ts(600), 8.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts(601), 8.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions").as[ClosedSession].collect()
      assert(afterTimeout.exists(s => s.user_id == 1L && s.n_events == 1 && s.sum_value == 4.0),
        s"open session not closed by timeout: ${afterTimeout.toSeq}")
    } finally q.stop()
  }

  test("transformWithState sessionize matches the flatMapGroupsWithState semantics") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SessionEvent]
    val q = SessionizeTws.sessionize(input.toDS(), gapMinutes = 30, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("tws_sessions").outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(5), 2.0))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts(65), 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("tws_sessions").as[ClosedSession].collect()
      assert(afterGap.exists(s => s.user_id == 1L && s.n_events == 2 && s.sum_value == 3.0),
        s"gap-closed session missing: ${afterGap.toSeq}")
      // watermark far ahead → event-time timer closes the open session
      input.addData(SessionEvent(2L, ts(600), 8.0))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts(601), 8.0))
      q.processAllAvailable()
      val afterTimer = spark.table("tws_sessions").as[ClosedSession].collect()
      assert(afterTimer.exists(s => s.user_id == 1L && s.n_events == 1 && s.sum_value == 4.0),
        s"timer-closed session missing: ${afterTimer.toSeq}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming packer fails loudly on out-of-order arrival across batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ONE state partition: this test makes the query fail ON PURPOSE, and
    // with sibling partitions the stage abort interrupts their RocksDB
    // commits mid-flight — green runs then carry CANNOT_COMMIT stack
    // traces that would camouflage a real state-store failure. With a
    // single partition the only error in the log is the intended one.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val input = MemoryStream[graft.streaming.PackDoc]
    val q = graft.streaming.StreamPack.pack(input.toDS())
      .writeStream.format("memory").queryName("packed_ooo").outputMode("append").start()
    try {
      input.addData(graft.streaming.PackDoc("s", 5L, 10L))
      q.processAllAvailable()
      // doc 3 arrives AFTER doc 5 on the same shard: packing it would
      // silently produce a layout batch p05 can never reproduce — the
      // in-order contract must be enforced, not assumed
      input.addData(graft.streaming.PackDoc("s", 3L, 10L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("out-of-order arrival")) ||
        e.toString.contains("out-of-order arrival"),
        s"expected the high-water-mark rejection, got: ${e.getMessage}")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming packer rejects a duplicate doc_id within one micro-batch") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // single state partition — intentional-failure test; see the
    // out-of-order test's note on keeping the green log trace-free
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val input = MemoryStream[graft.streaming.PackDoc]
    val q = graft.streaming.StreamPack.pack(input.toDS())
      .writeStream.format("memory").queryName("packed_dup").outputMode("append").start()
    try {
      // an at-least-once source retries doc 7 into the same batch:
      // packing both copies would shift every later offset silently
      input.addData(
        graft.streaming.PackDoc("s", 7L, 10L),
        graft.streaming.PackDoc("s", 7L, 10L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c => c.getMessage != null &&
        c.getMessage.contains("duplicate doc")) ||
        e.toString.contains("duplicate doc"),
        s"expected the intra-batch duplicate rejection, got: ${e.getMessage}")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming packer matches the batch p05 layout across micro-batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .as[graft.streaming.PackDoc].collect().sortBy(d => (d.source, d.doc_id))
    val input = MemoryStream[graft.streaming.PackDoc]
    val q = graft.streaming.StreamPack.pack(input.toDS())
      .writeStream.format("memory").queryName("packed").outputMode("append").start()
    try {
      // in-order arrival split across THREE micro-batches: state must
      // carry each shard's running offset over the batch boundary
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("packed").as[graft.streaming.PackedDoc]
        .collect().map(p => (p.source, p.doc_id) -> p.chunk).toMap
      val batch = graft.operators.Sampling.p05PackChunks(spark, sf).collect()
      // batch reports per-chunk doc ranges; expand to per-doc via the
      // same cumulative layout for an exact assignment comparison
      var offsets = Map.empty[String, Long]
      val expected = docs.map { d =>
        val off = offsets.getOrElse(d.source, 0L)
        offsets += d.source -> (off + d.n_tokens)
        (d.source, d.doc_id) -> off / graft.operators.Sampling.PackBudget
      }.toMap
      assert(streamed == expected, "streaming layout diverged from the cumsum layout")
      // and the batch operator's chunk doc-counts match the streamed layout
      val streamedCounts = streamed.groupBy { case ((src, _), chunk) => (src, chunk) }
        .map { case (k, v) => k -> v.size.toLong }
      val batchCounts = batch.map(r => (r.getAs[String]("source"),
        r.getAs[Long]("chunk")) -> r.getAs[Long]("n_docs")).toMap
      assert(streamedCounts == batchCounts, "chunk occupancy diverged from batch p05")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming decontamination flags equal batch d10 across micro-batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docsDf = Tables.documents(spark, sf)
    // the static at-rest train index — same builder batch d10 uses
    val index = graft.operators.Dedup.d10TrainIndex(
      graft.operators.Dedup.d10Prepared(docsDf)).cache()
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Double)]
    val q = StreamDecontam.run(input.toDF().toDF("doc_id", "text"), index) { b =>
      flagged ++= b.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("split"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_leaked"), r.getAs[Double]("contamination")))
    }
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val batch = graft.operators.Dedup.d10CrossSplitLeakage(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"),
          r.getAs[Long]("n_shingles"), r.getAs[Long]("n_leaked"),
          r.getAs[Double]("contamination"))).toSet
      assert(flagged.nonEmpty, "stream flagged nothing")
      assert(flagged.size == flagged.toSet.size, "a doc was flagged twice")
      assert(flagged.toSet == batch,
        s"online flags diverge from batch d10: extra=${(flagged.toSet -- batch).take(3)} " +
          s"missing=${(batch -- flagged.toSet).take(3)}")
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming LSH near-dedup candidates equal the batch d03 band collisions") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDedup.candidates(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lsh_cands").outputMode("append").start()
    try {
      // feed in three chunks so collisions must cross micro-batches
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("lsh_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch reference: d03's banding, via the SAME single-sourced helper
      val bands = graft.operators.Dedup.minhashBandKeys(
        Tables.documents(spark, sf))
      val batch = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed.nonEmpty, "no streaming candidates")
      assert(streamed == batch,
        s"streaming candidates diverge from batch banding: " +
          s"extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
      // and the verified d03 pairs are all reachable from these candidates
      val d03 = graft.operators.Dedup.d03MinhashLsh(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"))).toSet
      assert(d03.subsetOf(streamed), "a verified batch pair never surfaced online")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("in-stream verified near-dup pairs equal batch d03 across micro-batches") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val docStore = Tables.documents(spark, sf)
    val docs = docStore.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDedup.verified(input.toDF().toDF("doc_id", "text"), docStore)
      .writeStream.format("memory").queryName("lsh_verified")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("lsh_verified").collect()
        .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"),
          r.getAs[Double]("jaccard"))).toSet
      val batch = graft.operators.Dedup.d03MinhashLsh(spark, sf).collect()
        .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"),
          r.getAs[Double]("jaccard"))).toSet
      assert(streamed.nonEmpty, "no verified pairs surfaced in-stream")
      assert(streamed == batch,
        s"in-stream verified pairs diverge from batch d03: " +
          s"extra=${(streamed -- batch).take(5)} missing=${(batch -- streamed).take(5)}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("near-dedup TTL expires bucket entries: old docs stop producing candidates") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // two exact-duplicate texts ⇒ identical signatures ⇒ guaranteed
    // band collision while the first entry is alive. The processor's
    // clock is injected (local-mode executors share the JVM), so expiry
    // is driven deterministically instead of racing wall-clock sleeps
    // against micro-batch scheduling.
    val text = "the quick brown fox jumps over the lazy dog near the river bank"
    val input = MemoryStream[(Long, String)]
    TestClock.now.set(1000L)
    val q = StreamNearDedup.candidates(input.toDF().toDF("doc_id", "text"),
        ttl = Some(java.time.Duration.ofSeconds(2)),
        clock = () => TestClock.now.get())
      .writeStream.format("memory").queryName("lsh_ttl")
      .outputMode("append").start()
    try {
      input.addData((1L, text)); q.processAllAvailable()
      TestClock.now.set(2000L) // 1s later: doc 1 still alive
      input.addData((2L, text)); q.processAllAvailable()
      assert(spark.table("lsh_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
        "live entry should produce the (1,2) candidate")
      TestClock.now.set(10000L) // far past both entries' 2s TTL
      input.addData((3L, text)); q.processAllAvailable()
      val after = spark.table("lsh_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(after == Set((1L, 2L)),
        s"expired entries must not produce candidates, got $after")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream ingest drains a directory of text files into parquet exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/$name"),
        String.join("\n", lines: _*).getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    writeFile("a.log", Seq("l1", "l2"))
    writeFile("b.log", Seq("l3"))
    val q1 = Ingest.streamIngest(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    q1.awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() == 3)
    // restart with one new file: checkpoint must skip the old ones
    writeFile("c.log", Seq("l4", "l5"))
    val q2 = Ingest.streamIngest(spark, s"$dir/in", s"$dir/out", s"$dir/ckpt")
    q2.awaitTermination()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == 5, "restart reprocessed or dropped files")
    assert(out.select("line").collect().map(_.getString(0)).toSet ==
      Set("l1", "l2", "l3", "l4", "l5"))
  }

  test("stream_exactdedup: durable seen-before verdicts across batches, replay-idempotent") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamExactDedup
    // arrivals: 60 corpus docs + planted re-crawls (same text, new id) —
    // some landing in the SAME batch as their original, some in a LATER
    // one, so all three verdict classes appear
    val origs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val recrawls = origs.filter(_._1 % 7 == 2)
      .map { case (id, t) => (10000L + id, t) }
    val all = (origs ++ recrawls).sortBy(_._1)
    // batch 0: ids < 20 plus the recrawls of ids < 10 (same-batch dups);
    // batch 1: ids 20..39 plus recrawls of 10..29; batch 2: the rest
    def batchNo(id: Long): Int = {
      val base = if (id >= 10000L) id - 10000L else id
      if (id >= 10000L) { if (base < 10) 0 else if (base < 30) 1 else 2 }
      else { if (base < 20) 0 else if (base < 40) 1 else 2 }
    }
    val slices = all.groupBy(t => batchNo(t._1)).toSeq.sortBy(_._1).map(_._2)
    val root = java.nio.file.Files.createTempDirectory("sexact").toString
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Map[Long, String]]
    var nextId = 0L
    val q = StreamExactDedup.run(
      input.toDF().toDF("doc_id", "text"), root) { v =>
      got.synchronized {
        got(nextId) = v.collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
        nextId += 1
      }
    }
    try slices.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(got.size == slices.length)
    // driver model: first arrival (batch order, then doc_id) is novel
    val seen = scala.collection.mutable.Set.empty[String]
    slices.zipWithIndex.foreach { case (slice, i) =>
      val inBatch = scala.collection.mutable.Set.empty[String]
      slice.sortBy(_._1).foreach { case (id, t) =>
        val k = t.trim.toLowerCase.replaceAll("\\s+", " ")
        val want =
          if (seen(k)) "dup_of_history"
          else if (inBatch(k)) "dup_in_batch"
          else { inBatch += k; "novel" }
        assert(got(i.toLong)(id) == want,
          s"batch $i doc $id: got ${got(i.toLong)(id)}, want $want")
      }
      seen ++= inBatch
    }
    // all three verdict classes exercised
    val verdicts = got.values.flatMap(_.values).toSeq
    assert(verdicts.contains("dup_in_batch") && verdicts.contains("dup_of_history"))
    // replay the LAST batch id directly: identical verdicts, no state growth
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def genCount = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .count(_.isDirectory)
    val before = genCount
    val lastId = got.keys.max
    val replay = StreamExactDedup.processBatch(
      slices.last.toSeq.toDF("doc_id", "text"), root, lastId)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(replay == got(lastId), "replayed batch verdicts diverged")
    assert(genCount == before, "replay grew the generation tree")
  }

  test("stream_exactdedup: a batch-id collision against foreign committed state refuses, never overwrites") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamExactDedup
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val root = java.nio.file.Files.createTempDirectory("sexactc").toString
    // run A commits batch-0 from the first half
    StreamExactDedup.processBatch(
      docs.take(10).toSeq.toDF("doc_id", "text"), root, 0L).collect()
    val committed = spark.read.parquet(s"$root/batch-0").count()
    // run B (fresh checkpoint, ids reset) arrives with DIFFERENT docs
    // under the same batch id: the guard must throw and leave run A's
    // generation byte-identical
    val ex = intercept[IllegalArgumentException] {
      StreamExactDedup.processBatch(
        docs.drop(10).toSeq.toDF("doc_id", "text"), root, 0L).collect()
    }
    assert(ex.getMessage.contains("batch-id collision"))
    assert(spark.read.parquet(s"$root/batch-0").count() == committed,
      "the guard must not touch the committed generation")
    // while a GENUINE replay of run A's batch 0 still succeeds, verdict-identical
    val replay = StreamExactDedup.processBatch(
      docs.take(10).toSeq.toDF("doc_id", "text"), root, 0L)
    assert(replay.filter(org.apache.spark.sql.functions
      .col("verdict") === "novel").count() == committed)
  }

  test("stream_exactdedup: a base-seeded tree flags release re-crawls from batch one") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamExactDedup
    val docs = Tables.documents(spark, sf).limit(20)
    val root = java.nio.file.Files.createTempDirectory("sexactb").toString
    // seed root/base with the release's d01 keys (the production init)
    docs.select(graft.operators.Dedup.d01DupKey.as("dup_key")).distinct()
      .write.parquet(s"$root/base")
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    var verdicts = Map.empty[Long, String]
    val q = StreamExactDedup.run(
      input.toDF().toDF("doc_id", "text"), root) { v =>
      verdicts = v.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    }
    try { input.addData(rows.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(verdicts.size == rows.length)
    assert(verdicts.values.forall(_ == "dup_of_history"),
      s"every re-crawl of the seeded release must flag: $verdicts")
  }

  test("stream_incdedup: a batch-id collision refuses; a genuine replay stands") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.StreamIncDedup
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 5 <= 2).select("doc_id", "text")
    val batchA = docs.filter(col("doc_id") % 5 === 3)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batchB = docs.filter(col("doc_id") % 5 === 4)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val root = java.nio.file.Files.createTempDirectory("sincdcoll").toString
    Dedup.d18BuildIndex(base, s"$root/base")
    val first = StreamIncDedup.processBatch(
        batchA.toDF("doc_id", "text"), root, 0L, Dedup.NoDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val committed = spark.read.parquet(s"$root/batch-0").count()
    // a DIFFERENT batch under the same id must refuse and leave the
    // committed generation untouched
    val ex = intercept[IllegalArgumentException] {
      StreamIncDedup.processBatch(
        batchB.toDF("doc_id", "text"), root, 0L, Dedup.NoDfCap)
    }
    assert(ex.getMessage.contains("batch-id collision"))
    assert(spark.read.parquet(s"$root/batch-0").count() == committed)
    // a genuine replay of batch A still succeeds, pair-identical, no growth
    val replay = StreamIncDedup.processBatch(
        batchA.toDF("doc_id", "text"), root, 0L, Dedup.NoDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == first, "replayed pairs diverged")
    assert(spark.read.parquet(s"$root/batch-0").count() == committed)
  }

  test("generation-tree compaction: replay across a compaction is verdict-identical; folded ids refuse") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.{GenerationTree, StreamExactDedup}
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // one re-crawl per decade so history verdicts exercise the fold
    val slices = docs.grouped(10).toSeq.zipWithIndex.map { case (s, i) =>
      if (i == 0) s.toSeq
      else s.toSeq :+ (20000L + i, docs((i - 1) * 10)._2)
    }
    val root = java.nio.file.Files.createTempDirectory("sexactcomp").toString
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    def verdicts(b: Seq[(Long, String)], id: Long) =
      StreamExactDedup.processBatch(b.toDF("doc_id", "text"), root, id)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val v = slices.zipWithIndex.map { case (s, i) => verdicts(s, i.toLong) }
    assert(v(3).values.exists(_ == "dup_of_history"))
    // fold everything but the newest generation into base
    val (folded, h) = GenerationTree.compact(spark, root, dedupe = true)
    assert(folded == 3 && h == 2L, s"expected 3 folded, horizon 2: ($folded, $h)")
    val standing = fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(standing == Set("base", "batch-3"), s"unexpected dirs: $standing")
    // the one replay that can genuinely happen (the newest id) is
    // verdict-identical across the fold
    assert(verdicts(slices(3), 3L) == v(3), "replay across compaction diverged")
    // a folded id can never be a replay — the horizon refuses it
    val ex = intercept[IllegalArgumentException] { verdicts(slices(1), 1L) }
    assert(ex.getMessage.contains("compaction horizon"))
    // a crash between swap and deletes leaves a folded dir standing:
    // plant one whose keys WOULD flip verdicts if it were read — the
    // keys of docs never absorbed (they'd wrongly flag as history)
    val fresh = (0 until 10).map(i =>
      (40000L + i, s"synthetic never-absorbed text $i for the leftover probe"))
    fresh.toSeq.toDF("doc_id", "text")
      .select(graft.operators.Dedup.d01DupKey.as("dup_key"))
      .write.parquet(s"$root/batch-1")
    val b4 = slices(0).map { case (id, t) => (30000L + id, t) } ++ fresh
    val v4 = verdicts(b4, 4L)
    assert(fresh.forall(f => v4(f._1) == "novel"),
      s"sub-horizon leftover keys leaked into the probe: $v4")
    assert(slices(0).forall { case (id, _) => v4(30000L + id) == "dup_of_history" },
      s"re-crawls of folded history must still flag: $v4")
    // the next compact sweeps the leftover
    GenerationTree.compact(spark, root, dedupe = true)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/batch-1")),
      "stale sub-horizon leftover must be swept")
  }

  test("generation-tree compaction preserves d18's occurrence counts (incdedup, dedupe off)") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    import graft.streaming.{GenerationTree, StreamIncDedup}
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 6 <= 1).select("doc_id", "text")
    def slice(k: Int) = docs.filter(col("doc_id") % 6 === k)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def pairs(root: String, b: Seq[(Long, String)], id: Long) =
      StreamIncDedup.processBatch(b.toDF("doc_id", "text"), root, id, Dedup.NoDfCap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // twin trees fed identically; one compacts after batch 2
    val rootA = java.nio.file.Files.createTempDirectory("sinccompA").toString
    val rootB = java.nio.file.Files.createTempDirectory("sinccompB").toString
    Seq(rootA, rootB).foreach(r => Dedup.d18BuildIndex(base, s"$r/base"))
    (2 to 4).foreach { k =>
      val s = slice(k)
      val a = pairs(rootA, s, (k - 2).toLong)
      val b = pairs(rootB, s, (k - 2).toLong)
      assert(a == b)
    }
    val (folded, h) = GenerationTree.compact(spark, rootA)
    assert(folded == 2 && h == 1L)
    // batch 3 probes the folded tree and the untouched tree identically —
    // jaccards depend on occurrence COUNTS, so any fold-time dedupe or
    // double-read would show here
    val s5 = slice(5).filter(_._2.nonEmpty)
    val a5 = pairs(rootA, s5, 3L)
    val b5 = pairs(rootB, s5, 3L)
    assert(a5 == b5, s"compacted tree diverged: ${(a5 diff b5).take(3)} / ${(b5 diff a5).take(3)}")
    assert(a5.nonEmpty, "fixture must surface cross-batch pairs")
  }

  test("generation-tree compaction: a swap that died between renames recovers on the PROBE path") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.{GenerationTree, StreamExactDedup}
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val root = java.nio.file.Files.createTempDirectory("sexactrec").toString
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    def verdicts(b: Seq[(Long, String)], id: Long) =
      StreamExactDedup.processBatch(b.toDF("doc_id", "text"), root, id)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    val original = docs.grouped(10).zipWithIndex
      .map { case (s, i) => verdicts(s.toSeq, i.toLong) }.toSeq
    GenerationTree.compact(spark, root, dedupe = true)
    // simulate the crash window: base renamed aside, tmp never landed
    require(fs.rename(new org.apache.hadoop.fs.Path(root, "base"),
      new org.apache.hadoop.fs.Path(root, "base_compact_bak")))
    // a replay of the newest id must STILL be verdict-identical: the
    // probe path itself rolls the swap back before reading (without
    // recovery it would see no history, flip verdicts to novel, and
    // wedge on the collision compare forever)
    val replay = verdicts(docs.drop(10).toSeq, 1L)
    assert(replay == original(1), "replay across the crashed swap diverged")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "base")),
      "probe must restore base from the crashed swap's bak")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, "base_compact_bak")))
    // folded history is visible again: a re-crawl of batch 0 flags
    val v = verdicts(docs.take(10).map { case (id, t) => (60000L + id, t) }, 2L)
    assert(v.values.forall(_ == "dup_of_history"),
      s"recovered base must serve the folded history: $v")
  }

  test("generation-tree auto-compaction: run() keeps the tree bounded past maxGenerations") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamExactDedup
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val root = java.nio.file.Files.createTempDirectory("sexactauto").toString
    val input = MemoryStream[(Long, String)]
    var batches = 0
    val q = StreamExactDedup.run(
      input.toDF().toDF("doc_id", "text"), root, maxGenerations = 2) { v =>
      v.collect(); batches += 1
    }
    try docs.grouped(8).foreach { s => input.addData(s.toSeq); q.processAllAvailable() }
    finally q.stop()
    assert(batches == 5)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(rootP).filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs.count(_.startsWith("batch-")) <= 2,
      s"tree must stay bounded at maxGenerations: $dirs")
    assert(dirs.contains("base"), s"compaction must have produced a base: $dirs")
    // the folded key set is complete: every doc re-crawled now flags
    val v = StreamExactDedup.processBatch(
      docs.map { case (id, t) => (50000L + id, t) }.toSeq.toDF("doc_id", "text"),
      root, 100L)
    assert(v.filter(org.apache.spark.sql.functions.col("verdict") =!= "dup_of_history").count() == 0,
      "compacted+standing generations must cover the full absorbed history")
  }

  test("stream_incdedup: probe+absorb micro-batches tile d02 exactly like the batch nightly") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    // base corpus indexed at rest; three arrival micro-batches carve up
    // the rest of the corpus so every d02 pair has a well-defined
    // "arrival batch" (the newest member's) — the d18 chain spec's
    // tiling argument, with "night" shrunk to "micro-batch"
    val docs = Tables.documents(spark, sf)
    val m = col("doc_id") % 5
    val base = docs.filter(m.isin(0L, 1L, 2L))
    def batchNo(id: Long): Int =
      if (id % 5 == 4) 1
      else if (id % 5 == 3) { if (id % 2 == 0) 2 else 3 }
      else 0
    val arrivals = docs.filter(m.isin(3L, 4L))
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(t => batchNo(t._1))
    val dir = java.nio.file.Files.createTempDirectory("sincdedup").toString
    val idx = dir + "/shingle_index"
    val got = mutable.Buffer.empty[Set[((Long, Long), Double)]]
    try {
      Dedup.d18BuildIndex(base, s"$idx/base")
      val input = MemoryStream[(Long, String)]
      val q = StreamIncDedup.run(input.toDF().toDF("doc_id", "text"), idx) { b =>
        got.synchronized {
          got += b.collect().map(r => ((r.getLong(0), r.getLong(1)),
            r.getAs[Double]("jaccard"))).toSet
        }
      }
      try (1 to 3).foreach { i =>
        input.addData(arrivals(i).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      // per-batch outputs are pairwise disjoint (each pair reported once,
      // on the micro-batch its newest member arrived) ...
      assert(got.size == 3, s"expected 3 micro-batch outputs, got ${got.size}")
      assert((got(0) & got(1)).isEmpty && (got(0) & got(2)).isEmpty &&
        (got(1) & got(2)).isEmpty, "a pair was reported in two micro-batches")
      // ... and each equals d02's slice for that batch: all pairs whose
      // NEWEST member arrived in it (jaccards included — the absorbed
      // index must serve cross-batch evidence identically to the nightly)
      val full = Dedup.d02NgramJaccard(spark, sf).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toSet
      (1 to 3).foreach { i =>
        val exp = full.filter { case ((a, b), _) =>
          math.max(batchNo(a), batchNo(b)) == i }
        assert(got(i - 1) == exp,
          s"micro-batch $i diverged from d02's slice: " +
            s"extra=${(got(i - 1) -- exp).take(3)} missing=${(exp -- got(i - 1)).take(3)}")
      }
      // the base-internal remainder is exactly what no micro-batch may
      // report — together the stream + base tile d02 with no gap
      val baseInternal = full.filter { case ((a, b), _) =>
        batchNo(a) == 0 && batchNo(b) == 0 }
      assert(baseInternal ++ got(0) ++ got(1) ++ got(2) == full,
        "stream outputs + base-internal pairs must tile d02's full set")
      // REPLAY idempotence (foreachBatch is at-least-once): re-running
      // the LAST micro-batch's body under its own batch id — the
      // crash-between-absorb-and-offset-commit case — must ignore the
      // previous attempt's committed generation (no self-pairs, no
      // doubled shared counts), reproduce the identical pair output,
      // and leave the index tree's row count unchanged
      val rowsBefore = spark.read.parquet(s"$idx/batch-2").count()
      val replayed = StreamIncDedup.processBatch(
        arrivals(3).toSeq.toDF("doc_id", "text"), idx, batchId = 2L,
        Dedup.NoDfCap).collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          r.getAs[Double]("jaccard"))).toSet
      assert(replayed == got(2),
        s"replayed batch diverged: extra=${(replayed -- got(2)).take(3)} " +
          s"missing=${(got(2) -- replayed).take(3)}")
      assert(spark.read.parquet(s"$idx/batch-2").count() == rowsBefore,
        "replay must rewrite its generation, not duplicate rows")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir))
  }
}
