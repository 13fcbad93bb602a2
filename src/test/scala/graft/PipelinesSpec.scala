package graft

import graft.operators.Pipelines
import org.apache.spark.sql.functions._

class PipelinesSpec extends GraftSuite {

  test("cleanCorpus output respects every stage's contract") {
    val out = Pipelines.cleanCorpus(spark, sf).cache()
    try {
      val n = out.count()
      assert(n > 0 && n <= Tables.documents(spark, sf).count())
      // quality floor and language whitelist hold
      assert(out.filter(col("quality") < 0.3).count() == 0)
      assert(out.filter(!col("lang").isin("en", "es", "de", "fr", "zh")).count() == 0)
      // dedup: normalized texts are unique after canonical-pick
      val texts = out.select(lower(regexp_replace(trim(col("text")), "\\s+", " "))).collect()
      assert(texts.map(_.getString(0)).distinct.length == n)
      // split assignment is total and deterministic
      val splits = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(splits.values.sum == n)
      assert(splits.keySet.subsetOf(Set("train", "val", "test")))
      val out2 = Pipelines.cleanCorpus(spark, sf)
      assert(out2.count() == n, "pipeline not deterministic")
    } finally out.unpersist()
  }

  test("p18 release diff: statuses tile the id space, deltas reconcile per bucket") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = Pipelines.p18ReleaseDiff(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("chars_prev"),
        r.getAs[Long]("chars_curr"), r.getAs[Long]("chars_delta")))
    def tot(st: String): (Long, Long) = {
      val b = rows.filter(_._2 == st)
      (b.map(_._3).sum, b.map(_._6).sum)
    }
    val m = Pipelines.DiffMod
    // bucket populations match the residue classes directly
    assert(tot("added")._1 == docs.count(_._1 % m == Pipelines.DiffAdded))
    assert(tot("changed")._1 == docs.count(_._1 % m == Pipelines.DiffChanged))
    assert(tot("removed")._1 == docs.count(_._1 % m == Pipelines.DiffRemoved))
    // every doc of the union id space lands in exactly one status: curr
    // docs (added/changed/unchanged) + the retired prev-only twins
    assert(rows.map(_._3).sum ==
      docs.length + docs.count(_._1 % m == Pipelines.DiffRemoved))
    // delta reconciliation: added contributes its full current mass,
    // removed its full (negated) prev mass, changed exactly the 6-char
    // draft suffix per doc, unchanged zero
    assert(tot("added")._2 ==
      docs.filter(_._1 % m == Pipelines.DiffAdded).map(_._2).sum)
    assert(tot("removed")._2 ==
      -docs.filter(_._1 % m == Pipelines.DiffRemoved).map(_._2).sum)
    assert(tot("changed")._2 == -6L * tot("changed")._1)
    assert(rows.filter(_._2 == "unchanged").forall(r => r._6 == 0L && r._4 == r._5))
    // chars_delta is derived, never independently aggregated
    assert(rows.forall(r => r._6 == r._5 - r._4))
  }

  test("p18 production overload: a release diffed against itself is all-unchanged") {
    val docs = Tables.documents(spark, sf)
    val rows = Pipelines.p18ReleaseDiff(docs, docs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("status") == "unchanged"))
    assert(rows.forall(_.getAs[Long]("chars_delta") == 0L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }

  test("p19 z-order layout: measured skipping win on both predicate columns") {
    val rows = Pipelines.p19ZorderLayout(spark, sf).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("predicate")) ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("pairs_total"),
          r.getAs[Long]("pairs_scanned"), r.getAs[Long]("scan_ppm"))).toMap
    assert(rows.keySet == Set(("zorder", "source"), ("zorder", "lang"),
      ("naive_id", "source"), ("naive_id", "lang")))
    rows.foreach { case (k, (nf, pt, ps, ppm)) =>
      assert(nf > 1, s"$k produced a single file — no pruning possible")
      assert(ps <= pt && ppm == ps * 1000000L / pt, s"$k arithmetic broken")
    }
    // naive id-ranged files are random w.r.t. source/lang: every file
    // spans (nearly) the full rank range, so nothing prunes; the
    // z-order layout must beat it decisively on BOTH columns
    Seq("source", "lang").foreach { p =>
      val z = rows(("zorder", p))._4
      val n = rows(("naive_id", p))._4
      assert(z * 2 <= n,
        s"z-order should at least halve the scanned pairs for $p: z=$z naive=$n")
    }
  }

  test("p19 write path: z-sorted partitioned write is lossless and per-file tight") {
    import org.apache.spark.sql.functions._
    // the NULL sentinel's contract: no genuine dimension value equals it
    // (a collision would silently merge NULL-dim docs into that rank)
    assert(Tables.documents(spark, sf)
      .filter(col("source") === Pipelines.ZNullSentinel ||
        col("lang") === Pipelines.ZNullSentinel).count() == 0)
    val keyed = Pipelines.p19Keyed(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("p19z").toString
    keyed.repartition(col("zbucket")).sortWithinPartitions(col("zkey"))
      .write.partitionBy("zbucket").mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // lossless: same docs, same content hash per doc
    val a = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "z-layout write lost or mutated documents")
    // the physical layout delivers what the audit promises: per-bucket
    // (source, lang) rank spans match the audit's stats input
    val spans = back.groupBy(col("zbucket"))
      .agg((max(col("src_rank")) - min(col("src_rank"))).as("ss"),
        (max(col("lang_rank")) - min(col("lang_rank"))).as("ls"))
      .collect()
    val nRanks = keyed.select(col("src_rank")).distinct().count()
    assert(spans.exists(r => r.getAs[Long]("ss") < nRanks - 1),
      "no bucket has a narrowed source span — interleave broken")
  }

  test("p20 release build: every stage reconciles with its standalone gated operator") {
    import org.apache.spark.sql.functions._
    val audit = Pipelines.p20ReleaseBuild(spark, sf).collect()
      .map(r => r.getAs[Int]("stage") ->
        (r.getAs[String]("stage_name"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_chars"))).toMap
    assert(audit.keySet == Set(0, 1, 2, 3, 4))
    // stage 0/1: raw corpus and the gated clean pipeline
    assert(audit(0)._2 == Tables.documents(spark, sf).count())
    assert(audit(1)._2 == Pipelines.cleanCorpus(spark, sf).count())
    // stage 2: near-dup keep equals p10's gated per-group keep total
    val p10Kept = Pipelines.p10NeardupCorpus(spark, sf).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(audit(2)._2 == p10Kept,
      s"neardup stage diverged from p10: ${audit(2)._2} vs $p10Kept")
    // stage 3: surgery never drops docs; its char delta equals d19's
    // accounted cut mass ON THE KEPT CORPUS
    assert(audit(3)._2 == audit(2)._2, "surgery must keep every doc")
    val stages = Pipelines.p20Stages(spark, sf)
    val cutMass = graft.operators.Dedup.d19DupSpansOf(
        stages.kept.select(col("doc_id"), col("text")),
        graft.operators.Dedup.ExactSpanChars)
      .agg(coalesce(sum(col("span_end") - col("span_start") + 1), lit(0L)))
      .first().getLong(0)
    assert(audit(2)._3 - audit(3)._3 == cutMass,
      s"surgery char delta ${audit(2)._3 - audit(3)._3} != accounted cut $cutMass")
    // stage 4: only non-train docs drop, and the final corpus matches
    val dropped = stages.surged.select("doc_id", "split")
      .join(stages.repaired.select("doc_id"), Seq("doc_id"), "left_anti")
      .collect()
    assert(audit(4)._2 == audit(3)._2 - dropped.length)
    assert(dropped.forall(_.getAs[String]("split") != "train"),
      "leakage repair must never drop train docs")
    assert(audit(4)._2 == Pipelines.p20ReleaseCorpus(spark, sf).count())
    // the chain is monotone and deterministic
    assert(audit(1)._2 >= audit(2)._2 && audit(3)._2 >= audit(4)._2)
    val again = Pipelines.p20ReleaseBuild(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSet
    assert(again == audit.map { case (k, (_, d, c)) => (k, d, c) }.toSet)
  }

  test("p21 datasheet: every metric equals the operator that owns it") {
    import org.apache.spark.sql.functions._
    val sheet = Pipelines.p21CorpusDatasheet(spark, sf).collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("metric")) ->
        r.getAs[Long]("value")).toMap
    val docs = Tables.documents(spark, sf)
    assert(sheet(("size", "docs")) == docs.count())
    assert(sheet(("size", "chars")) ==
      docs.agg(sum(length(col("text")))).first().getLong(0))
    // per-lang composition covers every doc exactly once
    val langRows = sheet.filter(_._1._2.startsWith("docs_lang_"))
    assert(langRows.values.sum == sheet(("size", "docs")))
    assert(sheet(("composition", "sources")) ==
      docs.select("source").distinct().count())
    // funnel survivors mirror p17's rows
    val p17 = Pipelines.p17FilterFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("stage_name") -> r.getAs[Long]("n_kept")).toMap
    p17.foreach { case (st, kept) =>
      assert(sheet(("cleaning", s"funnel_kept_$st")) == kept)
    }
    // duplication: exact groups, corpus novelty, span chars — each from
    // its gated source
    assert(sheet(("duplication", "exact_dup_groups")) ==
      graft.operators.Dedup.d01ExactDedup(spark, sf)
        .select("dup_group").distinct().count())
    val nov = graft.operators.TextAnalysis.t30NoveltyScan(spark, sf)
      .agg(sum(col("sh_unique")).as("u"), sum(col("sh_total")).as("t"))
      .first()
    assert(sheet(("duplication", "novelty_ppm")) ==
      nov.getLong(0) * 1000000L / nov.getLong(1))
    assert(sheet(("duplication", "duplicated_span_chars")) ==
      graft.operators.Dedup.d20SpanSurgery(spark, sf)
        .agg(sum(col("chars_removed"))).first().getLong(0))
    assert(sheet(("distribution", "max_source_drift_l1_ppm")) ==
      graft.operators.TextAnalysis.t31SourceDrift(spark, sf)
        .agg(max(col("l1_ppm"))).first().getLong(0))
    // prose corpus: the routing row is honestly zero
    assert(sheet(("routing", "code_routed_docs")) == 0L)
  }

  test("p20 staged build: checkpointed == one-shot; a killed build resumes byte-identically without the source") {
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    // the source corpus as a DELETABLE copy — resume must never touch it
    val srcDir = java.nio.file.Files.createTempDirectory("p20src").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$srcDir/documents.parquet")
    val work = java.nio.file.Files.createTempDirectory("p20work").toString
    val audit1 = rows(Pipelines.p20ReleaseBuild(spark, srcDir, work))
    val corpus1 = rows(Pipelines.p20ReleaseCorpus(spark, srcDir, work))
    // the staged build equals the one-shot chain on the same content
    assert(audit1 == rows(Pipelines.p20ReleaseBuild(spark, sf)),
      "staged audit diverged from the one-shot chain")
    assert(corpus1 == rows(Pipelines.p20ReleaseCorpus(spark, sf)),
      "staged corpus diverged from the one-shot chain")
    // kill between stages: stages 3-4 lost, an uncommitted stage-3 dir
    // (no _SUCCESS) left behind, and the SOURCE corpus deleted — the
    // resume must rebuild 3-4 from the stage-2 artifact alone
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/stage3-span_surgery"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/stage4-leakage_repair"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/stage3-span_surgery"))
    // plus an orphaned tmp from a write that died mid-flight — the
    // resume must sweep it (it would otherwise leak a partial stage
    // corpus forever)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/.tmp-stage3-span_surgery-123"))
    fs.delete(new org.apache.hadoop.fs.Path(srcDir), true)
    assert(rows(Pipelines.p20ReleaseBuild(spark, srcDir, work)) == audit1,
      "resumed audit diverged")
    assert(rows(Pipelines.p20ReleaseCorpus(spark, srcDir, work)) == corpus1,
      "resumed corpus diverged")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(work))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty, s"orphaned tmp dirs must sweep: ${leftovers.toSeq}")
  }

  test("p21 release datasheet: metrics equal their source operators on the released corpus; build rows mirror the audit") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("p21rel").toString
    val sheet = Pipelines.p21ReleaseDatasheet(spark, sf, work).collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("metric")) ->
        r.getAs[Long]("value")).toMap
    val released = Pipelines.p20ReleaseCorpus(spark, sf, work)
    assert(sheet(("size", "docs")) == released.count())
    assert(sheet(("size", "chars")) ==
      released.agg(sum(length(col("text")))).first().getLong(0))
    val langRows = sheet.filter(_._1._2.startsWith("docs_lang_"))
    assert(langRows.values.sum == sheet(("size", "docs")),
      "per-lang composition must cover every released doc exactly once")
    assert(sheet(("duplication", "exact_dup_groups")) ==
      released.select(graft.operators.Dedup.d01DupKey).distinct().count())
    val nov = graft.operators.TextAnalysis.t30NoveltyScanOf(released)
      .agg(sum(col("sh_unique")).as("u"), sum(col("sh_total")).as("t")).first()
    assert(sheet(("duplication", "novelty_ppm")) ==
      nov.getLong(0) * 1000000L / nov.getLong(1))
    assert(sheet(("duplication", "duplicated_span_chars")) ==
      graft.operators.Dedup.d20SpanSurgeryOf(released)
        .agg(coalesce(sum(col("chars_removed")), lit(0L))).first().getLong(0))
    assert(sheet(("distribution", "max_source_drift_l1_ppm")) ==
      graft.operators.TextAnalysis.t31SourceDriftOf(released)
        .agg(max(col("l1_ppm"))).first().getLong(0))
    assert(sheet(("routing", "code_routed_docs")) ==
      graft.operators.TextAnalysis.t32CodeDetectOf(released)
        .agg(coalesce(sum(col("n_code")), lit(0L))).first().getLong(0))
    // build section mirrors the staged audit, stage-attributed
    val audit = Pipelines.p20ReleaseBuild(spark, sf, work).collect()
    audit.foreach { r =>
      val (i, nm) = (r.getAs[Int]("stage"), r.getAs[String]("stage_name"))
      assert(sheet(("build", s"stage${i}_${nm}_docs")) == r.getAs[Long]("n_docs"))
      assert(sheet(("build", s"stage${i}_${nm}_chars")) == r.getAs[Long]("n_chars"))
    }
    // no raw-funnel section on a released corpus (the build section is
    // its cleaning story)
    assert(!sheet.keySet.exists(_._1 == "cleaning"))
  }

  test("p18 diff: NULL-text docs report by presence, not hash nullability") {
    val sess = spark
    import sess.implicits._
    val prev = Seq(
      (1L, "s", Option("same")), (2L, "s", Option.empty[String]),
      (3L, "s", Option.empty[String]), (4L, "s", Option("gone")),
      (6L, "s", Option("was text"))).toDF("doc_id", "source", "text")
    val curr = Seq(
      (1L, "s", Option("same")), (2L, "s", Option.empty[String]),
      (3L, "s", Option("now text")), (5L, "s", Option("new")),
      (6L, "s", Option.empty[String])).toDF("doc_id", "source", "text")
    val got = Pipelines.p18ReleaseDiff(prev, curr).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
    // 1 unchanged, 2 unchanged (NULL→NULL), 3 changed (NULL→text),
    // 6 changed (text→NULL), 4 removed, 5 added
    assert(got == Map("unchanged" -> 2L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L), s"diff misclassified NULL text: $got")
  }

  test("p21 sections: NULL lang/source bucket under the sentinel instead of vanishing") {
    val sess = spark
    import sess.implicits._
    val docs = Seq(
      (1L, Option("en"), Option("web"), "alpha beta gamma delta"),
      (2L, Option.empty[String], Option.empty[String], "epsilon zeta eta theta"),
      (3L, Option("en"), Option("web"), "iota kappa lambda mu"))
      .toDF("doc_id", "lang", "source", "text")
    val sheet = Pipelines.p21SectionsOf(docs).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    val langRows = sheet.filter(_._1.startsWith("docs_lang_"))
    assert(langRows.values.sum == 3L,
      s"NULL-lang docs must still count in composition: $langRows")
    assert(sheet.contains("docs_lang_ <null>"),
      s"NULL lang must bucket under the sentinel: ${langRows.keySet}")
    assert(sheet("sources") == 2L,
      "NULL source must count as its own sentinel bucket")
  }

  test("cleanCorpus fuses map stages into one scan (single pre-window shuffle)") {
    val plan = Pipelines.cleanCorpus(spark, sf).queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"pipeline should read documents exactly once:\n$plan")
  }

  test("p17 funnel: waterfall reconciles with the pipeline; sole-fail bounded by stage drops") {
    val rows = Pipelines.p17FilterFunnel(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("stage")).toSeq == Seq(1, 2, 3, 4))
    val byStage = rows.map(r => r.getAs[Int]("stage") -> r).toMap
    // chaining: each stage's survivors are the next stage's input
    (1 to 3).foreach { s =>
      assert(byStage(s).getAs[Long]("n_kept") == byStage(s + 1).getAs[Long]("n_in"),
        s"stage $s survivors != stage ${s + 1} input")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_in") - r.getAs[Long]("n_kept"))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_in"))
    }
    // stage 1 input is the whole corpus; stage 4 survivors are exactly
    // the pipeline's output (the report explains cleanCorpus, row-exact)
    assert(byStage(1).getAs[Long]("n_in") ==
      Tables.documents(spark, sf).count())
    assert(byStage(4).getAs[Long]("n_kept") ==
      Pipelines.cleanCorpus(spark, sf).count(),
      "funnel's final survivors must equal the pipeline output")
    // sole-fail (order-free) can never exceed the filter's waterfall
    // drop when it runs FIRST — for lang (stage 1) they are comparable;
    // later stages' sole counts are bounded by docs failing ANYWHERE
    assert(byStage(1).getAs[Long]("n_sole_fail") <=
      byStage(1).getAs[Long]("n_dropped"))
    val totalDropped = (1 to 3).map(byStage(_).getAs[Long]("n_dropped")).sum
    (1 to 3).foreach { s =>
      assert(byStage(s).getAs[Long]("n_sole_fail") <= totalDropped,
        s"stage $s sole-fail exceeds all predicate drops")
    }
    assert(byStage(4).isNullAt(byStage(4).fieldIndex("n_sole_fail")),
      "dedup stage has no per-doc sole-fail notion")
    // the funnel is one scan of documents (flags fuse map-side; the
    // distinct-group count rides the same aggregate)
    val plan = Pipelines.p17FilterFunnel(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"funnel should read documents exactly once:\n$plan")
    // empty-relation robustness (the stream twin's empty micro-batch):
    // count = 0 but sum = NULL on an empty no-group agg — the report
    // must come back all-zero, never null
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val z = Pipelines.p17FunnelOf(Pipelines.p17Flags(empty)).collect()
    assert(z.length == 4 && z.forall(r => r.getAs[Long]("n_in") == 0 &&
      r.getAs[Long]("n_kept") == 0 && r.getAs[Long]("n_dropped") == 0),
      s"empty input must yield an all-zero funnel: ${z.toSeq}")
  }

  test("p10 near-dup build: keep rule, accounting, and drop set match a driver recompute") {
    val cleaned = Pipelines.cleanCorpus(spark, sf).cache()
    try {
      val report = Pipelines.p10NeardupCorpus(spark, sf).collect()
      assert(report.nonEmpty)
      // per-group accounting: kept + dropped = cleaned population
      val cleanedCounts = cleaned.groupBy("lang", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      report.foreach { r =>
        val key = (r.getString(0), r.getString(1))
        assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_neardup_dropped")
          == cleanedCounts(key), s"accounting broken for $key")
      }
      assert(report.map(r => (r.getString(0), r.getString(1))).toSet
        == cleanedCounts.keySet)
      // driver recompute of the drop set: union-find over the verified
      // pair graph, component-min survives (d01 keep rule)
      val pairs = graft.operators.Dedup
        .minhashVerifiedPairs(cleaned.select(col("doc_id"), col("text")))
        .select("doc_i", "doc_j").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, "fixture must produce at least one near-dup pair")
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (i, j) =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) { if (ri < rj) parent(rj) = ri else parent(ri) = rj }
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expectedDrops = members.filter(m => find(m) != m).toSet
      assert(expectedDrops.nonEmpty)
      val droppedTotal = report.map(_.getAs[Long]("n_neardup_dropped")).sum
      assert(droppedTotal == expectedDrops.size,
        s"drop count ${droppedTotal} != union-find ${expectedDrops.size}")
    } finally cleaned.unpersist()
  }

  test("p11 repair agrees with the d10 detector and never touches train") {
    import org.apache.spark.sql.functions._
    val report = Pipelines.p11LeakageRepair(spark, sf).collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n_docs_before"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_docs_after"))).toMap
    // single-sourcing: dropped-per-split must equal the detector's flag
    // count per split — the repair can never disagree with d10
    val flagged = graft.operators.Dedup.d10CrossSplitLeakage(spark, sf)
      .groupBy(col("split")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    report.foreach { case (split, (before, dropped, after)) =>
      assert(before == dropped + after, s"$split accounting broken")
      if (split == "train") assert(dropped == 0L, "train must pass through")
      else assert(dropped == flagged.getOrElse(split, 0L),
        s"$split dropped $dropped != detector ${flagged.getOrElse(split, 0L)}")
    }
    assert(report.contains("train") && report.keySet.subsetOf(Set("train", "val", "test")))
  }

  // ───────────────────────── p12: training-shard export ─────────────────

  /** Independent left-to-right BPE fuse — written fresh (fuseLtr's rule)
    * so the p12 recompute shares no code with the operator or bpeMerges. */
  private def p12Fuse(word: String, rules: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] =
      word.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp))) :+ "</w>"
    for ((l, r) <- rules) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** The full driver-side export model: per doc (key, shard, token ids)
    * under epoch 1, plus the sorted-vocab id mapping. */
  private def p12DriverModel(): (Seq[(Long, Long, Long, Seq[Int])], IndexedSeq[String]) = {
    import graft.operators.{Sampling, TextAnalysis}
    val P = graft.functions.TextFunctions.HashMod
    val rules = TextAnalysis.bpeMerges(
      TextAnalysis.bpeWordCounts(spark, sf, 4096), 20).map(m => (m._2, m._3))
    val m = java.lang.Math.floorMod(Sampling.EpochA + Sampling.EpochB, P)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .filter(_.getString(1).trim.nonEmpty)
      .map { r =>
        val id = r.getLong(0)
        val syms = r.getString(1).trim.split("\\s+").toSeq
          .flatMap(w => p12Fuse(w, rules))
        (id, syms)
      }
    val vocab = docs.flatMap(_._2).distinct.sorted.toIndexedSeq
    val idOf = vocab.zipWithIndex.toMap
    val rows = docs.map { case (id, syms) =>
      val key = java.lang.Math.floorMod(java.lang.Math.floorMod(id, P) * m, P)
      val shard = key * graft.operators.Sampling.ShuffleShards / P
      (id, key, shard, syms.map(idOf))
    }.toSeq
    (rows, vocab)
  }

  test("p12: per-shard audit matches the full driver recompute") {
    val (model, _) = p12DriverModel()
    val B = graft.operators.Sampling.PackBudget
    val expected = model.groupBy(_._3).map { case (shard, ds) =>
      val ordered = ds.sortBy(d => (d._2, d._1))
      val nTok = ordered.map(_._4.length.toLong).sum
      var off = 0L
      var boundary = 0L
      ordered.foreach { d =>
        val end = off + d._4.length
        if ((end - 1) / B > off / B) boundary += 1
        off = end
      }
      shard -> (ordered.length.toLong, nTok, (nTok + B - 1) / B,
        ordered.head._1, ordered.last._1, boundary,
        ordered.map(_._2).min, ordered.map(_._2).max)
    }
    val got = Pipelines.p12TrainingShards(spark, sf).collect().map { r =>
      r.getAs[Long]("shard") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_chunks"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc"), r.getAs[Long]("n_boundary_docs"),
        r.getAs[Long]("min_key"), r.getAs[Long]("max_key"))
    }.toMap
    assert(got.keySet == expected.keySet, "shard sets differ")
    expected.foreach { case (shard, e) =>
      assert(got(shard) == e, s"shard $shard audit diverged: ${got(shard)} vs $e")
    }
    assert(got.values.map(_._2).sum > 0)
  }

  test("p12: shard replay reproduces the exact token-id stream in fixed windows") {
    val (model, vocab) = p12DriverModel()
    // the busiest shard exercises multi-chunk packing hardest
    val shard = model.groupBy(_._3).maxBy(_._2.size)._1
    val driverStream = model.filter(_._3 == shard)
      .sortBy(d => (d._2, d._1)).flatMap(_._4)
    val chunks = Pipelines.p12ShardChunks(spark, sf, shard).collect()
      .map(r => r.getAs[Long]("chunk") -> r.getSeq[Int](1))
    assert(chunks.nonEmpty)
    // chunk ids contiguous from 0; every chunk full except the last
    val B = graft.operators.Sampling.PackBudget.toInt
    assert(chunks.map(_._1).toSeq == (0L until chunks.length.toLong),
      s"chunk ids not contiguous: ${chunks.map(_._1).toSeq}")
    chunks.init.foreach { case (c, ids) =>
      assert(ids.length == B, s"chunk $c has ${ids.length} tokens, want $B") }
    assert(chunks.last._2.nonEmpty && chunks.last._2.length <= B)
    // token-for-token replay
    val flat = chunks.sortBy(_._1).flatMap(_._2).toSeq
    assert(flat == driverStream,
      s"shard $shard token stream diverged (${flat.length} vs ${driverStream.length} ids)")
    // and the engine vocab is the driver vocab (ids are meaningful)
    assert(Pipelines.p12Vocab(spark, sf) == vocab, "vocab file diverged")
  }

  test("p12: native graft_sym_ids equals the declarative split/filter mirror") {
    import graft.operators.TextAnalysis
    val rules = TextAnalysis.bpeMerges(
      TextAnalysis.bpeWordCounts(spark, sf, 4096), 20).map(m => (m._2, m._3))
    val vocab = Pipelines.p12Vocab(spark, sf)
    val enc = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("enc", graft.functions.NativeFunctions.bpeApply(
        graft.functions.TextFunctions.tokens(col("text")), rules))
    val diff = enc.select(
        graft.functions.NativeFunctions.symIds(col("enc"), vocab).as("native"),
        Pipelines.p12SymIdsDeclarative(col("enc"), vocab).as("decl"))
      .filter(not(col("native") <=> col("decl"))).count()
    assert(diff == 0L, s"$diff docs disagree between native and declarative sym-ids")
  }

  test("p14: shard structure equals p12's on every tokenizer-independent field") {
    def structure(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"),
          r.getAs[Long]("last_doc"), r.getAs[Long]("min_key"),
          r.getAs[Long]("max_key"))).toMap
    // same docs, same epoch key, same shard binning — only the token
    // UNIT differs, so everything except the token/chunk counts must
    // be identical between the gated whitespace form and the BPE form
    val p14 = structure(Pipelines.p14ShardLayout(spark, sf))
    val p12 = structure(Pipelines.p12TrainingShards(spark, sf))
    assert(p14 == p12, "p14 and p12 disagree on shard structure")
  }

  test("p12: the written shard artifact replays identically") {
    val out = java.nio.file.Files.createTempDirectory("p12shards").toString
    try {
      Pipelines.p12WriteShards(spark, sf, out)
      val (model, _) = p12DriverModel()
      val shard = model.groupBy(_._3).maxBy(_._2.size)._1
      val readBack = spark.read.parquet(out)
        .filter(col("shard") === shard)
        .select(col("chunk"), col("token_ids")).collect()
        .map(r => r.getAs[Long]("chunk") -> r.getSeq[Int](1)).sortBy(_._1)
      val direct = Pipelines.p12ShardChunks(spark, sf, shard).collect()
        .map(r => r.getAs[Long]("chunk") -> r.getSeq[Int](1)).sortBy(_._1)
      assert(readBack.toSeq == direct.toSeq,
        "at-rest artifact diverged from the computed chunks")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  /** Driver recompute of the cross-corpus OOV audit under the UNK
    * policy (OOV symbol → id = vocab.size). */
  private def oovAuditModel(rules: Seq[(String, String)],
      vocab: IndexedSeq[String], applyDocs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long, Long)] = {
    val idOf = vocab.zipWithIndex.toMap
    val unk = vocab.size
    val per = applyDocs.filter(_._3.trim.nonEmpty).map { case (_, src, text) =>
      val syms = text.trim.split("\\s+").toSeq.flatMap(w => p12Fuse(w, rules))
      val ids = syms.map(s => idOf.getOrElse(s, unk))
      (src, ids.size.toLong, ids.count(_ == unk).toLong)
    }
    per.groupBy(_._1).map { case (src, xs) =>
      val nIds = xs.map(_._2).sum
      val nOov = xs.map(_._3).sum
      src -> (xs.size.toLong, nIds, nOov, xs.count(_._3 > 0).toLong,
        nOov * 1000000L / math.max(1L, nIds))
    }
  }

  private def collectAudit(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_ids"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("docs_with_oov"), r.getAs[Long]("oov_ppm"))).toMap

  test("p15/p16: spans partition every chunk and reconcile with the audit and the written chunks") {
    import org.apache.spark.sql.functions._
    val B = graft.operators.Sampling.PackBudget
    for ((name, spans, audit) <- Seq(
        ("p15", graft.operators.Pipelines.p15ChunkSpans(spark, sf),
          graft.operators.Pipelines.p12TrainingShards(spark, sf)),
        ("p16", graft.operators.Pipelines.p16SpanLayout(spark, sf),
          graft.operators.Pipelines.p14ShardLayout(spark, sf)))) {
      val rows = spans.collect().map(r => (r.getAs[Long]("shard"),
        r.getAs[Long]("chunk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
      val aud = audit.collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("n_boundary_docs"))).toMap
      // per (shard, chunk): spans are contiguous from 0 and end at the
      // chunk's true token count (B everywhere but a shard's last chunk)
      rows.groupBy(r => (r._1, r._2)).foreach { case ((sh, c), ss) =>
        val ordered = ss.sortBy(_._4)
        assert(ordered.head._4 == 0L, s"$name shard $sh chunk $c starts late")
        ordered.zip(ordered.tail).foreach { case (a, b) =>
          assert(a._5 == b._4, s"$name shard $sh chunk $c: gap ${a._5}→${b._4}")
        }
        val (nTok, nChunks, _) = aud(sh)
        val expectEnd = if (c == nChunks - 1) nTok - c * B else B.toLong
        assert(ordered.last._5 == expectEnd,
          s"$name shard $sh chunk $c ends at ${ordered.last._5}, want $expectEnd")
      }
      // every audited chunk is present; boundary docs (rows in >1
      // chunk) match the audit's count per shard
      aud.foreach { case (sh, (_, nChunks, nBoundary)) =>
        val chunks = rows.filter(_._1 == sh).map(_._2).distinct.sorted.toSeq
        assert(chunks == (0L until nChunks).toSeq,
          s"$name shard $sh chunk set $chunks != 0..${nChunks - 1}")
        val multi = rows.filter(_._1 == sh).groupBy(_._3)
          .count(_._2.length > 1).toLong
        assert(multi == nBoundary,
          s"$name shard $sh boundary docs $multi != audit $nBoundary")
      }
    }
    // p15's span lengths agree with the WRITTEN chunk rows token-for-token
    val chunkLens = graft.operators.Pipelines.p12Chunks(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk")) ->
        r.getSeq[Int](r.fieldIndex("token_ids")).size.toLong).toMap
    val spanLens = graft.operators.Pipelines.p15ChunkSpans(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk")) ->
        (r.getAs[Long]("tok_end") - r.getAs[Long]("tok_start")))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    assert(spanLens == chunkLens,
      "p15 span lengths must sum to each exported chunk's token count")
  }

  test("p12 OOV contract: cross-corpus UNK mapping is exact, fail-fast default untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rules = graft.operators.Pipelines.p12Rules(spark, sf, 20, 4096)
    val vocab = graft.operators.Pipelines.p12Vocab(spark, sf)
    // apply corpus the tokenizer never saw: two in-vocab docs lifted
    // from the train corpus + one doc with characters OUTSIDE the train
    // alphabet (guaranteed OOV symbols)
    val seen = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .orderBy("doc_id").limit(2)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val applyDocs = seen.toSeq :+ (9000L, "exotic", "αβγ δεζ the ηθι")
    val dir = java.nio.file.Files.createTempDirectory("p12oov").toString
    applyDocs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val got = collectAudit(
      graft.operators.Pipelines.p12CrossCorpusAudit(spark, sf, dir))
    val want = oovAuditModel(rules, vocab, applyDocs)
    assert(got == want, s"cross-corpus audit diverged:\ngot  $got\nwant $want")
    // the exotic doc must actually exercise the UNK path
    assert(got("exotic")._3 > 0, "fixture failed to produce OOV symbols")
    // positions keep under UNK: id count equals the full symbol count
    assert(got("exotic")._2 ==
      applyDocs.filter(_._2 == "exotic").map(d =>
        d._3.trim.split("\\s+").toSeq.flatMap(w => p12Fuse(w, rules)).size).sum)
    // and the SAME-corpus default still fails fast — cross-corpus mode
    // is an explicit opt-in, not a silent behavior change
    val ex = intercept[Exception] {
      Tables.documents(spark, dir)
        .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
        .withColumn("enc", graft.functions.NativeFunctions.bpeApply(col("toks"), rules))
        .select(graft.functions.NativeFunctions.symIds(col("enc"), vocab))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last.getMessage)
    assert(rootMsg(ex).contains("graft_sym_ids"),
      s"expected the fail-fast OOV error, got: ${rootMsg(ex)}")
  }

  test("p12 OOV contract: sf0.001-trained tokenizer applied to sf0.01, accounting pinned") {
    val applySf = "/root/testdata/sf0.01"
    val rules = graft.operators.Pipelines.p12Rules(spark, sf, 20, 4096)
    val vocab = graft.operators.Pipelines.p12Vocab(spark, sf)
    val applyDocs = Tables.documents(spark, applySf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = collectAudit(
      graft.operators.Pipelines.p12CrossCorpusAudit(spark, sf, applySf))
    val want = oovAuditModel(rules, vocab, applyDocs)
    assert(got == want,
      s"sf0.001→sf0.01 audit diverged:\ngot  $got\nwant $want")
    // the audit covers the whole apply corpus
    assert(got.values.map(_._1).sum ==
      applyDocs.count(_._3.trim.nonEmpty))
  }
}
