package graft

import graft.operators.Pipelines

/** Smoke spec for the `graft.Release` ops main (round 13): the p20
  * staged release build + p21 datasheet behind one driveable command,
  * with the kill-and-resume contract exercised THROUGH the CLI path
  * (the staged internals are pinned in PipelinesSpec; this pins that
  * the command composes them and that its datasheet artifact obeys the
  * same resume rules). */
class ReleaseSpec extends GraftSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("release main: builds staged artifacts + datasheet; killed build resumes identically") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("releasecli").toString
    val (audit1, sheet1) = Release.runBuild(spark, sf, work)
    val a1 = rows(audit1); val s1 = rows(sheet1)
    // every stage + the datasheet is a committed artifact
    for (n <- Seq("stage0-raw", "stage1-clean_dedup_split",
        "stage2-neardup_keep", "stage3-span_surgery",
        "stage4-leakage_repair", "datasheet"))
      assert(new java.io.File(s"$work/$n/_SUCCESS").exists(),
        s"$n must publish committed")
    // the audit's released row is the stage-4 artifact, not lineage
    val released = spark.read.parquet(s"$work/stage4-leakage_repair")
    val r4 = audit1.filter(col("stage") === 4).head()
    assert(r4.getAs[Long]("n_docs") == released.count())
    assert(r4.getAs[Long]("n_chars") ==
      released.agg(sum(length(col("text")))).head().getLong(0))
    // the datasheet is p21's release sheet served from the artifacts
    assert(s1 == rows(Pipelines.p21ReleaseDatasheet(spark, sf, work)),
      "CLI datasheet diverged from the p21 release surface")
    assert(s1.nonEmpty)
    // kill after stage 3: stage 4 + datasheet lost, an orphaned
    // datasheet tmp left mid-flight — relaunching the SAME command
    // rebuilds both from the stage-3 artifact, byte-identically
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/stage4-leakage_repair"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/datasheet"), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/.tmp-datasheet-99"))
    val (audit2, sheet2) = Release.runBuild(spark, sf, work)
    assert(rows(audit2) == a1, "resumed audit diverged")
    assert(rows(sheet2) == s1, "resumed datasheet diverged")
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(work))
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty, s"orphaned tmp dirs must sweep: ${leftovers.toSeq}")
    // a completed build re-run is a pure no-op serve
    val (audit3, sheet3) = Release.runBuild(spark, sf, work)
    assert(rows(audit3) == a1 && rows(sheet3) == s1)
  }

  test("release knobs: threaded through the chain, pinned in the workDir, mismatch refuses") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files.createTempDirectory("releaseknob").toString
    // a floor derived from the corpus (median whitespace-token count
    // + 1) is guaranteed to bite — a fixed literal silently stopped
    // biting when every cleaned doc cleared it
    val floor = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("double").as("n"))
      .stat.approxQuantile("n", Array(0.5), 0.0)(0).toInt + 1
    val strict = Pipelines.P20Knobs(minTokens = floor)
    val (audit, _) = Release.runBuild(spark, sf, work, strict)
    // the knob genuinely reaches stage 1: the median-derived floor
    // keeps fewer docs than the default floor on the same corpus
    val s1strict = audit.filter(col("stage") === 1).head().getAs[Long]("n_docs")
    val s1default = Pipelines.p20ReleaseBuild(spark, sf)
      .filter(col("stage") === 1).head().getAs[Long]("n_docs")
    assert(s1strict < s1default,
      s"minTokens=$floor must shrink stage 1: $s1strict vs default $s1default")
    // same knobs resume cleanly; DIFFERENT knobs refuse loudly instead
    // of silently serving stages built under the old regime
    val (audit2, _) = Release.runBuild(spark, sf, work, strict)
    assert(rows(audit2) == rows(audit))
    val ex = intercept[IllegalArgumentException] {
      Release.runBuild(spark, sf, work, Pipelines.P20Knobs())
    }
    assert(ex.getMessage.contains("different knobs"),
      s"knob mismatch must refuse with the pinned marker: ${ex.getMessage}")
  }
}
