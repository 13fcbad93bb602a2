package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.col

/** Smoke spec for the `graft.Nightly` ops main (round 12): the
  * build → probe → absorb → compact cycle as a driveable command,
  * pinned against the public d18 surface it single-sources. */
class NightlySpec extends GraftSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("nightly cycles: probe parity, derived ids, compaction fold, self-pair alert") {
    val work = java.nio.file.Files.createTempDirectory("nightly").toString
    val root = s"$work/tree"
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    Dedup.d18BuildIndex(base, s"$root/base")
    b1.write.parquet(s"$work/arr1")
    b2.write.parquet(s"$work/arr2")

    // night 1: id derives to 0 (fresh tree), pairs match the public
    // d18FromIndex against the flat base index, no self-pairs
    val (id1, n1, self1, folded1, _) =
      Nightly.runCycle(spark, root, s"$work/arr1", s"$work/out1")
    assert(id1 == 0L && self1 == 0L && folded1 == 0)
    assert(n1 > 0, "fixture must surface cross-side pairs")
    assert(rows(spark.read.parquet(s"$work/out1")) ==
      rows(Dedup.d18FromIndex(spark, s"$root/base", b1)),
      "night-1 pairs diverged from the public d18 surface")

    // night 2 with maxGenerations = 1: probe sees base ∪ absorbed b1,
    // then compaction folds batch-0 into base (horizon advances to 0)
    val (id2, _, self2, folded2, h2) =
      Nightly.runCycle(spark, root, s"$work/arr2", s"$work/out2",
        maxGenerations = 1)
    assert(id2 == 1L && self2 == 0L)
    assert(folded2 == 1 && h2 == 0L,
      s"compaction must fold the old generation: folded=$folded2 horizon=$h2")
    val ref = s"$work/refidx"
    Dedup.d18BuildIndex(base.unionByName(b1), ref)
    assert(rows(spark.read.parquet(s"$work/out2")) ==
      rows(Dedup.d18FromIndex(spark, ref, b2)),
      "night-2 pairs diverged from a flat rebuild over the same corpus")

    // night 3 RE-RUNS arr1 (operator error: that night already
    // absorbed): the derived id clears the horizon (2 > 0), and the
    // disjointness breach surfaces as the documented self-pair alert
    val (id3, _, self3, _, _) =
      Nightly.runCycle(spark, root, s"$work/arr1", s"$work/out3")
    assert(id3 == 2L, "derived id must clear both committed ids and the horizon")
    assert(self3 > 0,
      "re-absorbing an already-absorbed night must alert as self-pairs")
  }

  test("nightly crash after the absorb commit: relaunch resumes under its own id") {
    val work = java.nio.file.Files.createTempDirectory("nightly-resume").toString
    val root = s"$work/tree"
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 2 === 0)
    val arr = docs.filter(col("doc_id") % 2 === 1)
    Dedup.d18BuildIndex(base, s"$root/base")
    arr.write.parquet(s"$work/arr")

    val (idA, nA, selfA, _, _) =
      Nightly.runCycle(spark, root, s"$work/arr", s"$work/outA")
    assert(idA == 0L && selfA == 0L && nA > 0)
    val pairsA = rows(spark.read.parquet(s"$work/outA"))

    // a crash between the absorb commit and the end of the night leaves
    // the generation committed and (possibly) the pairs dir missing or
    // partial; the operator relaunches the SAME command. Before r12's
    // resume rule the id derived to committedMax+1 and the same
    // arrivals were silently re-absorbed as a fresh generation (df
    // counts doubled, every later probe self-paired). Now the newest
    // committed generation content-matches the batch, so the night
    // REPLAYS under its own id: absorb no-ops, pairs recompute
    // byte-identically, no alert fires.
    val (idB, _, selfB, _, _) =
      Nightly.runCycle(spark, root, s"$work/arr", s"$work/outB")
    assert(idB == 0L, s"relaunch must resume under the committed id, got $idB")
    assert(selfB == 0L, "an idempotent resume must not alert")
    assert(rows(spark.read.parquet(s"$work/outB")) == pairsA,
      "resumed night's pair report must equal the crashed night's")

    // and the tree holds ONE committed generation, not two
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val gens = streaming.GenerationTree.liveGenerations(fs,
      new org.apache.hadoop.fs.Path(root), None)
      .flatMap(p => streaming.GenerationTree.genId(p.getName))
    assert(gens == Seq(0L), s"double absorption: $gens")
  }
}
