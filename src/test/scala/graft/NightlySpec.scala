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
}
