package graft

import org.apache.spark.sql.functions._

/** The CDR reference-scale workload's pieces at spec size: the
  * closed-form residue counters must equal ACTUAL corpus counts (they
  * are the 10M gate's oracle, so they get their own gate here), and the
  * full workload run must come back all-ok on a small written corpus. */
class CdrWorkloadSpec extends GraftSuite {

  test("residue arithmetic equals actual corpus counts (incl. ragged tail)") {
    import CdrCorpus._
    val n = 12345L // deliberately not a multiple of any field modulus
    val df = lines(spark, n, 4).cache()
    try {
      assert(df.count() === n)
      // finder needle: exact planted class
      assert(df.filter(col("value").contains(NeedleIp)).count() ===
        residueCount(n, Seq(NeedleMod -> NeedleRem)))
      // grep conjunction (event mod 8 AND proto mod 7)
      val pat = s"${Events(6)}: proto 3"
      assert(df.filter(regexp_like(col("value"), lit(pat))).count() ===
        residueCount(n, Seq(Events.size.toLong -> 6L, 7L -> 3L)))
      // proto sum over all records
      val got = df.select(sum(
        regexp_extract(col("value"), "proto (\\d+)", 1).cast("long"))).head().getLong(0)
      assert(got === residueProtoSum(n, Seq(1L -> 0L)))
    } finally df.unpersist()
  }

  test("every generated line parses under the graft-cdr LinePattern") {
    import CdrCorpus._
    val sample = lines(spark, 2000, 2).collect().map(_.getString(0))
    assert(sample.forall {
      case sources.cdr.CdrTable.LinePattern(_*) => true
      case _ => false
    })
    // field fidelity on one known id: id=42 -> user 42, event idx 2
    val l42 = sample(42)
    assert(l42.contains("[USER42]:") && l42.contains(s"${Events(2)}: proto 0"))
  }

  test("full workload over a written corpus is all-ok") {
    val dir = java.nio.file.Files.createTempDirectory("cdrspec").toString
    ScaleGen.generateCdr(spark, s"$dir/corpus", 20000L, files = 4)
    val json = CdrWorkload.run(spark, s"$dir/corpus", s"$dir/work")
    assert(json.contains("\"all_ok\":true"), json)
    assert(json.contains("\"records\":20000"), json)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
