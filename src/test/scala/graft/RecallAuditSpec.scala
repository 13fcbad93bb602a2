package graft

/** The RECALL artifact emitter: its JSON must parse, carry every audited
  * path, and agree with the audits it summarizes (micro-average over
  * the per-query rows) — the artifact exists so round-over-round recall
  * drift is diffable, which only works if the numbers are the audits'. */
class RecallAuditSpec extends GraftSuite {

  test("audit JSON carries every path with in-range micro-averaged recall") {
    val json = RecallAudit.audit(spark, sf)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json) // throws on malformed JSON
    val paths = root.get("paths")
    val expected = Seq("lsh_s02", "ivf_s03", "pq_s09", "pq_s09_prod",
      "sq8_s15", "multitable_s05", "range_s06",
      "pca_s14_sl8", "pca_s14_sl16", "pca_s14_sl32",
      "graph_ivf_nprobe2", "graph_refined_1round")
    expected.foreach { p =>
      val node = paths.get(p)
      assert(node != null, s"missing path $p in $json")
      val r = node.get("recall_at_3").asDouble()
      assert(r >= 0.0 && r <= 1.0, s"$p recall out of range: $r")
      assert(node.get("n_queries").asLong() > 0, s"$p has no queries")
      assert(node.get("knob").asText().nonEmpty)
    }
    // corpus fingerprint present and sane
    assert(root.get("corpus").get("n_vectors").asLong() > 0)
    // spot-check one micro-average against the audit it summarizes
    val s04 = operators.Similarity.s04AnnRecall(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("k_exact"),
        org.apache.spark.sql.functions.sum("n_hit")).head()
    val expect = s04.getLong(1).toDouble / s04.getLong(0)
    val got = paths.get("lsh_s02").get("recall_at_3").asDouble()
    assert(math.abs(got - expect) < 5e-5, s"lsh_s02 $got != $expect")
  }

  test("shortlist sweep recall is monotone in the artifact itself") {
    val json = RecallAudit.audit(spark, sf)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val paths = mapper.readTree(json).get("paths")
    val rs = Seq(8, 16, 32).map(sl =>
      paths.get(s"pca_s14_sl$sl").get("recall_at_3").asDouble())
    assert(rs(0) <= rs(1) + 1e-9 && rs(1) <= rs(2) + 1e-9,
      s"shortlist recall not monotone: $rs")
    // the triangle-bound exactness claim, measured: pruned range search
    // returns the full brute-force τ-neighbor set
    assert(paths.get("range_s06").get("recall_at_3").asDouble() == 1.0,
      "range_s06 must be exact (triangle bound)")
  }

  test("vs_prev deltas: per-path differences plus added/removed path lists") {
    val prev = """{"paths":{"lsh_s02":{"recall_at_3":0.1000,"n_queries":8,"knob":"x"},
      "gone_path":{"recall_at_3":0.5000,"n_queries":8,"knob":"x"}}}"""
    val cur = """{"paths":{"lsh_s02":{"recall_at_3":0.1250,"n_queries":8,"knob":"x"},
      "new_path":{"recall_at_3":0.9000,"n_queries":8,"knob":"x"}}}"""
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val d = mapper.readTree(RecallAudit.deltasVs("RECALL_r14.json", prev, cur))
    assert(d.get("file").asText() == "RECALL_r14.json")
    assert(math.abs(d.get("recall_deltas").get("lsh_s02").asDouble() - 0.025) < 1e-9)
    assert(d.get("added").get(0).asText() == "new_path")
    assert(d.get("removed").get(0).asText() == "gone_path")
  }
}
