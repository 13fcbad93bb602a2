package graft

import graft.operators.Multimodal

class MultimodalSpec extends GraftSuite {

  test("m01 digests are unique per doc and byte lengths match n_chars encoding") {
    val rows = Multimodal.m01BinaryMeta(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val digests = rows.map(_.getAs[String]("digest"))
    assert(digests.forall(_.length == 64))
    assert(digests.distinct.length == digests.length, "sha256 collision on distinct texts?")
    rows.foreach(r => assert(r.getAs[Long]("n_bytes") > 0))
  }

  test("batched inference covers every doc in full batches (tail excepted)") {
    val out = Multimodal.batchedInference(spark, sf, batchSize = 32).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(out.forall(_.batch_size <= 32))
    // with 4 partitions, at most one short tail batch per partition
    val short = out.map(_.batch_size).count(_ < 32)
    assert(short <= 4 * 31, s"too many underfilled batch rows: $short")
    assert(out.forall(_.embedding.length == 8))
    assert(out.map(_.doc_id).distinct.length == out.length)
  }

  test("decode pipeline emits typed metadata for every payload, deterministically") {
    val out1 = Multimodal.decodePipeline(spark, sf).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodePipeline(spark, sf).collect().sortBy(_.doc_id)
    assert(out1.length == Tables.documents(spark, sf).count())
    assert(out1.toSeq == out2.toSeq, "decode not deterministic across runs")
    out1.foreach { m =>
      assert(m.n_bytes > 0)
      assert(m.width >= 64 && m.height >= 64)
      assert(m.format == "png" || m.format == "jpeg")
    }
  }

  test("m03 payload dedup audit is internally consistent with the corpus") {
    val r = graft.operators.Multimodal.m03BinaryDedup(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val total = Tables.documents(spark, sf).count()
    assert(row.getAs[Long]("n_assets") == total)
    val unique = row.getAs[Long]("n_unique_digests")
    val dupDigests = row.getAs[Long]("n_dup_digests")
    val dupCopies = row.getAs[Long]("n_dup_copies")
    assert(unique <= total && dupDigests <= unique)
    // every duplicated digest contributes >= 2 copies; unique ones 1 each
    assert(dupCopies >= 2 * dupDigests)
    assert(total - unique == dupCopies - dupDigests,
      "copy accounting does not balance")
    assert(row.getAs[Long]("reclaimable_bytes") >= 0L)
  }
}
