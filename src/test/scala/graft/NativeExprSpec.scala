package graft

import graft.functions.{NativeFunctions => NF, TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** Parity proofs: the native codegen'd expressions must produce values
  * IDENTICAL (bit-for-bit for doubles, element-for-element for arrays)
  * to the declarative HOF forms the DuckDB oracle mirrors. */
class NativeExprSpec extends GraftSuite {

  test("native shingle hashes equal the declarative chain, order included") {
    val docs = Tables.documents(spark, sf)
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("tv", TF.tokenVals(col("toks")))
      .select(col("doc_id"),
        NF.shingleHashes(col("toks")).as("native"),
        TF.shingleHashesFromVals(col("tv")).as("decl"))
      .collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: native != declarative")
    }
  }

  test("native simhash equals the declarative chain on every doc") {
    val rows = Tables.documents(spark, sf)
      .withColumn("toks", TF.tokens(col("text")))
      .select(NF.simhash63(col("toks")).as("native"),
        graft.operators.Dedup.simhash63Declarative(col("toks")).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native minhash signature equals the declarative 32-fold chain") {
    val rows = Tables.documents(spark, sf)
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", NF.shingleHashes(col("toks")))
      .select(NF.minhashSig(col("sh")).as("native"),
        graft.operators.Dedup.minhashSig(col("sh")).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native cosine equals declarative cosine bit-for-bit") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("i"), col("label"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("j"), col("label"), col("embedding").as("vb")), Seq("label"))
      .filter(col("i") < col("j"))
      .select(VF.cosine(col("va"), col("vb")).as("native"),
        VF.cosineDeclarative(col("va"), col("vb")).as("decl"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val n = r.getDouble(0)
      val d = r.getDouble(1)
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(d),
        s"native $n != declarative $d")
    }
  }

  test("native polyFingerprint equals the declarative fold on every doc") {
    val rows = Tables.documents(spark, sf)
      .withColumn("toks", TF.tokens(col("text")))
      .select(NF.polyFingerprint(col("toks")).as("native"),
        TF.polyFingerprint(col("toks")).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native tokenVal-based hashes match declarative on NON-ASCII text") {
    import spark.implicits._
    // Multi-byte codepoints, incl. non-BMP emoji (surrogate pairs in UTF-16):
    // codepoint semantics (length()/ascii()) must hold, not charAt/UTF-16.
    val texts = Seq(
      "héllo wörld ümlaut çafé over königsberg",
      "日本語 テキスト 処理 の 例 です ここ",
      "😀grin 😀😀 mixé ascii tail😀 end",
      "ß sharp ß eszett Straße straße gross",
      "ascii only plain words for control")
    val df = texts.toDF("text")
      .withColumn("toks", TF.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("tv", TF.tokenVals(col("toks")))
    val rows = df.select(
      NF.shingleHashes(col("toks")).as("nsh"),
      TF.shingleHashesFromVals(col("tv")).as("dsh"),
      NF.simhash63(col("toks")).as("nsim"),
      graft.operators.Dedup.simhash63Declarative(col("toks")).as("dsim"),
      NF.polyFingerprint(col("toks")).as("nfp"),
      TF.polyFingerprint(col("toks")).as("dfp"))
      .collect()
    assert(rows.length == texts.length)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "non-ASCII shingle divergence")
      assert(r.getLong(2) == r.getLong(3), "non-ASCII simhash divergence")
      assert(r.getLong(4) == r.getLong(5), "non-ASCII fingerprint divergence")
    }
  }

  test("native phash63 equals the declarative 126-call SQL form per doc") {
    // corpus docs (all-ASCII fast path) ...
    val rows = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 65)
      .select(col("doc_id"),
        NF.phash63(col("text")).as("native"),
        expr(graft.operators.Multimodal.phashTerms("div")).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"doc ${r.getLong(0)}: native phash != declarative"))
    // ... plus multibyte/non-BMP text (codepoint sampling path) and the
    // short/empty edge cases the SQL form defines via ascii('') = 0
    import spark.implicits._
    val texts = Seq(
      "héllo wörld ümlaut çafé over königsberg és más texto largo para llegar",
      "日本語テキスト処理の例ですここにもっと文字を並べて長さを確保する" * 3,
      ("😀grin mixé ascii tail😀 " * 5) + "end",
      "short", "ab", "a", "")
    val nonAscii = texts.toDF("text")
      .select(NF.phash63(col("text")).as("native"),
        expr(graft.operators.Multimodal.phashTerms("div")).as("decl"))
      .collect()
    nonAscii.foreach(r => assert(r.getLong(0) == r.getLong(1),
      "non-ASCII/edge phash divergence"))
  }

  test("native BPE apply equals the declarative regex chain, and stays flat in rule count") {
    import graft.operators.TextAnalysis
    val wc = TextAnalysis.bpeWordCounts(spark, sf, topWords = 4096)
    val rules20 = TextAnalysis.bpeMerges(wc, merges = 20).map(m => (m._2, m._3))
    val docs = Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0)
      .withColumn("toks", TF.tokens(col("text")))
    // byte-for-byte parity of the encoded symbol string per doc
    // (includes the separator geometry t25's count arithmetic rides on)
    val rows = docs.select(col("doc_id"),
        NF.bpeApply(col("toks"), rules20).as("native"),
        TextAnalysis.bpeEncodeDoc(col("toks"), rules20).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: native BPE encoding != declarative"))
    // non-ASCII (incl. non-BMP) words must fuse on codepoint symbols
    import spark.implicits._
    val rulesNA = Seq(("é", "漢"), ("é漢", "🎯"), ("a", "</w>"))
    val na = Seq("é漢🎯é漢 xa aé漢🎯", "🎯🎯 ßa").toDF("text")
      .withColumn("toks", TF.tokens(col("text")))
      .select(NF.bpeApply(col("toks"), rulesNA).as("native"),
        TextAnalysis.bpeEncodeDoc(col("toks"), rulesNA).as("decl"))
      .collect()
    na.foreach(r => assert(r.getString(0) == r.getString(1),
      "non-ASCII BPE encoding divergence"))
    // rule-count flatness: 200 rules must cost about the same as 20
    // (the chained-regex plan scales linearly in rules — ~10x here).
    // Generous 4x bound keeps the pin robust to scheduler noise.
    val rules200 = TextAnalysis.bpeMerges(wc, merges = 200).map(m => (m._2, m._3))
    assert(rules200.length > 100, "digest must support >100 merges for the pin")
    def time(rs: Seq[(String, String)]): Double = {
      val t0 = System.nanoTime()
      docs.select(NF.bpeApply(col("toks"), rs).as("e"))
        .agg(sum(length(col("e")))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(rules20) // warm
    val t20 = (1 to 3).map(_ => time(rules20)).min
    val t200 = (1 to 3).map(_ => time(rules200)).min
    assert(t200 <= t20 * 4 + 0.25,
      f"200-rule apply not flat: $t200%.3fs vs $t20%.3fs for 20 rules")
  }

  test("native PQ encode and ADC fold equal the declarative HOF chains") {
    import graft.operators.Similarity
    val (books, dsub) = Similarity.pqCodebooks(spark, sf,
      Similarity.PqSubspaces, Similarity.PqCodebookSize)
    // encode: code-for-code equality incl. first-minimum tie behavior
    val enc = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        Similarity.pqEncodeNative(col("embedding"), books).as("native"),
        Similarity.pqCodes(col("embedding"), books, dsub).as("decl"))
      .collect()
    assert(enc.nonEmpty)
    enc.foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2),
      s"vec ${r.getLong(0)}: native PQ codes != declarative"))
    // ADC: bit-for-bit double equality of the fold
    val codes = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("neighbor_id"),
        Similarity.pqEncodeNative(col("embedding"), books).as("codes"))
    val qTabs = Similarity.pqQueryTables(spark, sf, books, dsub)
    val scored = codes.crossJoin(broadcast(qTabs))
      .select(
        NF.pqAdc(col("codes"), col("qtab")).as("native"),
        aggregate(zip_with(col("codes"), col("qtab"),
            (c, t) => element_at(t, c + 1)),
          lit(0.0), (a, v) => a + v).as("decl"))
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"ADC divergence: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native winnowing fingerprints equal the declarative window chain per doc") {
    import graft.operators.Dedup
    val w = Dedup.WinnowW; val k = Dedup.WinnowK
    val native = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(NF.winnowFps(col("text"), w, k)).as("fp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val decl = Dedup.d11SelDeclarative(spark, sf, w, k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(native.nonEmpty && native.keySet == decl.keySet,
      s"doc coverage differs: ${native.keySet.size} vs ${decl.keySet.size}")
    native.foreach { case (id, fps) =>
      assert(fps == decl(id), s"doc $id: native winnow set != declarative")
    }
    // native must also be distinct per doc (no duplicate fp rows)
    val dupCheck = Tables.documents(spark, sf)
      .select(col("doc_id"), NF.winnowFps(col("text"), w, k).as("fps")).collect()
    dupCheck.foreach { r =>
      val s = r.getSeq[Long](1)
      assert(s.length == s.distinct.length, s"doc ${r.getLong(0)} emitted dup fps")
    }
    // and on non-ASCII text (codepoint alignment): synthetic multibyte doc
    import spark.implicits._
    val txt = ("é漢🎯 abc déf ghi " * 8) + "tail"
    val one = Seq((1L, txt)).toDF("doc_id", "text")
    val nat = one.select(NF.winnowFps(col("text"), 8, 4).as("fps"))
      .collect().head.getSeq[Long](0).toSet
    val posDecl = one
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        explode(sequence(lit(1), length(col("text")) - 8 + 1)).as("i"))
      .select(col("doc_id"), col("i"), col("len"),
        conv(substring(md5(col("text").substr(col("i"), lit(8))), 1, 15), 16, 10)
          .cast("long").as("hv"))
    val winD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 3)
    val declNA = posDecl.withColumn("fp", min(col("hv")).over(winD))
      .filter(col("i") <= col("len") - (8 + 4) + 2)
      .select(col("fp")).collect().map(_.getLong(0)).toSet
    assert(nat == declNA, "non-ASCII winnow divergence")
  }

  test("native per-position window hashes: positional parity with the declarative chain; winnow k=1 is its distinct") {
    import spark.implicits._
    val w = 8
    // multibyte text exercises codepoint alignment; an exactly-w doc has
    // one window; a shorter doc none
    val docs = Seq((1L, ("é漢🎯 abc déf ghi " * 8) + "tail"),
      (2L, "short"), (3L, "abcdefgh")).toDF("doc_id", "text")
    val nat = docs.select(col("doc_id"),
        posexplode(NF.windowHashes(col("text"), w)))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("hv"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val decl = docs
      .filter(length(col("text")) >= w)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - w + 1)).as("i"))
      .select(col("doc_id"), col("i"),
        conv(substring(md5(col("text").substr(col("i"), lit(w))), 1, 15), 16, 10)
          .cast("long").as("hv"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(nat == decl, "per-position window hashes != declarative chain")
    assert(!nat.keySet.exists(_._1 == 2L), "doc shorter than w must emit no windows")
    assert(nat.keySet.count(_._1 == 3L) == 1, "doc of exactly w chars has one window")
    // winnowFps at k=1 is exactly the distinct of the raw position pass
    // (shared core: fingerprints = windowHashes → deque minimum → dedup)
    val rawSets = Tables.documents(spark, sf)
      .select(col("doc_id"), NF.windowHashes(col("text"), w).as("hs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val fpSets = Tables.documents(spark, sf)
      .select(col("doc_id"), NF.winnowFps(col("text"), w, 1).as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(rawSets.nonEmpty && rawSets == fpSets,
      "winnowFps(w, 1) must equal distinct per-position hashes")
  }

  test("extensions expose graft_cosine / graft_shingles in SQL") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val c = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c
         FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id = 1""").collect()
    assert(c.length == 1 && math.abs(c.head.getDouble(0)) <= 1.0)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val s = spark.sql(
      """SELECT graft_shingles(split(trim(text), '\\s+')) AS sh
         FROM docs_v WHERE size(split(trim(text), '\\s+')) >= 3 LIMIT 5""").collect()
    assert(s.length == 5 && s.forall(_.getSeq[Long](0).nonEmpty))
    val m = spark.sql(
      """SELECT graft_minhash(graft_shingles(split(trim(text), '\\s+'))) AS sig,
            graft_simhash(split(trim(text), '\\s+')) AS sh,
            graft_fingerprint(split(trim(text), '\\s+')) AS fp
         FROM docs_v WHERE size(split(trim(text), '\\s+')) >= 3 LIMIT 3""").collect()
    assert(m.length == 3 && m.forall(_.getSeq[Long](0).length == 32))
  }

  test("native argmin-sqdist and sqdist equal the declarative HOF forms bit-for-bit") {
    import graft.streaming.StreamVecIndex
    // real quantizer centroids against the real corpus — every vector
    val (_, centDf) = graft.operators.Similarity.s03Index(spark, sf, 16)
    val cents = centDf.orderBy("list_id").collect()
      .map(_.getSeq[Float](1).toArray).toIndexedSeq
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        StreamVecIndex.listIdOf(col("embedding"), cents).as("native"),
        StreamVecIndex.listIdOfDeclarative(col("embedding"), cents).as("decl"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"vec ${r.getLong(0)}: native argmin ${r.getInt(1)} != declarative ${r.getInt(2)}"))
    // tie behavior: equidistant centroids must pick the LOWER id, and a
    // centroids COLUMN (the s12 codebook join shape) behaves the same
    import spark.implicits._
    val tie = Seq((Seq(0.0f, 0.0f), Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(1.0f, 0.0f))))
      .toDF("emb", "cents")
      .select(NF.argminSqDist(col("emb"), col("cents")).as("a"))
      .head().getInt(0)
    assert(tie == 0, s"tie must resolve to the first minimum, got $tie")
    // sqdist: bit-for-bit double equality vs the zip_with/aggregate fold
    val z = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), x => x.cast("double")).as("a"))
    val pair = z.limit(64).crossJoin(z.limit(8).select(col("a").as("b")))
      .select(NF.sqDist(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("decl"))
      .collect()
    assert(pair.nonEmpty)
    pair.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"sqdist divergence: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("native argmink-sqdist equals the declarative (dist, idx) sort on every vector") {
    // real quantizer centroids against the whole corpus, k = 2 (the
    // S19Probes default) and k = 5 (a deeper probe): the native k-pass
    // selection must equal array_sort over (dist, idx) structs —
    // lexicographic order gives ties-to-lower-index at every rank, the
    // same rule the native scan's strict < implements
    val (_, centDf) = graft.operators.Similarity.s03Index(spark, sf, 16)
    val centsRow = centDf
      .agg(transform(array_sort(collect_list(struct(col("list_id"), col("centroid")))),
        s => s.getField("centroid")).as("cents"))
    def declK(k: Int) = slice(
      transform(
        array_sort(transform(col("cents"), (c, i) =>
          struct(
            aggregate(zip_with(col("emb"), c,
              (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
              lit(0.0), (acc, v) => acc + v).as("d"),
            i.as("i")))),
        s => s.getField("i")), 1, k)
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("emb"))
      .crossJoin(broadcast(centsRow))
      .select(col("vec_id"),
        NF.argminKSqDist(col("emb"), col("cents"), 2).as("n2"),
        declK(2).as("d2"),
        NF.argminKSqDist(col("emb"), col("cents"), 5).as("n5"),
        declK(5).as("d5"),
        NF.argminSqDist(col("emb"), col("cents")).as("a1"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"vec ${r.getLong(0)}: native k=2 ${r.getSeq[Int](1)} != declarative ${r.getSeq[Int](2)}")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4),
        s"vec ${r.getLong(0)}: native k=5 ${r.getSeq[Int](3)} != declarative ${r.getSeq[Int](4)}")
      // the k-head IS the argmin: one selection rule, two expressions
      assert(r.getSeq[Int](1).head == r.getInt(5),
        s"vec ${r.getLong(0)}: argmink head ${r.getSeq[Int](1).head} != argmin ${r.getInt(5)}")
    }
    // ties resolve to the lower index at EVERY rank, and k >= n returns
    // the full ordering
    import spark.implicits._
    val tie = Seq((Seq(0.0f, 0.0f),
        Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(2.0f, 0.0f), Seq(1.0f, 0.0f))))
      .toDF("emb", "cents")
      .select(NF.argminKSqDist(col("emb"), col("cents"), 9).as("a"))
      .head().getSeq[Int](0)
    assert(tie == Seq(0, 1, 3, 2),
      s"ties must resolve lower-index-first with k clamped to n, got $tie")
  }

  test("gzip64 fast codec: byte-identical to the stream form, trailer-verified, exotic headers fall back") {
    import graft.functions.GzipCodecUtil
    import org.apache.spark.unsafe.types.UTF8String
    import java.util.Base64
    def u(s: String) = UTF8String.fromString(s)
    def streamEncode(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("UTF-8")); gz.close(); bos.toByteArray
    }
    val cases = Seq("", "a", "hello world", "x" * 100000,
      "repeat " * 5000, "unicode: é中文 😀",
      new String(Array.tabulate(257)(i => (i % 256).toChar)))
    for (s <- cases) {
      // encode parity: the thread-local Deflater path must produce the
      // SAME bytes GZIPOutputStream wrote (header constants + deflate
      // params pinned) — not merely a decodable stream
      val fast = Base64.getDecoder.decode(GzipCodecUtil.encode(u(s)).toString)
      assert(java.util.Arrays.equals(fast, streamEncode(s)), s"encode drift on ${s.take(20)}")
      // decode inverts both producers
      val b64 = UTF8String.fromString(Base64.getEncoder.encodeToString(streamEncode(s)))
      assert(GzipCodecUtil.decode(b64).toString == s)
      assert(GzipCodecUtil.decode(GzipCodecUtil.encode(u(s))).toString == s)
    }
    // FLG != 0 (FNAME set): the fast header check must route to the
    // stream path, which decodes it fine
    val withName = {
      val body = streamEncode("named member")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 8, 0, 0, 0, 0, 0, 0))
      out.write("f.txt".getBytes); out.write(0)
      out.write(body, 10, body.length - 10)
      UTF8String.fromString(Base64.getEncoder.encodeToString(out.toByteArray))
    }
    assert(GzipCodecUtil.decode(withName).toString == "named member")
    // concatenated members: fast path sees trailing input and falls back
    // (GZIPInputStream reads all members)
    val multi = {
      val a = streamEncode("first|"); val b = streamEncode("second")
      UTF8String.fromString(Base64.getEncoder.encodeToString(a ++ b))
    }
    assert(GzipCodecUtil.decode(multi).toString == "first|second")
    // corrupt trailer CRC → null (the trailer IS verified, not skipped)
    val corrupt = {
      val raw = streamEncode("crc matters")
      raw(raw.length - 6) = (raw(raw.length - 6) ^ 0x7f).toByte
      UTF8String.fromString(Base64.getEncoder.encodeToString(raw))
    }
    assert(GzipCodecUtil.decode(corrupt) == null)
    // truncated body → null, not an exception
    val trunc = {
      val raw = streamEncode("truncate me please, a reasonably long payload")
      UTF8String.fromString(Base64.getEncoder.encodeToString(
        java.util.Arrays.copyOf(raw, raw.length - 12)))
    }
    assert(GzipCodecUtil.decode(trunc) == null)
    assert(GzipCodecUtil.decode(u("not base64!!")) == null)
  }
}
