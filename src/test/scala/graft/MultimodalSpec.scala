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

  test("decodeHeader parses real PNG/JPEG/WAV headers; the corpus carries no container magic") {
    import org.apache.spark.sql.functions.col
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Int) = b(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    def be16(v: Int) = b(v >>> 8, v & 0xff)
    def le32(v: Int) = b(v & 0xff, (v >>> 8) & 0xff, (v >>> 16) & 0xff, v >>> 24)
    def le16(v: Int) = b(v & 0xff, (v >>> 8) & 0xff)
    // minimal valid PNG: signature + IHDR (640x480, 8-bit RGB) + CRC pad
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(640) ++ be32(480) ++
      b(8, 2, 0, 0, 0) ++ be32(0)
    // minimal JPEG: SOI, APP0 (skipped by the walk), SOF0 (480x640), EOI
    val app0 = b(0xff, 0xe0) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ b(0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ b(0, 0)
    val sof0 = b(0xff, 0xc0) ++ be16(17) ++ b(8) ++ be16(480) ++ be16(640) ++
      b(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val jpeg = b(0xff, 0xd8) ++ app0 ++ sof0 ++ b(0xff, 0xd9)
    // minimal WAV: RIFF/WAVE, fmt (stereo 44.1 kHz, block align 4), 400-byte data
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val data = "data".getBytes("US-ASCII") ++ le32(400) ++ Array.fill(400)(0.toByte)
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + fmt.length + data.length) ++
      "WAVE".getBytes("US-ASCII") ++ fmt ++ data
    // truncated magic (PNG signature, no IHDR) must fall back, not crash
    val truncated = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // T.81 fill bytes: any number of 0xFF may precede a marker — a
    // fill before SOF0 must not desync the walk into fakeDecode
    val jpegFill = b(0xff, 0xd8, 0xff) ++ sof0 ++ b(0xff, 0xd9)
    // adversarial RIFF: a chunk length of 0xFFFFFFF8 once made the walk
    // stride 8+(-8)=0 via Int truncation — an infinite executor loop;
    // must terminate and fall back (no fmt/data parsed)
    val evilWav = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      b(0xf8, 0xff, 0xff, 0xff) ++ Array.fill(64)(0.toByte)
    // adversarial fmt: sample rate u32 = 0xFFFFFFFF would wrap NEGATIVE
    // in MediaMeta's Int width — must clamp-validate and fall back
    // (r12 advice), not emit garbage metadata into m02's offsets
    val hugeRateFmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++
      le16(2) ++ le32(-1) ++ le32(0) ++ le16(4) ++ le16(16)
    val hugeRateWav = "RIFF".getBytes("US-ASCII") ++
      le32(4 + hugeRateFmt.length + data.length) ++
      "WAVE".getBytes("US-ASCII") ++ hugeRateFmt ++ data
    val sess = spark
    import sess.implicits._
    val rows = Multimodal.decodePipelineOf(spark,
        Seq((1L, png), (2L, jpeg), (3L, wav), (4L, truncated),
          (5L, jpegFill), (6L, evilWav), (7L, hugeRateWav))
          .toDF("doc_id", "payload"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows(1L) == Multimodal.MediaMeta(1L, png.length.toLong, 640, 480, 1, "png"))
    assert(rows(2L) == Multimodal.MediaMeta(2L, jpeg.length.toLong, 640, 480, 1, "jpeg"))
    assert(rows(3L) == Multimodal.MediaMeta(3L, wav.length.toLong, 44100, 2, 100, "wav"))
    assert(rows(4L) == Multimodal.fakeDecode(4L, truncated),
      "truncated magic must take the documented fallback")
    assert(rows(5L) == Multimodal.MediaMeta(5L, jpegFill.length.toLong, 640, 480, 1, "jpeg"),
      "a fill byte before SOF must not desync the marker walk")
    assert(rows(6L) == Multimodal.fakeDecode(6L, evilWav),
      "an overflowing chunk length must terminate and fall back")
    assert(rows(7L) == Multimodal.fakeDecode(7L, hugeRateWav),
      "a u32 sample rate above Int.MaxValue must fall back, not wrap negative")
    // the gate's precondition: no ASCII document starts with container
    // magic, so m02's oracle (the fallback arithmetic) stays exact
    val magic = Tables.documents(spark, sf).filter(
      col("text").startsWith("PNG") ||
        col("text").startsWith("RIFF") ||
        org.apache.spark.sql.functions.ascii(col("text")) === 255).count()
    assert(magic == 0L, "corpus unexpectedly carries container magic")
  }

  test("m04 phash: planted variants detected, hashes match recompute, banding is complete") {
    val pairs = Multimodal.m04PhashNeardup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j")) -> r.getAs[Long]("hamming"))
      .toMap
    // driver recompute of the 63-bit dHash over the same planted corpus
    val corpus = Multimodal.m04Corpus(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def fp(text: String): Long = {
      val n = text.length
      def c(j: Int): Int = text.charAt(1 + (j * (n - 1)) / 64 - 1).toInt
      (0 until 63).map(i => if (c(i + 1) > c(i)) 1L << i else 0L).sum
    }
    val fps = corpus.map { case (id, t) => id -> fp(t) }.toMap
    // variant ids are -1 - doc_id: sign-disjoint from genuine ids, which
    // the generated tables keep nonnegative (collision-proof at any
    // corpus size, unlike a fixed constant offset)
    assert(Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 0).count() == 0,
      "fixture assumption: genuine doc_ids are nonnegative")
    assert(corpus.map(_._1).distinct.length == corpus.length,
      "planted variant id collided with a genuine doc_id")
    // every planted (base, variant) pair must be reported: a same-length
    // single-char edit flips <= 4 bits (<= 2 affected sample indices x 2
    // adjacent difference bits), inside the hamming <= 6 guarantee;
    // pair order is (doc_i < doc_j) so the negative variant id leads
    val planted = corpus.collect {
      case (id, _) if id >= 0 && id % 17 == 0 && fps.contains(-1L - id) => id
    }
    assert(planted.nonEmpty, "fixture must plant at least one variant")
    planted.foreach { id =>
      assert(pairs.contains((-1L - id, id)),
        s"planted near-dup pair (${-1L - id}, $id) missed")
    }
    // reported hammings reconstruct exactly
    pairs.foreach { case ((i, j), h) =>
      assert(java.lang.Long.bitCount(fps(i) ^ fps(j)).toLong == h,
        s"hamming mismatch for ($i, $j)")
    }
    // completeness: the 7x9 banding is EXACT for hamming <= 6 — a brute
    // driver sweep must find nothing the operator missed
    val ids = corpus.map(_._1)
    for (a <- ids.indices; b <- (a + 1) until ids.length) {
      val (i, j) = (math.min(ids(a), ids(b)), math.max(ids(a), ids(b)))
      val h = java.lang.Long.bitCount(fps(ids(a)) ^ fps(ids(b)))
      if (h <= Multimodal.PhashMaxHamming)
        assert(pairs.contains((i, j)), s"brute pair ($i, $j) at hamming $h missed")
    }
  }

  // ───────── PNG pixel decode (round 12) ─────────

  /** Hand-assembled PNG encoder for the decode specs: same pixel plane,
    * selectable per-row filter type and zlib level — the two degrees of
    * freedom a real re-encode exercises. */
  // delegated to main (r13): the encoder moved into operators/PixelCodecs
  // so the driver-gated px corpus and these fixtures share ONE writer
  private def makePng(w: Int, h: Int, colorType: Int, level: Int,
      filterType: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    graft.operators.PixelCodecs.makePng(w, h, colorType, level, filterType, px)

  private def gradient(x: Int, y: Int): (Int, Int, Int) =
    ((x * 7 + y * 3) % 256, (y * 11 + x) % 256, ((x + y) * 13) % 256)

  test("PNG pixel decode: all five filters reconstruct the same plane; re-encode is hash-invariant") {
    import java.util.zip.Deflater
    val w = 40; val h = 30
    val planes = (0 to 4).map { ft =>
      val png = makePng(w, h, 2, Deflater.DEFAULT_COMPRESSION, ft, gradient)
      val got = Multimodal.decodePngLuminance(png)
      assert(got.isDefined, s"filter $ft failed to decode")
      got.get
    }
    planes.foreach { case (gw, gh, lum) =>
      assert(gw == w && gh == h && lum.length == w * h)
      assert(lum.toSeq == planes.head._3.toSeq,
        "filter reconstruction diverged between filter types")
    }
    // luminance formula check on one known pixel
    val (r, g, b) = gradient(5, 7)
    assert(planes.head._3(7 * w + 5) == ((77 * r + 150 * g + 29 * b) >> 8))
    // grayscale and RGBA color types decode to consistent planes
    val gray = Multimodal.decodePngLuminance(
      makePng(w, h, 0, Deflater.BEST_COMPRESSION, 1, gradient)).get
    assert(gray._3.toSeq == (0 until w * h).map { i =>
      gradient(i % w, i / w)._1
    }, "grayscale plane must pass luminance through")
    val rgba = Multimodal.decodePngLuminance(
      makePng(w, h, 6, Deflater.BEST_SPEED, 4, gradient)).get
    assert(rgba._3.toSeq == planes.head._3.toSeq,
      "RGBA must decode to the RGB luminance (alpha ignored)")
    // THE RE-ENCODE INVARIANT (the r11 verdict's gap): same pixels at a
    // different zlib level + filter choice — compressed bytes differ,
    // the byte-stream dHash differs, the pixel dHash is IDENTICAL
    val encA = makePng(w, h, 2, Deflater.NO_COMPRESSION, 0, gradient)
    val encB = makePng(w, h, 2, Deflater.BEST_COMPRESSION, 4, gradient)
    assert(!java.util.Arrays.equals(encA, encB))
    def byteFp(p: Array[Byte]): Long = graft.functions.PhashUtil.dhash63(
      org.apache.spark.unsafe.types.UTF8String.fromBytes(p))
    assert(byteFp(encA) != byteFp(encB),
      "fixture must demonstrate the byte hash being defeated by a re-encode")
    def pixFp(p: Array[Byte]): Long = {
      val (pw, ph, lum) = Multimodal.decodePngLuminance(p).get
      Multimodal.pixelDhash63(pw, ph, lum)
    }
    assert(pixFp(encA) == pixFp(encB),
      "pixel dHash must be invariant under re-encode")
    // adversarial: truncated IDAT, forged giant dims, palette type —
    // all refuse (None) instead of throwing or allocating. dropRight(30)
    // cuts into the IDAT payload (IEND+CRC are only 16 trailing bytes),
    // so the chunk walk sees a length past EOF
    assert(Multimodal.decodePngLuminance(encA.dropRight(30)).isEmpty)
    assert(Multimodal.decodePngLuminance(encA.take(40)).isEmpty)
    val giant = encA.clone()
    giant(16) = 0x7f.toByte // width high byte: w ~ 2^30 -> PngMaxPixels refusal
    assert(Multimodal.decodePngLuminance(giant).isEmpty)
    val palette = makePng(w, h, 2, Deflater.DEFAULT_COMPRESSION, 0, gradient).clone()
    palette(25) = 3.toByte // colorType -> palette: header-only look refuses
    assert(Multimodal.decodePngLuminance(palette).isEmpty)
    // r12 review regressions:
    // (a) FDICT zlib stream: Inflater reports zero progress with
    // needsDictionary — pre-fix the inflate loop spun forever
    def be32b(v: Long): Array[Byte] = Array((v >>> 24).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk2(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32b(data.length.toLong) ++ typ.getBytes("US-ASCII") ++ data ++ be32b(crc.getValue)
    }
    // CMF 0x78, FLG 0x20: FDICT set, (0x7820 % 31) == 0 — a VALID
    // preset-dictionary zlib header followed by a dict id
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4) ++ Array.fill(16)(0.toByte)
    val fdictPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk2("IHDR", be32b(4) ++ be32b(4) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk2("IDAT", fdictIdat) ++ chunk2("IEND", Array[Byte]())
    assert(Multimodal.decodePngLuminance(fdictPng).isEmpty,
      "a preset-dictionary stream must refuse, not spin")
    // (b) forged u32 dims whose PRODUCT wraps Long negative must refuse
    // before any allocation (pre-fix: negative row arithmetic, then an
    // out-of-bounds index in the pixel hash)
    val wrapPng = encA.clone()
    for (i <- 16 until 24) wrapPng(i) = 0xff.toByte // w = h = 0xFFFFFFFF
    assert(Multimodal.decodePngLuminance(wrapPng).isEmpty)
  }

  test("m04 decode-aware: re-encoded PNG pair caught; ASCII corpus result-identical to the gate") {
    import java.util.zip.Deflater
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits._
    val encA = makePng(64, 48, 2, Deflater.NO_COMPRESSION, 0, gradient)
    val encB = makePng(64, 48, 2, Deflater.BEST_COMPRESSION, 4, gradient)
    val filler = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, encA), (2L, encB),
      (3L, filler.getBytes("US-ASCII")),
      (4L, (filler + " tail").getBytes("US-ASCII")),
      (5L, null.asInstanceOf[Array[Byte]])) // r12 review: NULL payload must not NPE
      .toDF("doc_id", "payload")
    val pairs = Multimodal.m04PhashNeardupDecodedOf(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(pairs.get((1L, 2L)).contains(0L),
      s"re-encoded PNG pair must verify at hamming 0: $pairs")
    // the byte-path gate provably MISSES the same pair (the gap the
    // decoder closes — not just a redundant second detector)
    val bytePairs = Multimodal.m04BandVerify(
        docs.select(col("doc_id"), graft.functions.NativeFunctions.phash63(
          col("payload").cast("string")).as("fp")))
      .collect().map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"))).toSet
    assert(!bytePairs.contains((1L, 2L)),
      "fixture must demonstrate the byte path missing the re-encode")
    // on the container-magic-free sf corpus the decode-aware variant is
    // result-identical to the gated entry (every payload falls back)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"),
        r.getAs[Long]("hamming"))).toSeq
    assert(rows(Multimodal.m04PhashNeardupDecoded(spark, sf))
      == rows(Multimodal.m04PhashNeardup(spark, sf)),
      "decode-aware variant diverged from the gate on a magic-free corpus")
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

  test("m05 frame reuse matches a full driver recompute and finds every planted clip") {
    import graft.operators.Multimodal
    val fb = Multimodal.FrameBytes
    val got = Multimodal.m05FrameReuse(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"),
        r.getAs[Long]("frames_i"), r.getAs[Long]("frames_j"),
        r.getAs[Long]("n_shared"))).toSet
    // independent recompute: same corpus rule, java MD5 over the chunks
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (id, t) => t.length >= 4 * fb && id >= 0 }
    val corpus = docs ++ docs.filter(_._1 % 13 == 0).map { case (id, t) =>
      (-1L - id) -> (t.substring(0, t.length / 2) + "~" * 16)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val frames = corpus.map { case (id, t) =>
      val n = t.length / fb
      (id, n.toLong, (0 until n).map(i => md5hex(t.substring(i * fb, (i + 1) * fb))).toSet)
    }
    val want = (for {
      (i, ni, hi) <- frames; (j, nj, hj) <- frames if i < j
      shared = (hi & hj).size if shared >= Multimodal.FrameMinShared
    } yield (i, j, ni, nj, shared.toLong)).toSet
    assert(got == want, s"pair-set mismatch:\nextra=${got -- want}\nmissing=${want -- got}")
    // every planted clip whose preserved half holds >= 2 full frames is found
    docs.filter { case (id, t) => id % 13 == 0 && (t.length / 2) / fb >= 2 }
      .foreach { case (id, t) =>
        assert(got.exists(p => p._1 == -1L - id && p._2 == id),
          s"planted clip of doc $id not detected")
      }
  }

  test("m05 hot-frame cap removes a planted boilerplate frame's quadratic pairs, changes nothing else") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal}
    val fb = Multimodal.FrameBytes
    // synthetic corpus: 40 unique assets, each padded to a frame boundary
    // and then given the SAME boilerplate frame (every container's
    // zero-block) — plus 5 genuine partial copies
    def body(i: Int) = (s"asset$i " * 40).take(3 * fb)
    // TWO distinct hot frames so boilerplate alone crosses the 2-shared
    // floor — the quadratic case the cap exists for
    val boiler = "Z" * fb + "Y" * fb
    val base = (0 until 40).map(i => (i.toLong, body(i) + boiler))
    val clips = (0 until 5).map(i => (100L + i, body(i).take(2 * fb) + boiler))
    val corpus = (base ++ clips).toDF("doc_id", "text")
    val uncapped = Multimodal.m05FramePairs(corpus, Dedup.NoDfCap).collect()
    val capped = Multimodal.m05FramePairs(corpus, maxDf = 10L).collect()
    def pairs(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n_shared"))).toSet
    // uncapped: the boilerplate frame links EVERY asset pair (45·44/2 +
    // clip pairs) — the quadratic term; capped: only the genuine clips
    // survive, linked by their 2 true shared frames
    assert(uncapped.length >= 45 * 44 / 2,
      s"hot frame must link all pairs uncapped: ${uncapped.length}")
    val want = (0 until 5).map(i => (i.toLong, 100L + i, 2L)).toSet
    assert(pairs(capped) == want,
      s"capped pairs must be exactly the genuine clips:\n${pairs(capped)}\n$want")
    // and on the hot-frame-free planted corpus the cap is a no-op
    val plain = Multimodal.m05FrameReuse(spark, sf).collect().map(_.toString).toSeq
    val plainCapped = Multimodal.m05FrameReuse(spark, sf, maxDf = 50L)
      .collect().map(_.toString).toSeq
    assert(plain == plainCapped, "cap must be a no-op without a hot frame")
  }

  test("m04 hot-fingerprint cap removes a planted constant-payload pile's quadratic pairs, changes nothing else") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Multimodal}
    // synthetic fp relation (the banding half is codec-independent):
    // 200 payloads of ONE hot fingerprint (a blank-image pile) next to
    // a genuine near-pair (hamming 1) and isolated organic fps
    val hot = (0 until 200).map(i => (1000L + i, 0x123456789abL))
    val near = Seq((1L, 0x0f0f0f0fL), (2L, 0x0f0f0f0eL))
    val organic = (0 until 30).map(i => (100L + i, 0x4000000000000L + i * 0x10204081L))
    val fps = (hot ++ near ++ organic).toDF("doc_id", "fp")
    val uncapped = Multimodal.m04BandVerify(fps, Dedup.NoDfCap).collect()
    val capped = Multimodal.m04BandVerify(fps, Multimodal.M04MaxFpDf).collect()
    def pairSet(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: the pile alone contributes 200·199/2 hamming-0 pairs
    assert(uncapped.length >= 200 * 199 / 2,
      s"hot fp must pair quadratically uncapped: ${uncapped.length}")
    // capped: the pile is gone at the source; the genuine near-pair
    // survives untouched
    assert(pairSet(capped).contains((1L, 2L)), "genuine near-pair must survive the cap")
    assert(!pairSet(capped).exists { case (i, j) => i >= 1000 || j >= 1000 },
      s"pile pairs must be removed: ${pairSet(capped).filter(_._1 >= 1000).take(3)}")
    // default entry ≡ uncapped on the organic gate corpus (no hot fp
    // there — the cap is calibrated far above organic multiplicity)
    val gated = Multimodal.m04PhashNeardup(spark, sf).collect().map(_.toString).toSeq
    val gateFp = Multimodal.m04Corpus(spark, sf)
      .select(col("doc_id"),
        graft.functions.NativeFunctions.phash63(col("text")).as("fp"))
    val uncappedGate = Multimodal.m04BandVerify(gateFp, Dedup.NoDfCap)
      .collect().map(_.toString).toSeq
    assert(gated == uncappedGate, "cap must be a no-op on the organic corpus")
  }

  // ---- JPEG decode fixtures (r12): the JDK's own ImageIO JPEG codec
  // is the INDEPENDENT encoder + reference decoder — test-only, the
  // production decoder stays zero-dep ----
  private def jpegTestImage(w: Int, h: Int, gray: Boolean): java.awt.image.BufferedImage = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, t)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // lattice-aligned high-contrast bands (dHash samples 9 columns:
        // alternating ~160-luma steps dwarf any IDCT/quantization noise)
        // plus a mild gradient so rows are not constant
        val band = if ((x * 9 / w) % 2 == 0) 40 else 200
        val v = math.min(255, band + y / 8)
        // gray: write the raster sample directly — setRGB on
        // TYPE_BYTE_GRAY routes through an sRGB->linear colorspace
        // transform that would distort the planted values
        if (gray) img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] =
    graft.operators.PixelCodecs.encodeJpeg(img, quality, progressive)

  private def imageIoLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth; val h = img.getHeight
    val gray = img.getColorModel.getNumComponents == 1
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        lum(y * w + x) =
          if (gray) img.getRaster.getSample(x, y, 0) // raw Y, no CS transform
          else {
            val rgb = img.getRGB(x, y)
            (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff)
              + 29 * (rgb & 0xff)) >> 8
          }
        x += 1
      }
      y += 1
    }
    (w, h, lum)
  }

  test("JPEG pixel decode matches the JDK's independent decoder within IDCT tolerance") {
    for (gray <- Seq(false, true); q <- Seq(0.92f, 0.5f)) {
      val bytes = encodeJpeg(jpegTestImage(64, 48, gray), q)
      val got = Multimodal.decodeJpegLuminance(bytes)
      assert(got.isDefined, s"gray=$gray q=$q must decode (baseline JDK output)")
      val (w, h, lum) = got.get
      assert(w == 64 && h == 48)
      val (rw, rh, ref) = imageIoLuma(bytes)
      assert(rw == w && rh == h)
      // both decoders reconstruct the same DCT coefficients; residual
      // differences are IDCT rounding + (color path) the YCbCr<->RGB
      // round-trip through ImageIO's integer conversion
      val diffs = lum.indices.map(i => math.abs(lum(i) - ref(i)))
      val mean = diffs.sum.toDouble / diffs.length
      assert(mean <= 2.5, s"gray=$gray q=$q mean |diff| $mean")
      assert(diffs.max <= 12, s"gray=$gray q=$q max |diff| ${diffs.max}")
    }
  }

  test("m04 decode-aware: JPEG re-encode pair caught at hamming 0; byte path misses it") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val img = jpegTestImage(64, 48, gray = false)
    val encA = encodeJpeg(img, 0.92f)
    val encB = encodeJpeg(img, 0.5f)
    assert(!java.util.Arrays.equals(encA, encB))
    // the two encodings genuinely differ in entropy bytes AND decode to
    // the same perceptual hash
    def hash(bytes: Array[Byte]): Long = {
      val (w, h, lum) = Multimodal.decodeJpegLuminance(bytes).get
      Multimodal.pixelDhash63(w, h, lum)
    }
    assert(hash(encA) == hash(encB),
      "pixel dHash must be invariant under JPEG re-encode")
    val filler = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, encA), (2L, encB), (3L, filler.getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.m04PhashNeardupDecodedOf(spark, docs).collect()
      .map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j")) -> r.getAs[Long]("hamming"))
      .toMap
    assert(pairs.get((1L, 2L)).contains(0L),
      s"re-encoded JPEG pair must verify at hamming 0: $pairs")
    val bytePairs = Multimodal.m04BandVerify(
        docs.select(col("doc_id"), graft.functions.NativeFunctions.phash63(
          col("payload").cast("string")).as("fp")))
      .collect().map(r => (r.getAs[Long]("doc_i"), r.getAs[Long]("doc_j"))).toSet
    assert(!bytePairs.contains((1L, 2L)),
      "fixture must demonstrate the byte path missing the JPEG re-encode")
  }

  test("JPEG restart markers: hand-assembled DRI stream decodes; missing RST refuses") {
    // minimal baseline gray 16x8 = two 8x8 MCUs, restart interval 1:
    // trivial Huffman tables (one 1-bit code each: DC category 0, AC
    // EOB), so each block is the 2 bits "00" padded to byte 0x3F, and
    // the two entropy segments are separated by RST0. All-zero
    // coefficients decode to a flat plane of 128 after level shift.
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val dqt = seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(1))
    val sof = seg(0xc0, Array[Byte](8, 0, 8, 0, 16, 1, 1, 0x11, 0))
    def dht(tc: Int): Array[Byte] =
      seg(0xc4, Array[Byte]((tc << 4).toByte, 1) ++ Array.fill[Byte](15)(0)
        ++ Array[Byte](0))
    val dri = seg(0xdd, Array[Byte](0, 1))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val head = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++
      dht(0) ++ dht(1) ++ dri ++ sos
    val withRst = head ++ Array(0x3f.toByte, 0xff.toByte, 0xd0.toByte,
      0x3f.toByte, 0xff.toByte, 0xd9.toByte)
    val got = Multimodal.decodeJpegLuminance(withRst)
    assert(got.isDefined, "DRI stream must decode")
    val (w, h, lum) = got.get
    assert(w == 16 && h == 8 && lum.forall(_ == 128),
      s"flat-gray DRI decode: w=$w h=$h distinct=${lum.distinct.toSeq}")
    // same stream with the RST marker dropped: the decoder must refuse
    // (fall back), never mis-align silently
    val noRst = head ++ Array(0x3f.toByte, 0x3f.toByte, 0xff.toByte, 0xd9.toByte)
    assert(Multimodal.decodeJpegLuminance(noRst).isEmpty,
      "a missing restart marker must refuse, not desync")
  }

  test("JPEG single-component scan is non-interleaved: declared 2x2 factors ignored") {
    // T.81 A.2.2 (r12 review): a gray JPEG that KEEPS 2x2 luma sampling
    // factors (jpegtran -grayscale output) still stores its blocks in
    // plain raster order. 24x8 = three DC-only blocks with distinct
    // DCs; tiling them as 16x16 MCUs would expect 8 blocks and refuse.
    // Tables: DC = {cat 0 -> '0' (1 bit), cat 5 -> '10' (2 bits)},
    // AC = {EOB -> '0'}; each block = '10' + 24 (5 bits) + EOB = 0xB0.
    // DC-only IDCT gives round(dc/8) + 128: tiles 131, 134, 137.
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val dqt = seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(1))
    val sof = seg(0xc0, Array[Byte](8, 0, 8, 0, 24, 1, 1, 0x22, 0))
    val dcHt = seg(0xc4, Array[Byte](0x00, 1, 1) ++ Array.fill[Byte](14)(0)
      ++ Array[Byte](0, 5))
    val acHt = seg(0xc4, Array[Byte](0x10, 1) ++ Array.fill[Byte](15)(0)
      ++ Array[Byte](0))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val jpeg = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dcHt ++ acHt ++
      sos ++ Array(0xb0.toByte, 0xb0.toByte, 0xb0.toByte,
        0xff.toByte, 0xd9.toByte)
    val got = Multimodal.decodeJpegLuminance(jpeg)
    assert(got.isDefined, "raster-order 1-component stream must decode")
    val (w, h, lum) = got.get
    assert(w == 24 && h == 8)
    assert(lum(0) == 131 && lum(8) == 134 && lum(16) == 137,
      s"tiles must land in raster order: ${lum(0)}, ${lum(8)}, ${lum(16)}")
    assert(lum(7 * 24 + 23) == 137)
  }

  test("JPEG adversarial guards: runaway DC predictor and partial-spectral scans refuse") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val dqt = seg(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(1))
    val sof = seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    // DC table holding only category 11 ('0'): every block pushes the
    // predictor by up to +-2047; two blocks exceed the legal DC range
    val dcHt = seg(0xc4, Array[Byte](0x00) ++ Array.fill[Byte](10)(0)
      ++ Array[Byte](1) ++ Array.fill[Byte](5)(0) ++ Array[Byte](11))
    val acHt = seg(0xc4, Array[Byte](0x10, 1) ++ Array.fill[Byte](15)(0)
      ++ Array[Byte](0))
    // 8x16: two blocks, each DC cat 11 with all-ones magnitude (+2047):
    // first lands at 2047 (legal), second at 4094 -> must refuse
    val sof2 = seg(0xc0, Array[Byte](8, 0, 16, 0, 8, 1, 1, 0x11, 0))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    // block bits: cat-11 code (the single length-11 canonical code =
    // 11 ZERO bits) + 11 magnitude bits + 1-bit AC EOB = 23 bits;
    // two blocks = 46 bits, padded with 1s to 6 bytes; assemble bitwise
    var acc = 0L; var n = 0
    def push(bits: Int, len: Int): Unit = { acc = (acc << len) | bits; n += len }
    // DC cat-11 code = the single length-11 canonical code (11 zero
    // bits), then 11 magnitude bits, then the 1-bit AC EOB
    push(0, 11); push(0x7ff, 11); push(0, 1) // block 1: +2047
    push(0, 11); push(0x7ff, 11); push(0, 1) // block 2: +2047 again
    while (n % 8 != 0) { push(1, 1) }
    val data = (1 to n / 8).map(i => ((acc >> (n - 8 * i)) & 0xff).toByte).toArray
    val overflow = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof2 ++ dcHt ++
      acHt ++ sos ++ data ++ Array(0xff.toByte, 0xd9.toByte)
    assert(Multimodal.decodeJpegLuminance(overflow).isEmpty,
      "a DC predictor outside [-2048, 2047] must refuse, not wrap")
    // positive control: ONE +2047 block (the legal extreme) decodes —
    // so the refusal above is the clamp firing on block 2, not an
    // artifact of the hand-assembled stream
    var acc1 = 0L; var n1 = 0
    def push1(bits: Int, len: Int): Unit = { acc1 = (acc1 << len) | bits; n1 += len }
    push1(0, 11); push1(0x7ff, 11); push1(0, 1)
    while (n1 % 8 != 0) { push1(1, 1) }
    val data1 = (1 to n1 / 8).map(i => ((acc1 >> (n1 - 8 * i)) & 0xff).toByte).toArray
    val legal = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dcHt ++
      acHt ++ sos ++ data1 ++ Array(0xff.toByte, 0xd9.toByte)
    val lg = Multimodal.decodeJpegLuminance(legal)
    assert(lg.isDefined && lg.get._3.forall(_ == 255),
      "the legal DC extreme must decode to a saturated plane")
    // partial-spectral scan header (Ss=1) under an SOF0 frame: refuse
    val sosBad = seg(0xda, Array[Byte](1, 1, 0x00, 1, 63, 0))
    val partial = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dcHt ++
      acHt ++ sosBad ++ Array(0x00.toByte, 0xff.toByte, 0xd9.toByte)
    assert(Multimodal.decodeJpegLuminance(partial).isEmpty,
      "Ss/Se/AhAl outside 0/63/0 is not baseline and must refuse")
    // and null at the dispatch entry is None, never an NPE
    assert(Multimodal.decodeLuminance(null).isEmpty)
  }

  test("JPEG decode falls back (None) on progressive, truncated, and corrupt streams") {
    val img = jpegTestImage(64, 48, gray = false)
    val prog = encodeJpeg(img, 0.8f, progressive = true)
    assert(Multimodal.decodeJpegLuminance(prog).isEmpty,
      "progressive (SOF2) is outside baseline scope and must fall back")
    val base = encodeJpeg(img, 0.8f)
    assert(Multimodal.decodeJpegLuminance(base.take(base.length / 2)).isEmpty,
      "truncated entropy data must fall back, not return a partial plane")
    assert(Multimodal.decodeJpegLuminance(base.take(60)).isEmpty)
    val junk = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.tabulate[Byte](500)(i => ((i * 131) % 251).toByte)
    assert(Multimodal.decodeJpegLuminance(junk).isEmpty,
      "FFD8-prefixed garbage must fall back")
    // a forged SOF0 claiming giant dimensions refuses before allocation
    val giant = base.clone()
    // find SOF0 and overwrite height/width with 0xFFFF
    var i = 2
    var done = false
    while (!done && i + 4 < giant.length) {
      if ((giant(i) & 0xff) == 0xff && (giant(i + 1) & 0xff) == 0xc0) {
        giant(i + 5) = 0xff.toByte; giant(i + 6) = 0xff.toByte
        giant(i + 7) = 0xff.toByte; giant(i + 8) = 0xff.toByte
        done = true
      } else i += 1
    }
    assert(done && Multimodal.decodeJpegLuminance(giant).isEmpty)
  }

  test("m04px planes: decode-side fingerprint equals the plane's at every codec/quality, across random ids") {
    // the gate's entire determinism claim reduced to its invariant:
    // for ANY doc id, the dHash of the DECODED image — PNG at any
    // filter/level, JPEG at q92 and q50 — equals the dHash computed
    // directly from the planted plane (lossless for PNG; inside the
    // 24-luma-gap-vs-~1-luma-DC-error margin for JPEG)
    val rnd = new scala.util.Random(41)
    val ids = Seq(0L, 1L, 28L, 29L, 31L, Int.MaxValue.toLong) ++
      Seq.fill(40)(math.abs(rnd.nextLong()) % (1L << 31))
    ids.foreach { id =>
      val lum = Multimodal.pxPlane(id)
      val want = Multimodal.pixelDhash63(Multimodal.PxW, Multimodal.PxH, lum)
      def gray(x: Int, y: Int) = {
        val v = lum(y * Multimodal.PxW + x); (v, v, v)
      }
      for (ft <- 0 to 4; (ct, lvl) <- Seq(
          (2, java.util.zip.Deflater.NO_COMPRESSION),
          (0, java.util.zip.Deflater.BEST_COMPRESSION))) {
        val png = graft.operators.PixelCodecs.makePng(
          Multimodal.PxW, Multimodal.PxH, ct, lvl, ft, gray)
        val got = Multimodal.decodeLuminance(png)
        assert(got.exists(d => Multimodal.pixelDhash63(d._1, d._2, d._3) == want),
          s"PNG fp drifted for id=$id filter=$ft colorType=$ct")
      }
      for (q <- Seq(0.92f, 0.5f)) {
        val jpg = graft.operators.PixelCodecs.encodeJpeg(
          graft.operators.PixelCodecs.grayImage(
            Multimodal.PxW, Multimodal.PxH, lum), q)
        val got = Multimodal.decodeLuminance(jpg)
        assert(got.exists(d => Multimodal.pixelDhash63(d._1, d._2, d._3) == want),
          s"JPEG q=$q fp drifted for id=$id")
      }
    }
  }

  test("m04px gate: every planted encode takes the pixel path; pairs are exactly the construction") {
    import org.apache.spark.sql.functions.col
    val corpus = Multimodal.m04PxCorpus(spark, sf).collect()
    assert(corpus.nonEmpty)
    // every payload must DECODE — a refusal would silently fall back to
    // the byte hash, and the driver gate would stop gating the decoders
    corpus.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(Multimodal.decodeLuminance(p).isDefined,
        s"payload for doc ${r.getLong(0)} fell back to the byte path")
    }
    // both codec slices are populated (parity split), plus unpaired
    // %31 distractors (a false pair against one would break the gate)
    val baseIds = corpus.map(_.getLong(0)).filter(_ >= 0)
    assert(baseIds.exists(_ % 2 == 0) && baseIds.exists(_ % 2 == 1),
      "corpus must carry both PNG and JPEG slices")
    assert(baseIds.exists(id => id % 29 != 0 && id % 31 == 0),
      "corpus must carry unpaired distractor images")
    val got = Multimodal.m04PhashNeardupPx(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expect = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 0 && col("doc_id") % 29 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (-1L - id, id, if (id % 2 == 0) "png" else "jpeg")).toSet
    assert(got == expect,
      s"px pairs diverged from the planted construction: " +
        s"missing=${expect -- got} extra=${got -- expect}")
  }
}
