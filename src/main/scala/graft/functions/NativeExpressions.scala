package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two hot interpreted paths.
  *
  * The declarative higher-order-function forms in [[TextFunctions]] /
  * [[VectorFunctions]] evaluate as interpreted expression trees (HOFs
  * have no doGenCode), costing a virtual call per array element; these
  * replacements compute the same values in tight compiled loops and stay
  * inside whole-stage codegen via `defineCodeGen`/`nullSafeCodeGen`.
  * Value parity with the declarative forms (and hence the DuckDB oracle,
  * SURVEY §6) is exact on ASCII text — `charAt(0)` = first byte = what
  * both `ascii()` builtins return — and the gate + NativeExprSpec enforce
  * it; arithmetic is identical (same fold order, IEEE double ops).
  */
object ShingleHashUtil {
  val P = 1000000007L

  /** Portable token value: length*961 + ascii(first)*31 + ascii(last) —
    * mirrors [[TextFunctions.tokenVal]] / [[TextSql.tokenVal]]. Computed
    * on CODEPOINTS (codePointCount / codePointAt / codePointBefore) to
    * match the codepoint semantics of both engines' `length()` and
    * `ascii()` builtins on non-ASCII text — parity is enforced for
    * non-ASCII inputs by NativeExprSpec, not just assumed for the ASCII
    * corpus. */
  def tokenVal(t: UTF8String): Long = {
    if (t == null || t.numBytes() == 0) 0L
    else {
      val s = t.toString
      val len = s.codePointCount(0, s.length).toLong
      len * 961L + s.codePointAt(0).toLong * 31L + s.codePointBefore(s.length).toLong
    }
  }

  /** Distinct word-3-gram shingle hashes in first-occurrence order —
    * mirrors tokenVals → shingleHashesFromVals → array_distinct. */
  def shingleHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { vals(i) = tokenVal(arr.getUTF8String(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      seen.add((vals(i) * 1000003L + vals(i + 1) * 31L + vals(i + 2)) % P)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** array<string> tokens → array<long> distinct 3-gram shingle hashes. */
case class ShingleHashesExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleHashUtil.shingleHashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashUtil.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object PolyFingerprintUtil {
  private val P = ShingleHashUtil.P

  /** Left-fold polynomial fingerprint over per-token values — mirrors
    * [[graft.functions.TextFunctions.polyFingerprint]] fold-for-fold:
    * acc' = (acc·31 + tokenVal(t)) mod P, init 0. acc < P and
    * tokenVal < ~2²⁰ so acc·31 + v < 2³⁵ — no overflow. */
  def fingerprint(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31L + ShingleHashUtil.tokenVal(arr.getUTF8String(i))) % P
      i += 1
    }
    acc
  }
}

/** array<string> tokens → polynomial rolling-hash fingerprint as long. */
case class PolyFingerprintExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    PolyFingerprintUtil.fingerprint(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyFingerprintUtil.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyFingerprintExpr =
    copy(child = newChild)
}

object CosineSimUtil {
  /** Cosine in one pass; accumulator-for-accumulator identical to the
    * three strict left-fold dots of [[VectorFunctions.cosine]] (the
    * accumulators are independent, so interleaving them preserves every
    * intermediate double exactly). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Raw float inner product — the MIPS reference score (s17): the
    * dot accumulator of [[cosine]] alone, same float→double casts and
    * left-fold order, so a driver recompute in element order is
    * bit-identical. Length mismatch fails fast (VecDistUtil.sqDist's
    * rule — a truncated dot would be a quiet parity break). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** (array<float>, array<float>) → raw inner product as double. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected two array<float>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSimUtil.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

object MinhashSigUtil {
  private val P = ShingleHashUtil.P
  /** Same parameter schedule as [[graft.operators.Dedup.minhashA]]/B. */
  val A: Array[Long] = (1 to 32).map(i => (2654435761L * i) % P).toArray
  val B: Array[Long] = (1 to 32).map(i => (2747636419L * i + 40503L) % P).toArray

  /** 32-element MinHash signature of a shingle-hash array — mirrors the
    * declarative [[graft.operators.Dedup.minhashSig]] fold (min over
    * (s·a_i + b_i) mod P, init P). */
  def sig(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val out = Array.fill(32)(P)
    var i = 0
    while (i < n) {
      val s = sh.getLong(i)
      var j = 0
      while (j < 32) {
        val h = (s * A(j) + B(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<long> shingle hashes → array<long> 32-element MinHash signature. */
case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    MinhashSigUtil.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSigUtil.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object Simhash63Util {
  private val P = ShingleHashUtil.P

  /** 63-bit SimHash over token values — mirrors
    * [[graft.operators.Dedup.simhash63]] constant-for-constant: bit b is
    * the sign of Σ_tokens ±1 under universal hash
    * ((v·c_b + d_b) mod P) mod 2 with c_b = ((b+1)·1103515245) mod P,
    * d_b = b·12345 + 6789. */
  def simhash63(arr: ArrayData): Long = {
    val n = arr.numElements()
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { vals(i) = ShingleHashUtil.tokenVal(arr.getUTF8String(i)); i += 1 }
    var out = 0L
    var b = 0
    while (b < 63) {
      val c = ((b + 1).toLong * 1103515245L) % P
      val d = b.toLong * 12345L + 6789L
      var score = 0L
      i = 0
      while (i < n) {
        if (((vals(i) * c + d) % P) % 2 == 1) score += 1 else score -= 1
        i += 1
      }
      if (score > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** array<string> tokens → 63-bit SimHash as long. */
case class Simhash63Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    Simhash63Util.simhash63(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash63Util.simhash63($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash63Expr =
    copy(child = newChild)
}

/** (array<float>, array<float>) → cosine similarity as double; null when
  * either side is null or lengths differ (zip_with null semantics). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected two array<float>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else CosineSimUtil.cosine(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CosineSimUtil.cosine($a, $b);
      }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

object GzipCodecUtil {
  // GZIPOutputStream's constant header: magic, CM=8 (deflate), FLG=0,
  // MTIME=0 (deterministic — the whole point of the fixed encoding),
  // XFL=0, OS=0xff (unknown — what the JDK writes). Byte-identical to
  // the old stream path's output, spec-pinned.
  private val GzipHeader = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)

  /** Per-thread reusable codec state. A fresh GZIP{Input,Output}Stream
    * per record allocates a native zlib Deflater/Inflater (the ~256 KB
    * window setup dominates small-record codec cost: the r06
    * encoded_scan at the reference's 10M × 230 B scale spent 41.6 s
    * mostly here) — `reset()` on a thread-local pair costs nanoseconds.
    * Executor task threads are pooled, so state lives for the JVM; it
    * is reset at every call and never carries data between rows. */
  private final class Codec {
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    val inflater = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32
    var buf = new Array[Byte](16 * 1024)
    def grow(): Unit = buf = java.util.Arrays.copyOf(buf, buf.length * 2)
    def ensure(n: Int): Unit =
      if (buf.length < n) buf = new Array[Byte](java.lang.Integer.highestOneBit(n - 1) << 1)
  }
  private val codecs: ThreadLocal[Codec] = ThreadLocal.withInitial(() => new Codec)

  private def writeIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }
  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** gzip-compress then base64 a string — the packed-record encoding the
    * reference ships around (SampleMapRed.java:35-45 decodes exactly
    * this). Deterministic for a fixed Deflater default, and
    * byte-identical to the GZIPOutputStream form (same header constants,
    * same deflate parameters — spec-pinned round-trip). */
  def encode(s: UTF8String): UTF8String = {
    val c = codecs.get()
    val in = s.getBytes
    val d = c.deflater
    d.reset()
    d.setInput(in)
    d.finish()
    c.ensure(in.length / 2 + 64)
    System.arraycopy(GzipHeader, 0, c.buf, 0, 10)
    var n = 10
    while (!d.finished()) {
      if (n == c.buf.length) c.grow()
      n += d.deflate(c.buf, n, c.buf.length - n)
    }
    c.crc.reset()
    c.crc.update(in, 0, in.length)
    if (c.buf.length < n + 8) c.grow()
    writeIntLE(c.buf, n, c.crc.getValue.toInt)
    writeIntLE(c.buf, n + 4, in.length)
    UTF8String.fromBytes(java.util.Base64.getEncoder.encode(
      java.util.Arrays.copyOf(c.buf, n + 8)))
  }

  /** base64-decode then gzip-decompress; malformed input → null (the
    * reference's decompress() swallows and returns null the same way).
    * Fast path: raw thread-local Inflater over the member body with the
    * CRC32+ISIZE trailer verified exactly like GZIPInputStream; anything
    * the plain-header parse can't pin down (FLG bits set, concatenated
    * members, a stalled stream) falls back to the stream path rather
    * than guessing. */
  def decode(b64: UTF8String): UTF8String = {
    try {
      val bytes = java.util.Base64.getMimeDecoder.decode(b64.getBytes)
      if (bytes.length < 18 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte ||
          bytes(2) != 8 || bytes(3) != 0)
        return decodeStream(bytes)
      val c = codecs.get()
      val inf = c.inflater
      inf.reset()
      inf.setInput(bytes, 10, bytes.length - 18)
      var n = 0
      while (!inf.finished()) {
        if (n == c.buf.length) c.grow()
        val k = inf.inflate(c.buf, n, c.buf.length - n)
        // no progress with output space free = truncated input or a
        // preset-dictionary stream — let the stream path classify it
        if (k == 0 && n < c.buf.length && !inf.finished()) return decodeStream(bytes)
        n += k
      }
      if (inf.getRemaining > 0) return decodeStream(bytes) // concatenated members
      c.crc.reset()
      c.crc.update(c.buf, 0, n)
      if (readIntLE(bytes, bytes.length - 8) != c.crc.getValue.toInt ||
          readIntLE(bytes, bytes.length - 4) != n) null
      else UTF8String.fromBytes(java.util.Arrays.copyOf(c.buf, n))
    } catch { case _: Exception => null }
  }

  /** The general gzip reader (exotic headers, multi-member streams) —
    * the old per-record path, now only the fallback. */
  private def decodeStream(bytes: Array[Byte]): UTF8String = {
    try {
      val gz = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = gz.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = gz.read(buf) }
      gz.close()
      UTF8String.fromBytes(out.toByteArray)
    } catch { case _: Exception => null }
  }
}

/** string → gzip+base64 packed string (reference record packing). */
case class Gzip64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_gzip64"
  override protected def nullSafeEval(input: Any): Any =
    GzipCodecUtil.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipCodecUtil.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): Gzip64Expr =
    copy(child = newChild)
}

/** gzip+base64 packed string → decoded string; null on malformed input. */
case class Gunzip64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip64"
  override protected def nullSafeEval(input: Any): Any =
    GzipCodecUtil.decode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GzipCodecUtil.decode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Gunzip64Expr =
    copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
object WinnowUtil {
  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct winnowing fingerprints of a document — value-identical to
    * the declarative chain
    * `explode positions → conv(substring(md5(substr(text,i,w)),1,15),16,10)
    * → MIN over (ROWS CURRENT..k-1 FOLLOWING) → full-window filter →
    * DISTINCT` (and its DuckDB mirror in Dedup.oracle), computed in one
    * compiled pass per doc:
    *  - positions are CODEPOINT-aligned (a codepoint→byte-offset index
    *    over the UTF-8 bytes), matching both engines' codepoint
    *    `substr`/`length` semantics, and each window hash is MD5 over
    *    the window's UTF-8 byte slice — exactly the bytes
    *    `cast(substr(...) as binary)` hashes, with no per-window string
    *    copies;
    *  - the first 15 hex digits of the digest are the top 60 bits, i.e.
    *    (first 8 digest bytes as unsigned big-endian) >>> 4 — no hex
    *    string or conv() parse;
    *  - sliding-window minima come from the standard monotonic deque
    *    (O(m) total, not O(m·k)), over FULL k-windows only;
    *  - DISTINCT via an insertion-ordered set.
    * Docs shorter than w + k − 1 codepoints have no full window and
    * yield an empty array (explode drops them), mirroring the
    * declarative filter. NativeExprSpec pins set equality per doc. */
  /** Per-POSITION top-60-bit MD5 window hashes — the rolling pass both
    * detectors share: index j holds the hash of the w-codepoint window
    * starting at codepoint j (0-based; the declarative/DuckDB mirrors
    * are 1-based, so their position i = j + 1). [[fingerprints]] is
    * this followed by the winnow k-minimum + DISTINCT; the d19 span
    * extractor consumes it raw because span surgery needs every
    * position, not a sampled-or-deduped set. Docs shorter than w
    * codepoints yield an empty array. */
  def windowHashes(text: UTF8String, w: Int): Array[Long] = {
    val bytes = text.getBytes
    // codepoint -> byte offset index (UTF-8 lead bytes); offsets(nChars)
    // = bytes.length sentinel so window byte-length lookups are uniform
    var nChars = 0
    var off = 0
    while (off < bytes.length) {
      val b = bytes(off) & 0xFF
      off += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      nChars += 1
    }
    val m = nChars - w + 1 // number of w-char windows
    if (m <= 0) return Array.empty[Long]
    val offsets = new Array[Int](nChars + 1)
    var ci = 0
    off = 0
    while (off < bytes.length) {
      offsets(ci) = off
      val b = bytes(off) & 0xFF
      off += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
      ci += 1
    }
    offsets(nChars) = bytes.length
    val md = tlMd5.get()
    val hv = new Array[Long](m)
    var j = 0
    while (j < m) {
      md.reset()
      md.update(bytes, offsets(j), offsets(j + w) - offsets(j))
      val d = md.digest()
      hv(j) = (((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)) >>> 4
      j += 1
    }
    hv
  }

  def fingerprints(text: UTF8String, w: Int, k: Int): ArrayData = {
    val hv = windowHashes(text, w)
    val m = hv.length
    if (m < k) return new GenericArrayData(Array.empty[Long])
    // sliding-window minimum over windows [j, j+k-1], j in 0..m-k,
    // via monotonic deque of candidate indices
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // deque is deque[head until tail]
    var j = 0
    while (j < m) {
      while (tail > head && hv(deque(tail - 1)) >= hv(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - k) head += 1
      if (j >= k - 1) seen.add(hv(deque(head)))
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** string text → array<long> distinct winnowing fingerprints (w-char
  * windows, k-window minima). */
case class WinnowFpsExpr(child: Expression, w: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"
  override protected def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprints(input.asInstanceOf[UTF8String], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowUtil.fingerprints($c, $w, $k)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

/** string text → array<long> PER-POSITION w-char window hashes
  * (element j = hash of the window at codepoint j; no winnow minimum,
  * no dedup) — the [[WinnowUtil.windowHashes]] rolling pass exposed
  * raw for span-level surgery (d19): `posexplode` turns it into the
  * (position, hash) occurrence relation the duplicated-span extractor
  * joins on. Same top-60-bit MD5 value as the declarative
  * `conv(substring(md5(substr(text, i, w)), 1, 15), 16, 10)` chain and
  * its DuckDB mirror (NativeExprSpec pins per-position equality). */
case class WindowHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowUtil.windowHashes(input.asInstanceOf[UTF8String], w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WinnowUtil.windowHashes($c, $w))")
  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}

object PhashUtil {
  /** 63-bit difference hash over 64 evenly-spaced codepoint samples —
    * value-identical to the 126-call declarative SQL in
    * [[graft.operators.Multimodal.phashTerms]] (and its DuckDB mirror):
    * bit i compares the codepoint sampled at codepoint index
    * (i+1)·(n−1)/64 against index i·(n−1)/64 (0-based; the SQL's
    * `1 + j·(n−1) div 64` is the same position 1-based). Codepoint
    * semantics match both engines' `substring`+`ascii` builtins; the
    * all-ASCII corpus takes a direct byte-index fast path. Empty text →
    * 0 (SQL: ascii('') = 0 on every comparison). */
  def dhash63(text: UTF8String): Long = {
    val bytes = text.getBytes
    var nChars = 0
    var off = 0
    var ascii = true
    while (off < bytes.length) {
      val b = bytes(off) & 0xFF
      if (b < 0x80) off += 1
      else { ascii = false; off += (if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4) }
      nChars += 1
    }
    if (nChars == 0) return 0L
    val samples = new Array[Int](64)
    if (ascii) {
      var j = 0
      while (j < 64) {
        samples(j) = bytes(((j.toLong * (nChars - 1)) / 64).toInt) & 0xFF
        j += 1
      }
    } else {
      val offsets = new Array[Int](nChars)
      var ci = 0
      off = 0
      while (off < bytes.length) {
        offsets(ci) = off
        val b = bytes(off) & 0xFF
        off += (if (b < 0x80) 1 else if (b < 0xE0) 2 else if (b < 0xF0) 3 else 4)
        ci += 1
      }
      var j = 0
      while (j < 64) {
        val o = offsets(((j.toLong * (nChars - 1)) / 64).toInt)
        val b = bytes(o) & 0xFF
        samples(j) =
          if (b < 0x80) b
          else if (b < 0xE0) ((b & 0x1F) << 6) | (bytes(o + 1) & 0x3F)
          else if (b < 0xF0)
            ((b & 0x0F) << 12) | ((bytes(o + 1) & 0x3F) << 6) | (bytes(o + 2) & 0x3F)
          else
            ((b & 0x07) << 18) | ((bytes(o + 1) & 0x3F) << 12) |
              ((bytes(o + 2) & 0x3F) << 6) | (bytes(o + 3) & 0x3F)
        j += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 63) {
      if (samples(i + 1) > samples(i)) fp |= (1L << i)
      i += 1
    }
    fp
  }
}

/** string text → 63-bit perceptual difference hash as long. */
case class Phash63Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"
  override protected def nullSafeEval(input: Any): Any =
    PhashUtil.dhash63(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PhashUtil.dhash63($c)")
  override protected def withNewChildInternal(newChild: Expression): Phash63Expr =
    copy(child = newChild)
}

object BpeApplyUtil {
  /** Separator-encoded BPE symbol string of a whole token array —
    * value-identical to the declarative
    * [[graft.operators.TextAnalysis.bpeEncodeDoc]] regex chain (and
    * symbol-for-symbol with the driver fuse loop in `bpeMerges`): each
    * word splits to CODEPOINT symbols plus the `</w>` end marker, every
    * merge rule fuses left-to-right non-overlapping in rank order, and
    * the result is `⌁s₁⌁s₂⌁…⌁` per word, words concatenated. One
    * compiled pass per doc instead of one regexp_replace PASS OVER THE
    * DOC PER RULE — cost grows with symbols actually fused, not with
    * rules × doc length, so a 200-rule tokenizer applies as fast as a
    * 20-rule one (the chained-regex plan cannot).
    *
    * `rules` is the rank-ordered rule list flattened as
    * [l₀, r₀, l₀+r₀, l₁, r₁, l₁+r₁, …]. Null token elements are
    * skipped (the declarative form maps them to null and array_join
    * drops them). */
  def encodeDoc(toks: ArrayData, rules: Array[String]): UTF8String = {
    val sb = new java.lang.StringBuilder()
    val nw = toks.numElements()
    var t = 0
    while (t < nw) {
      if (!toks.isNullAt(t)) appendWord(sb, toks.getUTF8String(t).toString, rules)
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def appendWord(sb: java.lang.StringBuilder, w: String,
      rules: Array[String]): Unit = {
    val ncp = w.codePointCount(0, w.length)
    val syms = new Array[String](ncp + 1)
    var i = 0
    var ci = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms(ci) = new String(Character.toChars(cp))
      i += Character.charCount(cp)
      ci += 1
    }
    syms(ncp) = "</w>"
    var len = ncp + 1
    var ri = 0
    while (ri < rules.length) {
      val l = rules(ri)
      val r = rules(ri + 1)
      var in = 0
      var out = 0
      while (in < len) {
        if (in < len - 1 && syms(in) == l && syms(in + 1) == r) {
          syms(out) = rules(ri + 2)
          in += 2
        } else {
          syms(out) = syms(in)
          in += 1
        }
        out += 1
      }
      len = out
      ri += 3
    }
    var k = 0
    while (k < len) {
      sb.append('\u0001').append(syms(k))
      k += 1
    }
    sb.append('\u0001')
  }
}

/** array<string> tokens → separator-encoded BPE symbol string after
  * applying the (driver-trained, literal-folded) merge rule list. */
case class BpeApplyExpr(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val flat: Array[String] =
    rules.iterator.flatMap { case (l, r) => Iterator(l, r, l + r) }.toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_apply"
  override protected def nullSafeEval(input: Any): Any =
    BpeApplyUtil.encodeDoc(input.asInstanceOf[ArrayData], flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRules", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeApplyUtil.encodeDoc($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object Sq8Util {
  /** Round-half-away-from-zero without the classic `floor(v + 0.5)`
    * double-add bug (0.49999999999999994 + 0.5 == 1.0): frac = v −
    * floor(v) is EXACT for |v| < 2^52, so the ≥ 0.5 comparison is the
    * same decision BigDecimal HALF_UP (Spark round) and C round
    * (DuckDB) make. */
  def roundHalfAway(v: Double): Int =
    if (v >= 0) {
      val f = StrictMath.floor(v)
      (f + (if (v - f >= 0.5) 1 else 0)).toInt
    } else {
      val a = -v
      val f = StrictMath.floor(a)
      -((f + (if (a - f >= 0.5) 1 else 0)).toInt)
    }

  /** Symmetric per-tensor SQ8 encode: code_i = round(x_i · 127/maxAbs)
    * ∈ [−127, 127] — one compiled pass per row; mirrors the declarative
    * `transform(emb, x -> cast(round(x·127/maxAbs) as int))`
    * value-for-value (the double ops are the identical sequence:
    * float→double cast, multiply by the precomputed scale). */
  def encode(emb: ArrayData, scale: Double): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = roundHalfAway(emb.getFloat(i).toDouble * scale)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product of two code arrays — the SQ8 scoring loop.
    * Length mismatch fails fast (sqDist's rule). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_sq8_dot: length mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    s
  }
}

/** array<float> embedding → array<int> symmetric SQ8 codes at the
  * (driver-computed, literal-folded) scale. */
case class Sq8EncodeExpr(child: Expression, scale: Double)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sq8_encode"
  override protected def nullSafeEval(input: Any): Any =
    Sq8Util.encode(input.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Sq8Util.encode($c, ${scale}D)")
  override protected def withNewChildInternal(newChild: Expression): Sq8EncodeExpr =
    copy(child = newChild)
}

/** (array<int>, array<int>) → integer dot product (long). */
case class Sq8DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected two array<int>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq8_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8Util.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Sq8Util.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Sq8DotExpr =
    copy(left = l, right = r)
}

object SymIdsUtil {
  /** Separator-encoded BPE symbol string → token-id array via the
    * vocab's symbol→id table: one manual scan over the string (no regex
    * split, no intermediate array) — the per-row loop of the p12
    * training-shard export, compiled. Mirrors the declarative
    * `transform(filter(split(enc, sep), s -> s <> ''), s ->
    * element_at(map, s))` symbol-for-symbol (spec-pinned). The OOV
    * CONTRACT is explicit, not accidental (`unkId`):
    *  - `unkId < 0` (SAME-CORPUS mode, p12's default): OOV symbols FAIL
    *    FAST — the vocab is derived from the same corpus+rules, so a
    *    miss is a build bug, and a silent skip would shift every later
    *    token position in the shard;
    *  - `unkId >= 0` (CROSS-CORPUS mode): OOV symbols map to `unkId`
    *    (the caller reserves it — [[graft.operators.Pipelines]] uses
    *    vocab.size, one past the last real id), keeping every position
    *    and making the OOV mass COUNTABLE downstream — the production
    *    policy for a tokenizer trained once and applied to corpora it
    *    never saw. */
  def ids(enc: UTF8String, vocab: java.util.HashMap[String, Integer],
      unkId: Int): ArrayData = {
    val s = enc.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == '\u0001') {
        if (i > start) {
          val id = vocab.get(s.substring(start, i))
          if (id == null) {
            if (unkId < 0) throw new IllegalArgumentException(
              s"graft_sym_ids: symbol '${s.substring(start, i)}' not in vocab")
            out += unkId
          } else out += id.intValue()
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

/** Separator-encoded symbol string → array<int> token ids against the
  * (driver-collected, literal-folded) sorted vocab. `unkId < 0` =
  * fail-fast on OOV (same-corpus default); `unkId >= 0` = map OOV to
  * that reserved id (cross-corpus mode — see [[SymIdsUtil.ids]]). */
case class SymIdsExpr(child: Expression, vocab: Seq[String],
    unkId: Int = -1) extends UnaryExpression {
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.zipWithIndex.foreach { case (s, i) => m.put(s, Integer.valueOf(i)) }
    m
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sym_ids"
  override protected def nullSafeEval(input: Any): Any =
    SymIdsUtil.ids(input.asInstanceOf[UTF8String], table, unkId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("symVocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.SymIdsUtil.ids($c, $ref, $unkId)")
  }
  override protected def withNewChildInternal(newChild: Expression): SymIdsExpr =
    copy(child = newChild)
}

object PqUtil {
  /** PQ encode: per subspace, argmin squared distance from the
    * embedding's subvector to the broadcast sub-centroids — mirrors the
    * declarative [[graft.operators.Similarity.pqCodes]] HOF chain
    * op-for-op: float→double cast per element, left-fold sum of squared
    * diffs in element order, first minimum wins ties (array_position
    * returns the FIRST match; the running strict `<` keeps the first
    * argmin the same way). */
  def encode(emb: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val out = new Array[Int](m)
    var mm = 0
    var base = 0
    while (mm < m) {
      val book = books(mm)
      val dsub = book(0).length
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val c = book(j)
        var dd = 0.0
        var t = 0
        while (t < dsub) {
          val df = emb.getFloat(base + t).toDouble - c(t)
          dd += df * df
          t += 1
        }
        if (dd < bd) { bd = dd; best = j }
        j += 1
      }
      out(mm) = best
      base += dsub
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance: Σ_mm qtab[mm][codes[mm]] — mirrors the declarative
    * `aggregate(zip_with(codes, qtab, (c, t) => element_at(t, c + 1)),
    * 0.0, _ + _)` left fold in element order. */
  def adc(codes: ArrayData, qtab: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = codes.numElements()
    while (i < n) {
      acc += qtab.getArray(i).getDouble(codes.getInt(i))
      i += 1
    }
    acc
  }
}

/** array<float> embedding → array<int> PQ codes against the
  * (driver-fit, literal-folded) per-subspace codebooks. */
object VecDistUtil {
  /** Σ (a_i − b_i)² over two double arrays — left fold in element order,
    * the exact op sequence of the declarative
    * `aggregate(zip_with(a, b, (x,y) -> (x−y)·(x−y)), 0.0, +)`.
    * PRECONDITION: equal-length arrays of non-null elements (the
    * fixed-dimension embedding contract every caller feeds). Length
    * mismatch FAILS FAST instead of silently summing the truncated
    * prefix (the declarative mirror yields null there — a truncated sum
    * would be a quiet parity break); element nullability stays a
    * documented precondition because a per-element branch would tax the
    * corpus-sized hot loop. */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_sqdist: length mismatch ${n} vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Argmin of squared euclidean distance from a float vector to each
    * row of a float matrix (array<array<float>>) — the coarse-quantizer
    * assignment loop. Float→double cast per element, left-fold sum in
    * element order, strict `<` keeps the FIRST minimum: op-for-op the
    * declarative `array_position(dists, array_min(dists)) − 1` over the
    * zip_with/aggregate distance array, so the native swap is
    * bit-identical (spec-pinned). */
  def argminSqDist(emb: ArrayData, cents: ArrayData): Int = {
    val k = cents.numElements()
    val d = emb.numElements()
    var best = 0
    var bd = Double.MaxValue
    var j = 0
    while (j < k) {
      val c = cents.getArray(j)
      if (c.numElements() != d) // sqDist's fail-fast rule, per centroid row
        throw new IllegalArgumentException(
          s"graft_argmin_sqdist: centroid $j has ${c.numElements()} dims, embedding has $d")
      var s = 0.0
      var i = 0
      while (i < d) {
        val df = emb.getFloat(i).toDouble - c.getFloat(i).toDouble
        s += df * df
        i += 1
      }
      if (s < bd) { bd = s; best = j }
      j += 1
    }
    best
  }

  /** Indices of the `k` nearest centroid rows by squared euclidean
    * distance, in increasing (distance, index) order — the multi-probe
    * list selection loop ([[argminSqDist]] generalized to k > 1; the
    * k = 1 head equals argminSqDist by construction). Same per-element
    * float→double cast and left-fold sum; ordering is lexicographic
    * (distance, index), so ties resolve to the LOWER index at every
    * rank — op-for-op the declarative array_sort over (dist, idx)
    * structs (spec-pinned). k-pass selection scan: k is the nProbe
    * knob (2–8), never large, so k·nLists·d with no allocation beats a
    * heap at these sizes. Finite inputs assumed (quantizer centroids
    * and corpus vectors — NaN never enters the index path). */
  def argminKSqDist(emb: ArrayData, cents: ArrayData, k: Int): ArrayData = {
    val n = cents.numElements()
    val d = emb.numElements()
    val dists = new Array[Double](n)
    var j = 0
    while (j < n) {
      val c = cents.getArray(j)
      if (c.numElements() != d) // sqDist's fail-fast rule, per centroid row
        throw new IllegalArgumentException(
          s"graft_argmink_sqdist: centroid $j has ${c.numElements()} dims, embedding has $d")
      var s = 0.0
      var i = 0
      while (i < d) {
        val df = emb.getFloat(i).toDouble - c.getFloat(i).toDouble
        s += df * df
        i += 1
      }
      dists(j) = s
      j += 1
    }
    val m = math.min(k, n)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var t = 0
    while (t < m) {
      var best = -1
      var bd = 0.0
      var p = 0
      while (p < n) {
        if (!taken(p) && (best < 0 || dists(p) < bd)) { bd = dists(p); best = p }
        p += 1
      }
      taken(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** (array<double>, array<double>) → squared euclidean distance. */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"expected two array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDistUtil.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDistUtil.sqDist($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistExpr =
    copy(left = l, right = r)
}

/** (array<float> emb, array<array<float>> centroids) → argmin list id. */
case class ArgminSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected (array<float>, array<array<float>>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_sqdist"
  override protected def nullSafeEval(emb: Any, cents: Any): Any =
    VecDistUtil.argminSqDist(emb.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) => s"graft.functions.VecDistUtil.argminSqDist($e, $c)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgminSqDistExpr =
    copy(left = l, right = r)
}

/** (array<float> emb, array<array<float>> centroids) → the `k` nearest
  * list ids, in increasing (distance, index) order — multi-probe IVF
  * assignment ([[ArgminSqDistExpr]] widened to k results; `k` is a
  * plan-time literal, so the codegen'd call sites stay monomorphic). */
case class ArgminKSqDistExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"graft_argmink_sqdist: k must be >= 1, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected (array<float>, array<array<float>>), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_argmink_sqdist"
  override protected def nullSafeEval(emb: Any, cents: Any): Any =
    VecDistUtil.argminKSqDist(
      emb.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) => s"graft.functions.VecDistUtil.argminKSqDist($e, $c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgminKSqDistExpr =
    copy(left = l, right = r)
}

object PcaUtil {
  /** Center-and-project: out[j] = Σ_i (emb[i] − mean[i]) · axes[j][i] —
    * one compiled mat-vec per row (k·d multiplies), the map-side
    * transform behind the s13/s14 embedding-compression path. Plain
    * left-fold sum per output dim, so a driver recompute in the same
    * order is bit-identical. */
  def project(emb: ArrayData, mean: Array[Double],
      axes: Array[Array[Double]]): ArrayData = {
    val d = mean.length
    val c = new Array[Double](d)
    var i = 0
    while (i < d) { c(i) = emb.getFloat(i).toDouble - mean(i); i += 1 }
    val out = new Array[Double](axes.length)
    var j = 0
    while (j < axes.length) {
      val a = axes(j)
      var s = 0.0
      var t = 0
      while (t < d) { s += c(t) * a(t); t += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** array<float> embedding → array<double> PCA projection against
  * literal (mean, axes) — codegen'd mat-vec ([[PcaUtil.project]]). */
case class PcaProjectExpr(child: Expression, mean: Seq[Double],
    axes: Seq[Seq[Double]]) extends UnaryExpression {
  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val axesArr: Array[Array[Double]] =
    axes.map(_.toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pca_project"
  override protected def nullSafeEval(input: Any): Any =
    PcaUtil.project(input.asInstanceOf[ArrayData], meanArr, axesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rm = ctx.addReferenceObj("pcaMean", meanArr, "double[]")
    val ra = ctx.addReferenceObj("pcaAxes", axesArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PcaUtil.project($c, $rm, $ra)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProjectExpr =
    copy(child = newChild)
}

case class PqEncodeExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  @transient private lazy val booksArr: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"
  override protected def nullSafeEval(input: Any): Any =
    PqUtil.encode(input.asInstanceOf[ArrayData], booksArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", booksArr, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqUtil.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** (array<int> codes, array<array<double>> ADC table) → approximate
  * squared distance as double. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"expected (array<int>, array<array<double>>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"
  override protected def nullSafeEval(codes: Any, qtab: Any): Any =
    PqUtil.adc(codes.asInstanceOf[ArrayData], qtab.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.PqUtil.adc($c, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(left = l, right = r)
}

object NativeFunctions {
  def shingleHashes(toks: Column): Column =
    Shims.column(ShingleHashesExpr(Shims.expression(toks)))
  def simhash63(toks: Column): Column =
    Shims.column(Simhash63Expr(Shims.expression(toks)))
  def minhashSig(sh: Column): Column =
    Shims.column(MinhashSigExpr(Shims.expression(sh)))
  def polyFingerprint(toks: Column): Column =
    Shims.column(PolyFingerprintExpr(Shims.expression(toks)))
  def gzip64(s: Column): Column =
    Shims.column(Gzip64Expr(Shims.expression(s)))
  def gunzip64(s: Column): Column =
    Shims.column(Gunzip64Expr(Shims.expression(s)))
  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSimExpr(Shims.expression(a), Shims.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    Shims.column(DotProductExpr(Shims.expression(a), Shims.expression(b)))
  def winnowFps(text: Column, w: Int, k: Int): Column =
    Shims.column(WinnowFpsExpr(Shims.expression(text), w, k))
  def windowHashes(text: Column, w: Int): Column =
    Shims.column(WindowHashesExpr(Shims.expression(text), w))
  def phash63(text: Column): Column =
    Shims.column(Phash63Expr(Shims.expression(text)))
  def bpeApply(toks: Column, rules: Seq[(String, String)]): Column =
    Shims.column(BpeApplyExpr(Shims.expression(toks), rules))
  def symIds(enc: Column, vocab: Seq[String]): Column =
    Shims.column(SymIdsExpr(Shims.expression(enc), vocab))
  def symIds(enc: Column, vocab: Seq[String], unkId: Int): Column =
    Shims.column(SymIdsExpr(Shims.expression(enc), vocab, unkId))
  def sq8Encode(emb: Column, scale: Double): Column =
    Shims.column(Sq8EncodeExpr(Shims.expression(emb), scale))
  def sq8Dot(a: Column, b: Column): Column =
    Shims.column(Sq8DotExpr(Shims.expression(a), Shims.expression(b)))
  def pqEncode(emb: Column, books: Seq[Seq[Seq[Double]]]): Column =
    Shims.column(PqEncodeExpr(Shims.expression(emb), books))
  def pcaProject(emb: Column, mean: Seq[Double], axes: Seq[Seq[Double]]): Column =
    Shims.column(PcaProjectExpr(Shims.expression(emb), mean, axes))
  def sqDist(a: Column, b: Column): Column =
    Shims.column(SqDistExpr(Shims.expression(a), Shims.expression(b)))
  def argminSqDist(emb: Column, cents: Column): Column =
    Shims.column(ArgminSqDistExpr(Shims.expression(emb), Shims.expression(cents)))
  def argminKSqDist(emb: Column, cents: Column, k: Int): Column =
    Shims.column(ArgminKSqDistExpr(Shims.expression(emb), Shims.expression(cents), k))
  def pqAdc(codes: Column, qtab: Column): Column =
    Shims.column(PqAdcExpr(Shims.expression(codes), Shims.expression(qtab)))

  /** Spark's own runtime-filter Bloom machinery (BloomFilterAggregate /
    * BloomFilterMightContain — what InjectRuntimeFilter builds for join
    * pruning), surfaced as library Columns: build a Bloom sketch over a
    * LONG key column in one partial-aggregable pass, test membership
    * map-side. NOT a custom sketch — the aggregation, serialized format,
    * and the codegen'd probe are Spark's, we only route around the
    * private function registry. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    Shims.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        Shims.expression(key), expectedItems).toAggregateExpression())

  /** `might_contain` probe against a ONE-ROW Bloom-sketch DataFrame (a
    * [[bloomAgg]] aggregate), attached as a SCALAR SUBQUERY — the only
    * bloom-input form the analyzer accepts (a join-produced attribute
    * is rejected), and exactly what Spark's own InjectRuntimeFilter
    * builds: the subquery executes once and the probe runs map-side. */
  def mightContain(bloomOneRow: org.apache.spark.sql.DataFrame,
      key: Column): Column =
    Shims.column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomOneRow.queryExecution.analyzed),
      Shims.expression(key)))
}
