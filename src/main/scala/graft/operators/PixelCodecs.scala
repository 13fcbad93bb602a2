package graft.operators

/** Deterministic zero-dependency image ENCODERS — the generator side of
  * the r12 pixel decoders ([[Multimodal.decodePngLuminance]] /
  * [[Multimodal.decodeJpegLuminance]]), promoted from the spec fixtures
  * into main (r13) so the driver-gated `m04_phash_neardup_px` corpus
  * can plant REAL encodes that actually parse, instead of the decode
  * path living only inside hand-assembled spec payloads.
  *
  * - PNG: hand-rolled writer — IHDR/IDAT/IEND with per-row §9.2
  *   filtering and `java.util.zip.Deflater` compression. Deterministic
  *   for a fixed (plane, colorType, level, filterType).
  * - JPEG: the JDK's ImageIO baseline writer (the same independent
  *   codec the specs cross-check the decoder against). Deterministic
  *   for a fixed (image, quality) on a fixed JDK.
  *
  * Reference anchor: SampleMapRed.java:35-45's decode-then-scan is the
  * lineage — the corpus generator here exists so that scan's decode
  * half runs under the correctness gate, not only under specs. */
private[graft] object PixelCodecs {

  /** 8-bit PNG of `w`×`h` with every row filtered by `filterType`
    * (0=None 1=Sub 2=Up 3=Average 4=Paeth) and deflated at `level`.
    * `colorType`: 0=gray, 2=RGB, 6=RGBA; `px(x, y)` supplies (r, g, b)
    * — gray takes the r channel. */
  def makePng(w: Int, h: Int, colorType: Int, level: Int,
      filterType: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      be32(data.length.toLong) ++ typ.getBytes("US-ASCII") ++ data ++
        be32(crc.getValue)
    }
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    // raw (unfiltered) sample plane
    val raw = Array.tabulate(h, w * bpp) { (y, i) =>
      val (r, g, b) = px(i / bpp, y)
      val v = (i % bpp) match {
        case 0 => r
        case 1 => if (colorType == 0) 0 else g
        case 2 => b
        case _ => 255 // alpha
      }
      v.toByte
    }
    // apply the chosen filter per row (the encoder side of §9.2)
    val scan = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      scan.write(filterType)
      for (x <- 0 until w * bpp) {
        val cur = raw(y)(x) & 0xff
        val a = if (x >= bpp) raw(y)(x - bpp) & 0xff else 0
        val b = if (y > 0) raw(y - 1)(x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) raw(y - 1)(x - bpp) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        scan.write((cur - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater(level)
    defl.setInput(scan.toByteArray); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array[Byte]())
  }

  /** A TYPE_BYTE_GRAY image carrying `lum` verbatim (raster setSample,
    * not setRGB — the latter routes through an sRGB transform that
    * would distort planted values). */
  def grayImage(w: Int, h: Int, lum: Array[Int]): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, lum(y * w + x)); x += 1 }
      y += 1
    }
    img
  }

  /** Baseline (or, for adversarial fixtures, progressive) JPEG via the
    * JDK's ImageIO writer at explicit `quality`. */
  def encodeJpeg(img: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }
}
