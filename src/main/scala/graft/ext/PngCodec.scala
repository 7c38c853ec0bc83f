package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec for the 8-bit GRAYSCALE subset (color type 0,
  * bit depth 8, no interlace) — the one raster format whose full
  * pixel decode needs nothing beyond `java.util.zip`: zlib inflate
  * plus the five scanline filters (None/Sub/Up/Average/Paeth) of the
  * public spec (RFC 2083 §6, PNG third edition §9). This retires the
  * pixel-decode stub for PNG in [[Multimodal]]; JPEG/video/MP3 pixel
  * and sample decode remain the documented environment-blocked
  * boundary (they need ffmpeg-class codec tables, not just a
  * DEFLATE implementation).
  *
  * The unfilter math is the same recurrence the PDF codec's xref
  * predictor path applies (`sources/pdf/PdfDocument.applyPredictor`)
  * — here with the full chunk grammar around it: signature, CRC-32
  * verified chunk walk, IHDR validation, multi-IDAT concatenation.
  *
  * Reference behavior: the reference's extractor stack ships PIL-
  * class raster decode for exactly this tier; the engine's contract
  * (`mm_image`) proves encode→decode bit-exactness per asset against
  * a closed-form DuckDB oracle.
  */
object PngCodec {

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Decoded grayscale image: dimensions + row-major 8-bit pixels. */
  final case class Gray8(width: Int, height: Int, pixels: Array[Byte])

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  /** Encode row-major 8-bit grayscale pixels. `filterOfRow` picks the
    * per-scanline filter type (0-4) — the tests cycle through all
    * five so the decoder's whole unfilter surface is exercised by
    * every round-trip.
    */
  def encodeGray8(
      width: Int,
      height: Int,
      pixels: Array[Byte],
      filterOfRow: Int => Int = _ => 0,
      // ancillary metadata (round 15, the mm_image_meta gate): pHYs
      // pixels-per-metre pair and tEXt keyword/value pairs, written
      // BETWEEN IHDR and IDAT per the RFC 2083 §4.2 ordering rules
      physPpm: Option[(Int, Int)] = None,
      texts: Seq[(String, String)] = Nil): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad gray8 geometry ${width}x$height vs ${pixels.length}")
    // filter scanlines (encode side of RFC 2083 §6.6: raw - predictor)
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      val ft = filterOfRow(y)
      require(ft >= 0 && ft <= 4, s"bad PNG filter type $ft")
      raw(y * (width + 1)) = ft.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x) & 0xff
        val left = if (x > 0) pixels(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * width + x) & 0xff else 0
        val upLeft = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        raw(y * (width + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val out = new java.io.ByteArrayOutputStream(64 + raw.length)
    out.write(Signature, 0, Signature.length)
    writeChunk(out, "IHDR", ihdr)
    for ((px, py) <- physPpm) {
      val d = java.nio.ByteBuffer.allocate(9)
        .putInt(px).putInt(py).put(1.toByte) // unit: metre
        .array()
      writeChunk(out, "pHYs", d)
    }
    for ((k, v) <- texts) {
      require(k.nonEmpty && k.length <= 79 && !k.contains('\u0000'),
        s"bad tEXt keyword '$k'")
      val d = (k + "\u0000" + v).getBytes("ISO-8859-1")
      writeChunk(out, "tEXt", d)
    }
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Extracted ancillary metadata of a PNG: dimensions, the pHYs
    * pixels-per-metre pair (0,0 when absent), and tEXt pairs in file
    * order.
    */
  final case class PngMeta(width: Int, height: Int, ppmX: Int, ppmY: Int,
      texts: Seq[(String, String)])

  /** CRC-verified metadata walk (round 15): the same chunk discipline
    * as [[decodeGray8]] — hostile lengths guarded in Long, every CRC
    * checked, None (never a garble) on anything structurally corrupt
    * — but surfacing the ANCILLARY chunks the pixel decoder skips:
    * pHYs physical density and tEXt keyword/value pairs. No inflate
    * runs; this is the cheap metadata pass a 100 TB image-corpus
    * audit does before deciding what to decode.
    */
  def metaGray8(bytes: Array[Byte]): Option[PngMeta] = {
    if (bytes.length < Signature.length + 12 ||
        !bytes.startsWith(Signature)) return None
    var width = -1
    var height = -1
    var ppmX = 0
    var ppmY = 0
    val texts = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = Signature.length
    var ended = false
    while (!ended) {
      if (i + 8 > bytes.length) return None
      val len = be32(bytes, i)
      if (len < 0 || i.toLong + 12L + len > bytes.length) return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, i + 4, 4 + len)
      if (crc.getValue.toInt != be32(bytes, i + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, i + 8)
          height = be32(bytes, i + 12)
        case "pHYs" =>
          if (len != 9) return None
          ppmX = be32(bytes, i + 8)
          ppmY = be32(bytes, i + 12)
        case "tEXt" =>
          val d = new String(bytes, i + 8, len, "ISO-8859-1")
          val sep = d.indexOf('\u0000')
          if (sep <= 0) return None
          texts += ((d.substring(0, sep), d.substring(sep + 1)))
        case "IEND" => ended = true
        case _ => ()
      }
      i += 12 + len
    }
    if (width <= 0 || height <= 0) None
    else Some(PngMeta(width, height, ppmX, ppmY, texts.toSeq))
  }

  private def writeChunk(
      out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Full pixel decode of an 8-bit grayscale PNG: CRC-verified chunk
    * walk, IHDR validation, IDAT concatenation, zlib inflate, and
    * scanline unfiltering. Returns None (never throws, never garbles)
    * for anything outside the supported subset or structurally
    * corrupt — the stub-fallback contract of the header decoders.
    */
  def decodeGray8(bytes: Array[Byte]): Option[Gray8] = {
    if (bytes.length < Signature.length + 12 ||
        !bytes.startsWith(Signature)) return None
    var width = -1
    var height = -1
    var headerOk = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = Signature.length
    var ended = false
    while (!ended) {
      if (i + 8 > bytes.length) return None
      val len = be32(bytes, i)
      // Long arithmetic: a hostile length near Int.MaxValue would wrap
      // `i + 12 + len` negative and slip past an Int-typed guard.
      if (len < 0 || i.toLong + 12L + len > bytes.length) return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, i + 4, 4 + len)
      if (crc.getValue.toInt != be32(bytes, i + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, i + 8)
          height = be32(bytes, i + 12)
          val bitDepth = bytes(i + 16) & 0xff
          val colorType = bytes(i + 17) & 0xff
          val interlace = bytes(i + 20) & 0xff
          // supported subset: 8-bit grayscale, non-interlaced; the
          // long-side cap keeps a hostile header from allocating GBs
          headerOk = bitDepth == 8 && colorType == 0 && interlace == 0 &&
            width > 0 && height > 0 &&
            width.toLong * height <= 64L * 1024 * 1024
          if (!headerOk) return None
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (!headerOk || idat.size() == 0) return None
    val raw =
      try inflateExact(idat.toByteArray, height * (width + 1))
      catch { case _: Exception => return None }
    if (raw == null) return None
    // unfilter (RFC 2083 §6.5/§6.6), bpp = 1 for gray8
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (width + 1)) & 0xff
      var x = 0
      while (x < width) {
        val v = raw(y * (width + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * width + x) & 0xff else 0
        val upLeft = if (x > 0 && y > 0) px((y - 1) * width + x - 1) & 0xff else 0
        val recon = ft match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + ((left + up) / 2)
          case 4 => v + paeth(left, up, upLeft)
          case _ => return None // bad filter byte
        }
        px(y * width + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Gray8(width, height, px))
  }

  /** zlib inflate expecting EXACTLY `expected` bytes; null on any
    * mismatch (truncated or oversized stream = corrupt image).
    */
  private def inflateExact(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (!inf.finished() && off < expected) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && !inf.finished()) return null // needs input/dict: truncated
        off += n
      }
      if (off != expected) return null
      // the FINISHED flag may need one more pull at an exact boundary;
      // any extra byte produced means an oversized stream = corrupt
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) > 0) return null
      if (!inf.finished()) null else out
    } finally inf.end()
  }

  /** Paeth predictor (RFC 2083 §6.6; public algorithm). */
  private def paeth(left: Int, up: Int, upLeft: Int): Int = {
    val p = left + up - upLeft
    val pa = math.abs(p - left)
    val pb = math.abs(p - up)
    val pc = math.abs(p - upLeft)
    if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
}
