package graft.sources.pdf

import java.io.ByteArrayOutputStream

/** The non-Flate stream filters of ISO 32000 §7.4 that can carry text
  * content: ASCIIHexDecode, ASCII85Decode, and LZWDecode (the
  * reference reaches these through pypdf's filter layer,
  * `/root/reference/pdf_reader.py:442-443`). Image-only filters
  * (DCT/JPX/CCITT/JBIG2) stay out of scope — they never sit on a
  * content stream, only on image XObjects this extractor skips.
  */
private[pdf] object PdfFilters {

  /** `ASCIIHexDecode`: hex digit pairs, whitespace ignored, `>` EOD,
    * odd final digit padded with 0.
    */
  def asciiHexDecode(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < bytes.length && !done) {
      val c = bytes(i) & 0xff
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        done = true
      } else if (!Character.isWhitespace(c)) {
        val v = Character.digit(c, 16)
        if (v < 0) throw new PdfParseException(s"ASCIIHex: bad digit '${c.toChar}'")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    // a missing EOD marker is tolerated (the stream length bounds us)
    if (!done && hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** `ASCII85Decode`: base-85 groups of five chars `!`..`u` → four
    * bytes; `z` is shorthand for four zero bytes; `~>` is EOD; a final
    * partial group of n chars yields n−1 bytes (padded with `u` for
    * decoding, pad bytes dropped).
    */
  def ascii85Decode(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var k = 0
    def flush(n: Int): Unit = { // n = chars present (2..5)
      var j = n
      while (j < 5) { group(j) = 84; j += 1 } // pad with 'u'
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + group(i); i += 1 }
      if (v > 0xFFFFFFFFL) throw new PdfParseException("ASCII85: group overflow")
      var shift = 24
      var emitted = 0
      while (emitted < n - 1) {
        out.write(((v >> shift) & 0xff).toInt)
        shift -= 8; emitted += 1
      }
    }
    var i = 0
    var done = false
    while (i < bytes.length && !done) {
      val c = bytes(i) & 0xff
      if (c == '~') done = true // EOD (the '>' follows)
      else if (c == 'z') {
        if (k != 0) throw new PdfParseException("ASCII85: 'z' inside group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!Character.isWhitespace(c)) {
        if (c < '!' || c > 'u') throw new PdfParseException(s"ASCII85: bad char '${c.toChar}'")
        group(k) = c - '!'
        k += 1
        if (k == 5) { flush(5); k = 0 }
      }
      i += 1
    }
    if (k == 1) throw new PdfParseException("ASCII85: lone trailing char")
    if (k > 1) flush(k)
    out.toByteArray
  }

  /** `LZWDecode`: the TIFF/PDF LZW variant — 8-bit symbols, MSB-first
    * variable-width codes starting at 9 bits, code 256 = clear table,
    * 257 = EOD, table grows to 4096 entries, and the code width
    * increases `EarlyChange` (default 1) entries before the table
    * strictly requires it (ISO 32000 §7.4.4: 9→10 as entry 511 is
    * added with early change).
    */
  def lzwDecode(bytes: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length * 3)
    val table = new Array[Array[Byte]](4096)
    var nextCode = 258
    var width = 9

    def resetTable(): Unit = {
      var i = 0
      while (i < 256) { table(i) = Array(i.toByte); i += 1 }
      nextCode = 258
      width = 9
    }
    resetTable()

    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      // refill
      while (bitCnt < width && pos < bytes.length) {
        bitBuf = (bitBuf << 8) | (bytes(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) done = true // ran out without EOD: tolerate
      else {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 257) done = true // EOD
        else if (code == 256) { resetTable(); prev = null }
        else {
          val entry =
            if (code < nextCode && table(code) != null) table(code)
            else if (code == nextCode && prev != null) prev :+ prev(0) // KwKwK
            else throw new PdfParseException(s"LZW: bad code $code")
          out.write(entry, 0, entry.length)
          if (prev != null && nextCode < 4096) {
            table(nextCode) = prev :+ entry(0)
            nextCode += 1
            if (nextCode + earlyChange >= (1 << width) && width < 12) width += 1
          }
          prev = entry
        }
      }
    }
    out.toByteArray
  }
}
