package graft.ext

/** Pure-JVM baseline JPEG codec (ISO/IEC 10918-1, SOF0 sequential
  * DCT, Huffman entropy coding) — the same move that retired the PNG
  * pixel stub in round 7 ([[PngCodec]]): everything here derives from
  * the public spec, no codec jars. This retires the JPEG tier of the
  * pixel-decode stub in [[Multimodal]]; arithmetic coding, 12-bit
  * precision, hierarchical/lossless modes, and MP3-sample/inter-frame
  * video decode stay the documented boundary.
  *
  * Scope:
  *  - '''decode (progressive, round 8)''': SOF2 multi-scan streams
  *    per Annex G — spectral selection × successive approximation,
  *    DC/AC first and refinement passes, EOB-run batching, between-
  *    scan table redefinition, restart markers — for the same 1- or
  *    3-component 8-bit subset as baseline (see
  *    [[decodeProgressiveImpl]]); validated against the JDK encoder's
  *    own progressive scan scripts in both gray and YCbCr.
  *  - '''decode''': baseline interleaved single-scan JPEG with 1
  *    component (grayscale) or 3 components (JFIF YCbCr, any
  *    sampling factors ≤ 2×2, i.e. 4:4:4 / 4:2:2 / 4:2:0), with
  *    restart markers. Output is the LUMA plane (`gray = Y`): a
  *    training-data pipeline normalizes rasters to grayscale
  *    features, so chroma coefficients are entropy-decoded (the
  *    bitstream demands it) but never IDCT'd — the decoder does
  *    ~1/6 of a full-color decode's IDCT work on 4:2:0 input.
  *  - '''encode''': single-component grayscale baseline with the
  *    spec's example Huffman tables (Annex K.3) and a caller-chosen
  *    quantization table. The encoder exists for the same reason
  *    [[PngCodec.encodeGray8]] does: the `mm_image_jpeg` contract
  *    synthesizes assets per row and proves the full
  *    FDCT→quant→Huffman→parse→Huffman⁻¹→dequant→IDCT loop against
  *    a closed-form oracle (constant 8×8 blocks with a divisor-exact
  *    DC quantizer reconstruct EXACTLY — DC-only blocks make the
  *    lossy pipeline lossless, see [[Multimodal.mmImageJpeg]]).
  *
  * The decode contract matches the header-decoder tier: `None`,
  * never a throw, never garbled pixels, for anything outside the
  * supported subset or structurally corrupt.
  */
object JpegCodec {

  /** Decoded grayscale (luma) image, row-major 8-bit pixels. */
  final case class Gray8(width: Int, height: Int, pixels: Array[Byte])

  // ------------------------------------------------------------------
  // Spec constants (ISO/IEC 10918-1)
  // ------------------------------------------------------------------

  /** Zig-zag scan order (Figure 5): zigzag(k) = raster index of the
    * k-th coefficient in transmission order.
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 example DC luminance table: BITS then HUFFVAL. */
  private val DcLumBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 example AC luminance table. */
  private val AcLumBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** A flat quantization table with every divisor = `q`. With `q = 8`
    * the DC quantizer exactly inverts the FDCT's ×8 DC gain, which is
    * what makes constant-block assets reconstruct bit-exactly.
    */
  def flatQuant(q: Int): Array[Int] = Array.fill(64)(q)

  /** Annex K.1 example luminance quantization table (raster order) —
    * used by the cross-validation tests for a realistic lossy table.
    */
  val AnnexKLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // ------------------------------------------------------------------
  // DCT (double-precision separable; exact for DC-only blocks)
  // ------------------------------------------------------------------

  // cosTab(u)(x) = cos((2x+1)uπ/16) · C(u)/2, the 1-D basis with the
  // normalization folded in, so 2-D (F)DCT/IDCT are two passes of
  // plain dot products.
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Forward DCT of one level-shifted 8×8 block (A.3.3). */
  private def fdct(block: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y,u) = Σx block(y,x)·basis(u,x)
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * cosTab(u)(x); x += 1 }
        tmp(y * 8 + u) = s; u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // columns
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * cosTab(v)(yy); yy += 1 }
        out(v * 8 + u) = s; u += 1
      }
      v += 1
    }
  }

  /** Inverse DCT of one dequantized 8×8 block (A.3.3). */
  private def idct(coef: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows: tmp(v,x) = Σu coef(v,u)·basis(u,x)
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += coef(v * 8 + u) * cosTab(u)(x); u += 1 }
        tmp(v * 8 + x) = s; x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // columns
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * cosTab(vv)(y); vv += 1 }
        out(y * 8 + x) = s; x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(value: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (B.2.1). */
    def flush(): Unit = if (nbits > 0) { put(0x7f, 8 - nbits) }
  }

  /** (code, length) for each symbol of a (BITS, HUFFVAL) table, per
    * Annex C's canonical code construction.
    */
  private def buildEncodeTable(
      bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** Magnitude category (CSIZE) of a coefficient value (F.1.2.1.2). */
  private def csize(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode row-major 8-bit grayscale pixels as a baseline JFIF JPEG:
    * SOI, APP0, DQT, SOF0 (1 component, 1×1 sampling), DHT (Annex K
    * luminance pair), SOS, entropy-coded scan, EOI. Edge pixels are
    * replicated to fill partial blocks (the spec's recommended pad —
    * keeps block DCTs free of artificial high frequencies).
    * `quant` is the raster-order quantization table.
    */
  def encodeGray8(
      width: Int, height: Int, pixels: Array[Byte],
      quant: Array[Int] = AnnexKLumQuant): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad gray8 geometry ${width}x$height vs ${pixels.length}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1,255]")
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0); u16(1); u16(1) // aspect-ratio units, 1:1
    out.write(0); out.write(0)   // no thumbnail
    marker(0xdb) // DQT, table 0, 8-bit, zig-zag order
    u16(2 + 1 + 64)
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(quant(ZigZag(k))); k += 1 }
    marker(0xc0) // SOF0: 8-bit, 1 component, 1x1, q-table 0
    u16(8 + 3)
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      u16(2 + 1 + 16 + vals.length)
      out.write(clazz << 4)
      var i = 1
      while (i <= 16) { out.write(bits(i)); i += 1 }
      vals.foreach(out.write)
    }
    dht(0, DcLumBits, DcLumVals)
    dht(1, AcLumBits, AcLumVals)
    marker(0xda) // SOS
    u16(6 + 2)
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al (baseline)
    val dcTab = buildEncodeTable(DcLumBits, DcLumVals)
    val acTab = buildEncodeTable(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Double](64)
    val q = new Array[Int](64)
    var pred = 0
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        var i = 0
        while (i < 64) {
          val sx = math.min(bx * 8 + i % 8, width - 1)
          val sy = math.min(by * 8 + i / 8, height - 1)
          block(i) = (pixels(sy * width + sx) & 0xff) - 128.0 // level shift
          i += 1
        }
        fdct(block, coef)
        i = 0
        while (i < 64) { q(i) = math.round(coef(i) / quant(i)).toInt; i += 1 }
        // DC: difference coding (F.1.2.1)
        val diff = q(0) - pred
        pred = q(0)
        val dcs = csize(diff)
        val (dcCode, dcLen) = dcTab(dcs)
        bw.put(dcCode, dcLen)
        if (dcs > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << dcs) - 1, dcs)
        // AC: run-length of zeros + magnitude (F.1.2.2)
        var kk = 1
        var run = 0
        while (kk < 64) {
          val v = q(ZigZag(kk))
          if (v == 0) run += 1
          else {
            while (run > 15) {
              val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16 // ZRL
            }
            val s = csize(v)
            val (c, l) = acTab((run << 4) | s)
            bw.put(c, l)
            bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
            run = 0
          }
          kk += 1
        }
        if (run > 0) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** AC Huffman table for the progressive encoder. The Annex K
    * baseline AC table lacks the EOBn symbols (0x10..0xE0) that
    * progressive EOB-run batching emits (G.1.2.2), so the twin
    * encoder declares its own COMPLETE table: all 256 AC symbols,
    * 255 at length 8 and the last at length 9 — Kraft-complete
    * (255/256 + 1/512 < 1) and the final 9-bit code is 111111110,
    * respecting Annex C's reserved all-1-bits prefix. Compression is
    * not the point of the twin; validity and coverage are.
    */
  private val ProgAcBits =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0)
  private val ProgAcVals = Array.tabulate(256)(identity)

  /** Encode row-major 8-bit grayscale pixels as a PROGRESSIVE (SOF2)
    * JFIF JPEG — the encoder twin for the progressive decode tier,
    * scoped to the three-scan script that exercises each Annex G
    * procedure family: scan 1 transmits DC at successive-
    * approximation Al=1 (diff-coded arithmetic-shifted values,
    * G.1.2.1), scan 2 the full 1..63 AC band at Al=0 with EOB-run
    * batching across blocks (G.1.2.2), scan 3 the DC refinement bit.
    * Coefficients are therefore delivered EXACTLY (DC split over two
    * passes reassembles bit-for-bit; AC in one full-precision band),
    * so for any input this encodes the same quantized spectrum as
    * [[encodeGray8]] — decoded pixels from the two encodings are
    * identical, which is what the cross-validation specs pin.
    */
  def encodeGray8Progressive(
      width: Int, height: Int, pixels: Array[Byte],
      quant: Array[Int] = AnnexKLumQuant): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad gray8 geometry ${width}x$height vs ${pixels.length}")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1,255]")
    // quantize every block up front (progressive revisits them per scan)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val qBlocks = new Array[Array[Int]](bw8 * bh8)
    val block = new Array[Double](64)
    val coef = new Array[Double](64)
    var bi = 0
    while (bi < qBlocks.length) {
      val bx = bi % bw8
      val by = bi / bw8
      var i = 0
      while (i < 64) {
        val sx = math.min(bx * 8 + i % 8, width - 1)
        val sy = math.min(by * 8 + i / 8, height - 1)
        block(i) = (pixels(sy * width + sx) & 0xff) - 128.0
        i += 1
      }
      fdct(block, coef)
      val q = new Array[Int](64)
      i = 0
      while (i < 64) { q(i) = math.round(coef(i) / quant(i)).toInt; i += 1 }
      qBlocks(bi) = q
      bi += 1
    }
    val out = new java.io.ByteArrayOutputStream(1024 + pixels.length / 2)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8)
    marker(0xe0)
    u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)
    out.write(0); u16(1); u16(1)
    out.write(0); out.write(0)
    marker(0xdb)
    u16(2 + 1 + 64)
    out.write(0x00)
    var k = 0
    while (k < 64) { out.write(quant(ZigZag(k))); k += 1 }
    marker(0xc2) // SOF2: progressive, 1 component, 1x1
    u16(8 + 3)
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(clazz: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      u16(2 + 1 + 16 + vals.length)
      out.write(clazz << 4)
      var i = 1
      while (i <= 16) { out.write(bits(i)); i += 1 }
      vals.foreach(out.write)
    }
    dht(0, DcLumBits, DcLumVals)
    dht(1, ProgAcBits, ProgAcVals)
    val dcTab = buildEncodeTable(DcLumBits, DcLumVals)
    val acTab = buildEncodeTable(ProgAcBits, ProgAcVals)
    def sos(ss: Int, se: Int, ahal: Int): Unit = {
      marker(0xda)
      u16(6 + 2)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write(ahal)
    }
    // ---- scan 1: DC first pass, Al = 1 ----
    sos(0, 0, 0x01)
    var bw = new BitWriter(out)
    var pred = 0
    bi = 0
    while (bi < qBlocks.length) {
      val v = qBlocks(bi)(0) >> 1 // DC point transform: arithmetic shift
      val diff = v - pred
      pred = v
      val s = csize(diff)
      val (c, l) = dcTab(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      bi += 1
    }
    bw.flush()
    // ---- scan 2: full AC band 1..63, Ah = Al = 0, EOB-run batched ----
    sos(1, 63, 0x00)
    bw = new BitWriter(out)
    var eobrun = 0
    def emitEobrun(): Unit = if (eobrun > 0) {
      var nb = 0
      var t = eobrun
      while ({ t >>= 1; t != 0 }) nb += 1
      val (c, l) = acTab(nb << 4)
      bw.put(c, l)
      if (nb > 0) bw.put(eobrun & ((1 << nb) - 1), nb)
      eobrun = 0
    }
    bi = 0
    while (bi < qBlocks.length) {
      val q = qBlocks(bi)
      var run = 0
      var emitted = false
      var kk = 1
      while (kk < 64) {
        val v = q(ZigZag(kk))
        if (v == 0) run += 1
        else {
          emitEobrun() // a pending EOB run must close before new coeffs
          while (run > 15) {
            val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16
          }
          val s = csize(v)
          val (c, l) = acTab((run << 4) | s)
          bw.put(c, l)
          bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
          run = 0
          emitted = true
        }
        kk += 1
      }
      if (run > 0 || !emitted) { // trailing zeros (or an all-zero band)
        eobrun += 1
        if (eobrun == 0x7fff) emitEobrun()
      }
      bi += 1
    }
    emitEobrun()
    bw.flush()
    // ---- scan 3: DC refinement, Ah = 1, Al = 0 ----
    sos(0, 0, 0x10)
    bw = new BitWriter(out)
    bi = 0
    while (bi < qBlocks.length) {
      bw.put(qBlocks(bi)(0) & 1, 1)
      bi += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  /** Canonical Huffman decode table per Annex F.2.2.3: for each code
    * length, the smallest/largest code and the index of its first
    * symbol.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker = false // hit a non-stuffing, non-RST marker
    /** Next bit, or -1 at end of entropy data. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) return -1
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { sawMarker = true; pos -= 1; return -1 }
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def reset(): Unit = { nbits = 0 }
    /** Consume an expected RSTn marker; false if absent. */
    def restart(): Boolean = {
      reset(); sawMarker = false
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xff) != 0xff) return false
      val m = bytes(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (t.maxCode(len) >= code && code >= t.minCode(len))
          return t.values(t.valPtr(len) + code - t.minCode(len))
      }
      -1
    }
    /** RECEIVE (F.2.2.4): `s` raw bits as an unsigned value, -1 at end. */
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** RECEIVE+EXTEND (F.2.2.1): read `s` magnitude bits. */
    def extend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0, var pred: Int = 0)

  /** Decode the luma plane of a baseline (SOF0) or progressive (SOF2)
    * JPEG. Supported: 8-bit, 1 or 3 components, sampling factors ≤ 2,
    * optional restart intervals; baseline's single interleaved scan or
    * progressive's full Annex G scan algebra. Anything else → None.
    * Never throws.
    */
  def decodeGray8(bytes: Array[Byte]): Option[Gray8] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(bytes: Array[Byte]): Option[Gray8] = {
    if (bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = Array.ofDim[Int](4, 64) // raster order after de-zigzag
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)

    // ---- marker segment walk up to SOS ----
    var sosAt = -1
    while (sosAt < 0) {
      // tolerate fill bytes (B.1.1.2): any number of 0xFF before a marker
      while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) return None
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val m = bytes(pos) & 0xff
      pos += 1
      m match {
        case 0xd9 => return None // EOI before any scan
        case 0xc0 => // SOF0 baseline
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length) return None
          val prec = bytes(pos + 2) & 0xff
          height = u16(pos + 3)
          width = u16(pos + 5)
          val nc = bytes(pos + 7) & 0xff
          if (prec != 8 || width == 0 || height == 0 ||
              (nc != 1 && nc != 3) || len < 8 + 3 * nc) return None
          if (width.toLong * height > 64L * 1024 * 1024) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf,
              bytes(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
              c.tq > 3)) return None
          pos += len
        case 0xc2 => // SOF2 progressive: dedicated multi-scan decoder
          return decodeProgressiveImpl(bytes)
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // extended/lossless/arithmetic SOF: documented boundary
        case 0xdb => // DQT
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            if (tq > 3 || pq > 1) return None
            val step = if (pq == 0) 1 else 2
            if (o + 1 + 64 * step > pos + len) return None
            var kk = 0
            while (kk < 64) {
              val v =
                if (pq == 0) bytes(o + 1 + kk) & 0xff
                else u16(o + 1 + 2 * kk)
              if (v == 0) return None
              quant(tq)(ZigZag(kk)) = v
              kk += 1
            }
            quantSeen(tq) = true
            o += 1 + 64 * step
          }
          pos += len
        case 0xc4 => // DHT
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            if (tc > 1 || th > 3 || o + 17 > pos + len) return None
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1
            }
            if (total > 256 || o + 17 + total > pos + len) return None
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = bytes(o + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + total
          }
          pos += len
        case 0xdd => // DRI
          if (pos + 4 > bytes.length) return None
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length || comps == null) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns != comps.length || len != 6 + 2 * ns) return None
          var i = 0
          while (i < ns) {
            val cs = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            // Td/Ta ≤ 3 (B.2.3) — validate against the 4-slot table
            // arrays instead of leaning on the NonFatal net
            if (((tt >> 4) & 0xf) > 3 || (tt & 0xf) > 3) return None
            c.dcTab = (tt >> 4) & 0xf
            c.acTab = tt & 0xf
            i += 1
          }
          sosAt = pos + len
        case mm if mm >= 0xe0 && mm <= 0xef => // APPn
          if (pos + 2 > bytes.length) return None
          pos += u16(pos)
        case 0xfe => // COM
          if (pos + 2 > bytes.length) return None
          pos += u16(pos)
        case 0x01 => () // TEM, standalone
        case mm if mm >= 0xd0 && mm <= 0xd7 => () // stray RST, standalone
        case _ =>
          if (pos + 2 > bytes.length) return None
          pos += u16(pos) // unknown segment with length: skip
      }
    }

    // ---- entropy-coded scan ----
    if (comps.exists(c => !quantSeen(c.tq) || dcTables(c.dcTab) == null ||
        acTables(c.acTab) == null)) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val luma = comps(0)
    // the luma crop below assumes component 0 carries the max sampling
    // factors (true of every real encoder; subsampled-luma files would
    // garble the crop, so refuse them instead)
    if (luma.h != hMax || luma.v != vMax) return None
    // luma plane buffer at its natural (full) resolution incl. MCU pad
    val lw = mcusX * luma.h * 8
    val lpix = new Array[Byte](lw * mcusY * luma.v * 8)
    val br = new BitReader(bytes, sosAt)
    val coefQ = new Array[Int](64)
    val coefD = new Array[Double](64)
    val pixD = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcT = dcTables(c.dcTab)
        val acT = acTables(c.acTab)
        val qt = quant(c.tq)
        var b = 0
        while (b < c.h * c.v) {
          // decode one block's coefficients (F.2.2)
          java.util.Arrays.fill(coefQ, 0)
          val s = br.decodeHuff(dcT)
          if (s < 0 || s > 11) return None
          val diff = br.extend(s)
          if (diff == Int.MinValue) return None
          c.pred += diff
          coefQ(0) = c.pred
          var kk = 1
          while (kk < 64) {
            val rs = br.decodeHuff(acT)
            if (rs < 0) return None
            val r = rs >> 4
            val ss = rs & 0xf
            if (ss == 0) {
              if (r == 15) kk += 16 // ZRL
              else kk = 64          // EOB
            } else {
              kk += r
              if (kk > 63) return None
              val v = br.extend(ss)
              if (v == Int.MinValue) return None
              coefQ(ZigZag(kk)) = v
              kk += 1
            }
          }
          if (ci == 0) { // IDCT only the luma blocks
            var i = 0
            while (i < 64) { coefD(i) = coefQ(i).toDouble * qt(i); i += 1 }
            idct(coefD, pixD)
            val bx0 = (mx * luma.h + b % luma.h) * 8
            val by0 = (my * luma.v + b / luma.h) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(pixD(yy * 8 + xx) + 128.0).toInt
                lpix((by0 + yy) * lw + bx0 + xx) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
          }
          b += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // crop the MCU padding
    val outPix = new Array[Byte](width * height)
    var yy = 0
    while (yy < height) {
      System.arraycopy(lpix, yy * lw, outPix, yy * width, width)
      yy += 1
    }
    Some(Gray8(width, height, outPix))
  }

  // ------------------------------------------------------------------
  // Progressive decode (SOF2, ISO/IEC 10918-1 Annex G)
  // ------------------------------------------------------------------

  /** Decode a progressive (SOF2) JPEG's luma plane. Unlike baseline's
    * single streaming scan, progressive transmits each component's
    * coefficients over MULTIPLE scans — spectral selection (Ss..Se
    * bands) times successive approximation (first pass at Al, then
    * one-bit refinements) — so every component's coefficients are
    * held in full until EOI, then dequantized + IDCT'd once (luma
    * only, as in the baseline path). The scan procedures follow
    * G.2 / F.2.2: DC first = diff-coded values shifted by Al; DC
    * refine = one appended bit per block; AC first = run-length with
    * EOB-run batching across blocks (G.1.2.2); AC refine =
    * correction bits on nonzero history plus newly significant ±2^Al
    * insertions, EOB runs carrying correction bits to the band end.
    * Component dimension rules per A.2: interleaved (multi-component)
    * scans cover the padded MCU grid; single-component scans cover
    * exactly that component's ceil(dim/8) block grid.
    *
    * The marker walk here deliberately duplicates the baseline
    * walk's DQT/DHT/DRI parsing rather than sharing it: progressive
    * must KEEP walking after every scan (tables may be redefined
    * between scans), and keeping baseline's hot path untouched is
    * worth ~70 duplicated lines of table parsing.
    */
  private def decodeProgressiveImpl(bytes: Array[Byte]): Option[Gray8] = {
    if (bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = Array.ofDim[Int](4, 64)
    val quantSeen = new Array[Boolean](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var coefs: Array[Array[Int]] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    var eobrun = 0

    def u16(at: Int): Int = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    def sbw(c: Component): Int = mcusX * c.h // plane stride in blocks
    def cbw(c: Component): Int = // non-interleaved block cols (A.2.2)
      (((width * c.h + hMax - 1) / hMax) + 7) / 8
    def cbh(c: Component): Int =
      (((height * c.v + vMax - 1) / vMax) + 7) / 8

    // ---- per-datum procedures (G.2) ----
    def dcUnit(c: Component, plane: Array[Int], off: Int,
        ah: Int, al: Int, br: BitReader): Boolean = {
      if (ah == 0) { // first pass: diff-coded, scaled by 2^Al
        val t = dcTables(c.dcTab)
        if (t == null) return false
        val s = br.decodeHuff(t)
        if (s < 0 || s > 11) return false
        val diff = br.extend(s)
        if (diff == Int.MinValue) return false
        c.pred += diff
        plane(off) = c.pred << al
      } else { // refinement: one appended bit
        val b = br.bit()
        if (b < 0) return false
        if (b == 1) plane(off) |= (1 << al)
      }
      true
    }

    def acFirst(plane: Array[Int], off: Int, ss: Int, se: Int, al: Int,
        br: BitReader, acT: HuffTable): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = br.decodeHuff(acT)
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r < 15) { // EOBn: this block ends; r extra bits extend the run
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = br.receive(r)
              if (eb < 0) return false
              eobrun += eb
            }
            return true
          }
          k += 16 // ZRL
        } else {
          k += r
          if (k > se) return false
          val v = br.extend(s)
          if (v == Int.MinValue) return false
          plane(off + ZigZag(k)) = v << al
          k += 1
        }
      }
      true
    }

    def acRefine(plane: Array[Int], off: Int, ss: Int, se: Int, al: Int,
        br: BitReader, acT: HuffTable): Boolean = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(z: Int): Boolean = {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1 && (plane(z) & p1) == 0)
          plane(z) += (if (plane(z) >= 0) p1 else m1)
        true
      }
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = br.decodeHuff(acT)
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) { // EOB run starts HERE: k is not advanced
              eobrun = 1 << r
              if (r > 0) {
                val eb = br.receive(r)
                if (eb < 0) return false
                eobrun += eb
              }
              atEob = true
            }
            // r == 15: pass over 16 zero-HISTORY coefficients
          } else {
            if (s != 1) return false // refinements carry single bits only
            val b = br.bit()
            if (b < 0) return false
            newval = if (b == 1) p1 else m1
          }
          if (!atEob) {
            // advance over the band: correction bits on nonzero history,
            // r zero-history skips, then place the new coefficient
            var placed = false
            while (k <= se && !placed) {
              val z = off + ZigZag(k)
              if (plane(z) != 0) {
                if (!correct(z)) return false
              } else if (r == 0) {
                if (newval != 0) plane(z) = newval
                placed = true
              } else r -= 1
              k += 1
            }
            if (!placed && newval != 0) return false // band overrun
          }
        }
        if (atEob) {
          // the EOB-starting block still carries correction bits to Se
          while (k <= se) {
            val z = off + ZigZag(k)
            if (plane(z) != 0 && !correct(z)) return false
            k += 1
          }
          eobrun -= 1
        }
      } else {
        while (k <= se) {
          val z = off + ZigZag(k)
          if (plane(z) != 0 && !correct(z)) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    // ---- one scan's entropy-coded data ----
    def decodeScan(scanIdx: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
        br: BitReader): Boolean = {
      comps.foreach(_.pred = 0)
      eobrun = 0
      if (scanIdx.length > 1) { // interleaved: DC scans only (G.1.1.1)
        if (ss != 0 || se != 0) return false
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!br.restart()) return false
            comps.foreach(_.pred = 0)
            eobrun = 0
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < scanIdx.length) {
            val c = comps(scanIdx(ci))
            val plane = coefs(scanIdx(ci))
            var b = 0
            while (b < c.h * c.v) {
              val bx = mx * c.h + b % c.h
              val by = my * c.v + b / c.h
              if (!dcUnit(c, plane, (by * sbw(c) + bx) * 64, ah, al, br))
                return false
              b += 1
            }
            ci += 1
          }
          mcu += 1
        }
      } else { // non-interleaved: the component's own block grid
        val c = comps(scanIdx(0))
        val plane = coefs(scanIdx(0))
        val bw = cbw(c)
        val n = bw * cbh(c)
        val isDc = ss == 0
        if (isDc && se != 0) return false
        if (!isDc && (ss < 1 || se < ss || se > 63)) return false
        val acT = if (isDc) null else acTables(c.acTab)
        if (!isDc && acT == null) return false
        var i = 0
        while (i < n) {
          if (restartInterval > 0 && i > 0 && i % restartInterval == 0) {
            if (!br.restart()) return false
            c.pred = 0
            eobrun = 0
          }
          val off = ((i / bw) * sbw(c) + (i % bw)) * 64
          val ok =
            if (isDc) dcUnit(c, plane, off, ah, al, br)
            else if (ah == 0) acFirst(plane, off, ss, se, al, br, acT)
            else acRefine(plane, off, ss, se, al, br, acT)
          if (!ok) return false
          i += 1
        }
      }
      true
    }

    // ---- marker walk across ALL scans up to EOI ----
    while (true) {
      while (pos < bytes.length && (bytes(pos) & 0xff) != 0xff) return None
      while (pos < bytes.length && (bytes(pos) & 0xff) == 0xff) pos += 1
      if (pos >= bytes.length) return None
      val m = bytes(pos) & 0xff
      pos += 1
      m match {
        case 0xd9 => // EOI: dequant + IDCT the luma plane
          if (coefs == null) return None
          val luma = comps(0)
          if (luma.h != hMax || luma.v != vMax) return None
          if (!quantSeen(luma.tq)) return None
          val qt = quant(luma.tq)
          val plane = coefs(0)
          val bw = cbw(luma)
          val bh = cbh(luma)
          val lw = bw * 8
          val lpix = new Array[Byte](lw * bh * 8)
          val coefD = new Array[Double](64)
          val pixD = new Array[Double](64)
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              val off = (by * sbw(luma) + bx) * 64
              var i = 0
              while (i < 64) { coefD(i) = plane(off + i).toDouble * qt(i); i += 1 }
              idct(coefD, pixD)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val v = math.round(pixD(yy * 8 + xx) + 128.0).toInt
                  lpix((by * 8 + yy) * lw + bx * 8 + xx) =
                    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          val outPix = new Array[Byte](width * height)
          var yy = 0
          while (yy < height) {
            System.arraycopy(lpix, yy * lw, outPix, yy * width, width)
            yy += 1
          }
          return Some(Gray8(width, height, outPix))
        case 0xc2 => // SOF2
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length || comps != null) return None
          val prec = bytes(pos + 2) & 0xff
          height = u16(pos + 3)
          width = u16(pos + 5)
          val nc = bytes(pos + 7) & 0xff
          if (prec != 8 || width == 0 || height == 0 ||
              (nc != 1 && nc != 3) || len < 8 + 3 * nc) return None
          // full-image coefficient storage: cap tighter than baseline's
          // streaming path (16 MP ≈ 96 MB of planes at 4:2:0)
          if (width.toLong * height > 16L * 1024 * 1024) return None
          comps = Array.tabulate(nc) { i =>
            val o = pos + 8 + 3 * i
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, (hv >> 4) & 0xf, hv & 0xf,
              bytes(o + 2) & 0xff)
          }
          if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
              c.tq > 3)) return None
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          coefs = comps.map(c => new Array[Int](sbw(c) * mcusY * c.v * 64))
          pos += len
        case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None
        case 0xdb => // DQT (tables may also arrive between scans)
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val pq = (bytes(o) & 0xff) >> 4
            val tq = bytes(o) & 0x0f
            if (tq > 3 || pq > 1) return None
            val step = if (pq == 0) 1 else 2
            if (o + 1 + 64 * step > pos + len) return None
            var kk = 0
            while (kk < 64) {
              val v =
                if (pq == 0) bytes(o + 1 + kk) & 0xff
                else u16(o + 1 + 2 * kk)
              if (v == 0) return None
              quant(tq)(ZigZag(kk)) = v
              kk += 1
            }
            quantSeen(tq) = true
            o += 1 + 64 * step
          }
          pos += len
        case 0xc4 => // DHT
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length) return None
          var o = pos + 2
          while (o < pos + len) {
            val tc = (bytes(o) & 0xff) >> 4
            val th = bytes(o) & 0x0f
            if (tc > 1 || th > 3 || o + 17 > pos + len) return None
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1
            }
            if (total > 256 || o + 17 + total > pos + len) return None
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = bytes(o + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + total
          }
          pos += len
        case 0xdd => // DRI
          if (pos + 4 > bytes.length) return None
          restartInterval = u16(pos + 2)
          pos += u16(pos)
        case 0xda => // SOS: one scan of the progression
          if (pos + 2 > bytes.length) return None
          val len = u16(pos)
          if (pos + len > bytes.length || comps == null) return None
          val ns = bytes(pos + 2) & 0xff
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scanIdx = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = bytes(pos + 3 + 2 * i) & 0xff
            val tt = bytes(pos + 4 + 2 * i) & 0xff
            val gi = comps.indexWhere(_.id == cs)
            if (gi < 0) return None
            // baseline caps table selectors at 3 (B.2.3: Td/Ta ≤ 3 for
            // the 4-slot table arrays) — reject here like al/ah below so
            // "never throws" is validation, not the NonFatal net
            if (((tt >> 4) & 0xf) > 3 || (tt & 0xf) > 3) return None
            comps(gi).dcTab = (tt >> 4) & 0xf
            comps(gi).acTab = tt & 0xf
            scanIdx(i) = gi
            i += 1
          }
          val ss = bytes(pos + 3 + 2 * ns) & 0xff
          val se = bytes(pos + 4 + 2 * ns) & 0xff
          val ahal = bytes(pos + 5 + 2 * ns) & 0xff
          val ah = (ahal >> 4) & 0xf
          val al = ahal & 0xf
          if (al > 13 || ah > 13) return None
          // DC-first scans need their Huffman tables up front
          if (ss == 0 && ah == 0 &&
              scanIdx.exists(gi => dcTables(comps(gi).dcTab) == null))
            return None
          val br = new BitReader(bytes, pos + len)
          if (!decodeScan(scanIdx, ss, se, ah, al, br)) return None
          br.reset()
          pos = br.pos // the next 0xFF marker (or padding) starts here
        case mm if mm >= 0xe0 && mm <= 0xef =>
          if (pos + 2 > bytes.length) return None
          pos += u16(pos)
        case 0xfe =>
          if (pos + 2 > bytes.length) return None
          pos += u16(pos)
        case 0x01 => ()
        case mm if mm >= 0xd0 && mm <= 0xd7 => ()
        case _ =>
          if (pos + 2 > bytes.length) return None
          pos += u16(pos)
      }
    }
    None // unreachable
  }
}
