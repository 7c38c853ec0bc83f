package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** ISO BMFF (MP4) mux/demux validation. The JDK has no MP4 parser to
  * cross-check against (unlike PNG/JPEG's ImageIO), so the protocol
  * is the [[graft.sources.pdf.PdfCrypt]] fixture discipline instead:
  * the tests verify the MUXER's bytes against hand-computed ISO/IEC
  * 14496-12 field offsets (reading the file with raw arithmetic, not
  * the demuxer), verify the DEMUXER on hand-built files with layouts
  * the muxer never emits (multi-chunk stsc runs, co64, largesize
  * boxes), and only then close the loop with roundtrips + per-frame
  * [[JpegCodec]] pixel equality. No Spark session needed.
  */
class Mp4CodecSpec extends AnyFunSuite {

  // -- tiny independent box-writing helpers (the test's own, NOT the
  //    muxer's: demuxer inputs below must not come from the code
  //    under test) --
  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def rawBox(fourcc: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fourcc.getBytes("US-ASCII") ++ payload
  private def fullPayload(version: Int, flags: Int, body: Array[Byte]): Array[Byte] =
    Array(version.toByte, ((flags >> 16) & 0xff).toByte,
      ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte) ++ body

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def constFrame(w: Int, h: Int, v: Int): Array[Byte] = {
    val px = Array.fill((w * h))(v.toByte)
    JpegCodec.encodeGray8(w, h, px, JpegCodec.flatQuant(8))
  }

  test("mux: hand-computed ISO 14496-12 field offsets (no demuxer involved)") {
    val frames = Array(constFrame(16, 8, 100), constFrame(16, 8, 200))
    val durs = Array(25, 24)
    val bytes = Mp4Codec.muxMjpeg(16, 8, 600, durs, frames)

    // ftyp first: size at 0, fourcc at 4, major brand "isom" at 8.
    val ftypSize = u32(bytes, 0)
    assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
    assert(new String(bytes, 8, 4, "US-ASCII") == "isom")
    // mdat second: its payload is the two frames back-to-back.
    val mdatOff = ftypSize.toInt
    assert(new String(bytes, mdatOff + 4, 4, "US-ASCII") == "mdat")
    assert(u32(bytes, mdatOff) == 8L + frames(0).length + frames(1).length)
    val f0 = java.util.Arrays.copyOfRange(bytes, mdatOff + 8,
      mdatOff + 8 + frames(0).length)
    assert(f0.sameElements(frames(0)))
    // moov last and flush to EOF.
    val moovOff = mdatOff + u32(bytes, mdatOff).toInt
    assert(new String(bytes, moovOff + 4, 4, "US-ASCII") == "moov")
    assert(moovOff + u32(bytes, moovOff) == bytes.length)
    // mvhd is moov's first child (§8.2.2: full box, v0 ⇒ timescale at
    // payload+12, duration at payload+16).
    val mvhdOff = moovOff + 8
    assert(new String(bytes, mvhdOff + 4, 4, "US-ASCII") == "mvhd")
    val mvhdPay = mvhdOff + 8
    assert(u32(bytes, mvhdPay + 12) == 600L)
    assert(u32(bytes, mvhdPay + 16) == 49L) // 25 + 24 ticks
    // tkhd: v0 ⇒ width/height as 16.16 fixed point at payload+76/+80.
    val trakOff = mvhdOff + u32(bytes, mvhdOff).toInt
    assert(new String(bytes, trakOff + 4, 4, "US-ASCII") == "trak")
    val tkhdOff = trakOff + 8
    assert(new String(bytes, tkhdOff + 4, 4, "US-ASCII") == "tkhd")
    assert(u32(bytes, tkhdOff + 8 + 76) == (16L << 16))
    assert(u32(bytes, tkhdOff + 8 + 80) == (8L << 16))
  }

  test("mux → demux roundtrip recovers container metadata and exact frames") {
    for {
      (wb, hb) <- Seq((1, 1), (3, 2), (4, 3))
      nf <- Seq(1, 4, 5)
    } {
      val w = wb * 8; val h = hb * 8
      val frames = Array.tabulate(nf)(f => constFrame(w, h, (37 * f + 11) % 256))
      val durs = Array.tabulate(nf)(f => 24 + f % 2)
      val bytes = Mp4Codec.muxMjpeg(w, h, 600, durs, frames)
      val meta = Mp4Codec.demux(bytes).getOrElse(fail(s"demux failed wb=$wb nf=$nf"))
      assert(meta.timescale == 600 && meta.durationTicks == durs.map(_.toLong).sum)
      assert(meta.width == w && meta.height == h && meta.format == "jpeg")
      assert(meta.samples.size == nf)
      for ((s, f) <- meta.samples.zipWithIndex) {
        assert(s.durationTicks == durs(f))
        val fb = java.util.Arrays.copyOfRange(bytes, s.offset.toInt,
          (s.offset + s.size).toInt)
        assert(fb.sameElements(frames(f)), s"frame $f bytes differ")
        val img = JpegCodec.decodeGray8(fb).getOrElse(fail(s"frame $f undecodable"))
        assert(img.pixels.forall(p => (p & 0xff) == ((37 * f + 11) % 256)),
          s"frame $f pixels differ")
      }
    }
  }

  test("demux: multi-chunk stsc runs + co64 (layouts the muxer never emits)") {
    // 5 samples of sizes 10,11,12,13,14 split as chunks [2,2,1] — an
    // stsc with runs (first=1,per=2),(first=3,per=1) — addressed via
    // co64. Sample bytes live in a leading 'free' box payload.
    val sizes = Array(10, 11, 12, 13, 14)
    val payload = Array.tabulate(sizes.sum)(i => (i % 251).toByte)
    val free = rawBox("free", payload)
    val base = 8L // payload starts after the free box header
    val chunkOffs = Array(base, base + 21, base + 46) // 10+11, +12+13
    val mvhd = rawBox("mvhd", fullPayload(0, 0,
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(125) ++
        Array.fill(80)(0.toByte)))
    val tkhd = rawBox("tkhd", fullPayload(0, 3,
      // 72 field bytes before width/height (so they land at payload
      // offsets 76/80, §8.3.2 v0)
      Array.fill(72)(0.toByte) ++ be32(24L << 16) ++ be32(16L << 16)))
    val stsd = rawBox("stsd", fullPayload(0, 0,
      be32(1) ++ rawBox("jpeg", Array.fill(78)(0.toByte))))
    val stts = rawBox("stts", fullPayload(0, 0,
      be32(1) ++ be32(5) ++ be32(25)))
    val stsc = rawBox("stsc", fullPayload(0, 0,
      be32(2) ++
        be32(1) ++ be32(2) ++ be32(1) ++ // chunks 1-2: 2 samples each
        be32(3) ++ be32(1) ++ be32(1))) // chunk 3: 1 sample
    val stsz = rawBox("stsz", fullPayload(0, 0,
      be32(0) ++ be32(5) ++ sizes.flatMap(s => be32(s.toLong))))
    val co64 = rawBox("co64", fullPayload(0, 0,
      be32(3) ++ chunkOffs.flatMap(be64)))
    val stbl = rawBox("stbl", stsd ++ stts ++ stsc ++ stsz ++ co64)
    val minf = rawBox("minf", stbl)
    val mdia = rawBox("mdia", minf)
    val trak = rawBox("trak", tkhd ++ mdia)
    val moov = rawBox("moov", mvhd ++ trak)
    val file = free ++ moov

    val meta = Mp4Codec.demux(file).getOrElse(fail("demux failed"))
    assert(meta.timescale == 1000 && meta.durationTicks == 125)
    assert(meta.width == 24 && meta.height == 16)
    assert(meta.samples.map(_.size) == sizes.map(_.toLong).toVector)
    assert(meta.samples.map(_.offset) ==
      Vector(8L, 18L, 29L, 41L, 54L)) // chunk starts + intra-chunk packing
    assert(meta.samples.forall(_.durationTicks == 25))
  }

  test("demux: top-level largesize (size == 1) box is walked correctly") {
    val frames = Array(constFrame(8, 8, 42))
    val bytes = Mp4Codec.muxMjpeg(8, 8, 600, Array(24), frames)
    // Rewrite the trailing moov to the 64-bit largesize encoding —
    // moov is last, so no stco offset shifts.
    val moovOff = {
      var o = 0
      while (new String(bytes, o + 4, 4, "US-ASCII") != "moov")
        o += u32(bytes, o).toInt
      o
    }
    val moovPayload = java.util.Arrays.copyOfRange(bytes, moovOff + 8, bytes.length)
    val rewritten = java.util.Arrays.copyOfRange(bytes, 0, moovOff) ++
      be32(1) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moovPayload.length) ++ moovPayload
    val meta = Mp4Codec.demux(rewritten).getOrElse(fail("largesize demux failed"))
    assert(meta.samples.size == 1 && meta.width == 8)
    val s = meta.samples.head
    val fb = java.util.Arrays.copyOfRange(rewritten, s.offset.toInt,
      (s.offset + s.size).toInt)
    assert(JpegCodec.decodeGray8(fb).exists(_.pixels.forall(p => (p & 0xff) == 42)))
  }

  test("demux contract: None, never a throw, on corrupt input") {
    val good = Mp4Codec.muxMjpeg(16, 16, 600, Array(24, 25),
      Array(constFrame(16, 16, 1), constFrame(16, 16, 2)))
    // every truncation point (steps of 7 keeps it fast)
    var n = 0
    while (n < good.length) {
      assert(Mp4Codec.demux(java.util.Arrays.copyOf(good, n)).isEmpty ||
        n == good.length, s"truncation at $n should not yield metadata")
      n += 7
    }
    // single-byte corruptions across the moov region must not throw
    val moovOff = good.length - 200
    for (i <- moovOff until good.length) {
      val c = good.clone()
      c(i) = (c(i) ^ 0xa5).toByte
      Mp4Codec.demux(c) // Option either way; must not throw
    }
    // crafted 32-bit size near Int.MaxValue must not wrap the walk
    val crafted = be32(0x7ffffff0L) ++ "moov".getBytes("US-ASCII") ++
      Array.fill(16)(0.toByte)
    assert(Mp4Codec.demux(crafted).isEmpty)
    // random garbage
    val rnd = new java.util.Random(7)
    val junk = new Array[Byte](512)
    rnd.nextBytes(junk)
    assert(Mp4Codec.demux(junk).isEmpty)
    // crafted co64 offset near Long.MaxValue: `offset + size` would
    // wrap negative and sneak past a naive `<= n` range check — the
    // demuxer must reject the sample table, not return wild ranges
    val sizes64 = Array(16)
    val stsd = rawBox("stsd", fullPayload(0, 0,
      be32(1) ++ rawBox("jpeg", Array.fill(78)(0.toByte))))
    val stts = rawBox("stts", fullPayload(0, 0, be32(1) ++ be32(1) ++ be32(25)))
    val stsc = rawBox("stsc", fullPayload(0, 0,
      be32(1) ++ be32(1) ++ be32(1) ++ be32(1)))
    val stsz = rawBox("stsz", fullPayload(0, 0,
      be32(0) ++ be32(1) ++ sizes64.flatMap(s => be32(s.toLong))))
    val co64 = rawBox("co64", fullPayload(0, 0,
      be32(1) ++ be64(0x7ffffffffffffff0L)))
    val stbl = rawBox("stbl", stsd ++ stts ++ stsc ++ stsz ++ co64)
    val mvhd = rawBox("mvhd", fullPayload(0, 0,
      be32(0) ++ be32(0) ++ be32(1000) ++ be32(25) ++ Array.fill(80)(0.toByte)))
    val tkhd = rawBox("tkhd", fullPayload(0, 3,
      Array.fill(72)(0.toByte) ++ be32(8L << 16) ++ be32(8L << 16)))
    val moov = rawBox("moov", mvhd ++
      rawBox("trak", tkhd ++ rawBox("mdia", rawBox("minf", stbl))))
    assert(Mp4Codec.demux(moov).isEmpty, "overflowing sample range accepted")
  }
}
