package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO Base Media File Format (MP4) muxer + demuxer
  * (ISO/IEC 14496-12) for Motion-JPEG video tracks — the container
  * move that retires the VIDEO tier of the multimodal decode stub the
  * same way [[PngCodec]] (round 7) and [[JpegCodec]] (round 8)
  * retired the image tiers: everything here derives from the public
  * spec's box layouts, no codec jars. Compressed inter-frame codecs
  * (H.264/HEVC/VP9) stay the documented boundary; Motion-JPEG is the
  * one real video coding the pure-JVM [[JpegCodec]] can decode
  * frame-exactly, and the container walk below is codec-agnostic.
  *
  * Scope:
  *  - '''mux''': a single-video-track progressive-download file:
  *    `ftyp` + `mdat` (concatenated JPEG sample bytes) + `moov` with
  *    the full sample-table machinery (`stsd` 'jpeg' VisualSampleEntry,
  *    `stts` run-length sample durations, `stsc`/`stsz`/`stco` chunk
  *    maps). Box layouts follow ISO/IEC 14496-12 §8 (mvhd §8.2.2,
  *    tkhd §8.3.2, mdhd §8.4.2, hdlr §8.4.3, vmhd §8.4.5.2,
  *    dref §8.7.2, stsd §8.5.2, stts §8.6.1.2, stsc §8.7.4,
  *    stsz §8.7.3, stco §8.7.5).
  *  - '''demux''': a general box-tree walk (32-bit and 64-bit
  *    `largesize` boxes, `size == 0` → to-EOF) that recovers the
  *    movie timescale/duration, track dimensions, sample format
  *    fourcc, per-sample durations from `stts` runs, and absolute
  *    per-sample byte ranges via the full `stsc` chunk-run ×
  *    `stco`/`co64` walk — deliberately MORE general than the muxer
  *    emits (multi-chunk maps, co64, out-of-order boxes), so the
  *    demuxer is a spec twin, not an inverse of our own writer
  *    (the [[graft.sources.pdf.PdfCrypt]] fixture discipline).
  *
  * Decode contract matches the codec tier: `None`, never a throw,
  * for anything structurally corrupt, truncated, or outside the
  * supported subset. All offset arithmetic is done in Long to make
  * crafted 32-bit sizes harmless (the [[PngCodec]] overflow lesson).
  */
object Mp4Codec {

  /** One sample (frame): absolute byte range in the file plus its
    * duration in media-timescale ticks.
    */
  final case class Sample(offset: Long, size: Long, durationTicks: Long)

  /** Demuxed single-video-track metadata. `format` is the stsd
    * sample-entry fourcc (e.g. "jpeg"); `width`/`height` are the
    * tkhd fixed-point dims truncated to pixels.
    */
  final case class Mp4Meta(
      timescale: Long,
      durationTicks: Long,
      width: Int,
      height: Int,
      format: String,
      samples: Vector[Sample])

  // ------------------------------------------------------------------
  // Muxer
  // ------------------------------------------------------------------

  private def be(buf: java.io.ByteArrayOutputStream, v: Int): Unit = {
    buf.write((v >>> 24) & 0xff); buf.write((v >>> 16) & 0xff)
    buf.write((v >>> 8) & 0xff); buf.write(v & 0xff)
  }

  /** A box is (fourcc, payload); children concatenate into payload. */
  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    be(out, payload.length + 8)
    out.write(fourcc.getBytes("US-ASCII"), 0, 4)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def fullBox(fourcc: String, version: Int, flags: Int,
      payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 12)
    out.write((version & 0xff)); out.write((flags >>> 16) & 0xff)
    out.write((flags >>> 8) & 0xff); out.write(flags & 0xff)
    out.write(payload, 0, payload.length)
    box(fourcc, out.toByteArray)
  }

  private def bytesOf(f: (ByteBuffer) => Unit, n: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)
    f(b)
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  /** Identity transform matrix (§6.2.2): fixed-point 16.16 / 2.30. */
  private val IdentityMatrix: Array[Int] =
    Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

  /** Mux `frames` (already-encoded JPEG bytes) into a single-track
    * MJPEG MP4. `frameDurations(i)` is frame i's duration in
    * `timescale` ticks. Layout is `ftyp mdat moov` (mdat first so
    * the single chunk offset is knowable without a second pass).
    */
  def muxMjpeg(width: Int, height: Int, timescale: Int,
      frameDurations: Array[Int], frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty && frames.length == frameDurations.length,
      "one duration per frame")
    // tkhd stores width/height as signed 16.16 fixed point and the
    // VisualSampleEntry as uint16 — 32768+ would overflow `w << 16`
    // negative and truncate in toShort, emitting a silently corrupt file
    require(width > 0 && width < 0x8000 && height > 0 && height < 0x8000,
      s"dimensions ${width}x$height out of 16.16/uint16 range")
    require(timescale > 0, s"bad timescale $timescale")
    val ftyp = box("ftyp", bytesOf({ b =>
      b.put("isom".getBytes("US-ASCII")); b.putInt(0x200)
      b.put("isom".getBytes("US-ASCII")); b.put("iso2".getBytes("US-ASCII"))
    }, 16))
    val mdatPayloadLen = frames.map(_.length.toLong).sum
    require(mdatPayloadLen <= Int.MaxValue - 16, "mdat too large for 32-bit box")
    val mdat = {
      val out = new java.io.ByteArrayOutputStream(mdatPayloadLen.toInt + 8)
      be(out, mdatPayloadLen.toInt + 8)
      out.write("mdat".getBytes("US-ASCII"), 0, 4)
      frames.foreach(f => out.write(f, 0, f.length))
      out.toByteArray
    }
    val chunkOffset = ftyp.length + 8 // first sample byte (after mdat header)
    val durTicks = frameDurations.map(_.toLong).sum
    require(durTicks <= Int.MaxValue, "duration overflows v0 boxes")

    val mvhd = fullBox("mvhd", 0, 0, bytesOf({ b =>
      b.putInt(0); b.putInt(0)              // creation/modification (epoch 1904; deterministic 0)
      b.putInt(timescale); b.putInt(durTicks.toInt)
      b.putInt(0x10000); b.putShort(0x100.toShort); b.putShort(0) // rate 1.0, volume 1.0
      b.putInt(0); b.putInt(0)              // reserved
      IdentityMatrix.foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)                           // next_track_ID
    }, 96))
    val tkhd = fullBox("tkhd", 0, 3, bytesOf({ b => // flags: enabled | in_movie
      b.putInt(0); b.putInt(0); b.putInt(1) // track_ID 1
      b.putInt(0); b.putInt(durTicks.toInt)
      b.putInt(0); b.putInt(0)              // reserved
      b.putShort(0); b.putShort(0); b.putShort(0); b.putShort(0) // layer, group, volume, reserved
      IdentityMatrix.foreach(b.putInt)
      b.putInt(width << 16); b.putInt(height << 16) // fixed-point 16.16
    }, 80))
    val mdhd = fullBox("mdhd", 0, 0, bytesOf({ b =>
      b.putInt(0); b.putInt(0)
      b.putInt(timescale); b.putInt(durTicks.toInt)
      b.putShort(0x55c4.toShort)            // packed ISO-639 "und"
      b.putShort(0)
    }, 20))
    val hdlr = fullBox("hdlr", 0, 0, bytesOf({ b =>
      b.putInt(0); b.put("vide".getBytes("US-ASCII"))
      (0 until 3).foreach(_ => b.putInt(0))
      b.put("VideoHandler".getBytes("US-ASCII")); b.put(0.toByte)
    }, 33))
    val vmhd = fullBox("vmhd", 0, 1, bytesOf({ b =>
      b.putShort(0); (0 until 3).foreach(_ => b.putShort(0)) // graphicsmode copy, opcolor
    }, 8))
    val dref = fullBox("dref", 0, 0, {
      val url = fullBox("url ", 0, 1, Array.emptyByteArray) // self-contained
      val out = new java.io.ByteArrayOutputStream()
      be(out, 1); out.write(url, 0, url.length)
      out.toByteArray
    })
    val dinf = box("dinf", dref)
    // VisualSampleEntry (§12.1.3): 78-byte fixed layout, fourcc 'jpeg'.
    val sampleEntry = box("jpeg", bytesOf({ b =>
      (0 until 6).foreach(_ => b.put(0.toByte)) // reserved
      b.putShort(1)                             // data_reference_index
      b.putShort(0); b.putShort(0)              // pre_defined, reserved
      (0 until 3).foreach(_ => b.putInt(0))     // pre_defined
      b.putShort(width.toShort); b.putShort(height.toShort)
      b.putInt(0x480000); b.putInt(0x480000)    // 72 dpi
      b.putInt(0)                               // reserved
      b.putShort(1)                             // frame_count
      b.put(0.toByte); (0 until 31).foreach(_ => b.put(0.toByte)) // compressorname (pascal, empty)
      b.putShort(24); b.putShort(-1)            // depth, pre_defined
    }, 78))
    val stsd = fullBox("stsd", 0, 0, {
      val out = new java.io.ByteArrayOutputStream()
      be(out, 1); out.write(sampleEntry, 0, sampleEntry.length)
      out.toByteArray
    })
    // stts: run-length (sample_count, sample_delta) over equal-delta runs.
    val runs = frameDurations.foldLeft(Vector.empty[(Int, Int)]) { (acc, d) =>
      acc.lastOption match {
        case Some((n, dd)) if dd == d => acc.init :+ (n + 1, d)
        case _ => acc :+ (1, d)
      }
    }
    val stts = fullBox("stts", 0, 0, bytesOf({ b =>
      b.putInt(runs.length)
      runs.foreach { case (n, d) => b.putInt(n); b.putInt(d) }
    }, 4 + 8 * runs.length))
    val stsc = fullBox("stsc", 0, 0, bytesOf({ b =>
      b.putInt(1); b.putInt(1); b.putInt(frames.length); b.putInt(1)
    }, 16))
    val stsz = fullBox("stsz", 0, 0, bytesOf({ b =>
      b.putInt(0); b.putInt(frames.length)
      frames.foreach(f => b.putInt(f.length))
    }, 8 + 4 * frames.length))
    val stco = fullBox("stco", 0, 0, bytesOf({ b =>
      b.putInt(1); b.putInt(chunkOffset)
    }, 8))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", vmhd ++ dinf ++ stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ mdat ++ moov
  }

  // ------------------------------------------------------------------
  // Demuxer
  // ------------------------------------------------------------------

  /** Child-box iterator over `bytes[from, until)`: yields
    * (fourcc, payloadStart, payloadEnd). Handles 64-bit `largesize`
    * (size == 1) and to-end-of-enclosure (size == 0) per §4.2.
    * Malformed sizes end the walk (the caller's find misses → None).
    */
  private def children(bytes: Array[Byte], from: Long, until: Long)
      : Iterator[(String, Long, Long)] = new Iterator[(String, Long, Long)] {
    private var pos = from
    private var nextBox: (String, Long, Long) = null
    private def u32(o: Long): Long =
      ((bytes(o.toInt) & 0xffL) << 24) | ((bytes(o.toInt + 1) & 0xffL) << 16) |
        ((bytes(o.toInt + 2) & 0xffL) << 8) | (bytes(o.toInt + 3) & 0xffL)
    private def advance(): Unit = {
      nextBox = null
      if (pos + 8 > until) return
      val size32 = u32(pos)
      val fourcc = new String(bytes, pos.toInt + 4, 4, "US-ASCII")
      var payloadStart = pos + 8
      val boxEnd =
        if (size32 == 0) until
        else if (size32 == 1) {
          if (pos + 16 > until) return
          val hi = u32(pos + 8); val lo = u32(pos + 12)
          payloadStart = pos + 16
          pos + ((hi << 32) | lo)
        } else pos + size32
      if (boxEnd < payloadStart || boxEnd > until) return
      nextBox = (fourcc, payloadStart, boxEnd)
      pos = boxEnd
    }
    advance()
    def hasNext: Boolean = nextBox != null
    def next(): (String, Long, Long) = {
      val r = nextBox; advance(); r
    }
  }

  private def find(bytes: Array[Byte], from: Long, until: Long,
      fourcc: String): Option[(Long, Long)] =
    children(bytes, from, until).collectFirst {
      case (f, s, e) if f == fourcc => (s, e)
    }

  /** Demux a single-video-track file. Returns None on anything
    * structurally off (missing boxes, truncated tables, sample
    * ranges outside the file).
    */
  def demux(bytes: Array[Byte]): Option[Mp4Meta] = {
    try {
      val n = bytes.length.toLong
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      def u16(o: Long): Int = bb.getShort(o.toInt) & 0xffff
      def u32(o: Long): Long = bb.getInt(o.toInt) & 0xffffffffL
      for {
        (moovS, moovE) <- find(bytes, 0, n, "moov")
        (mvhdS, mvhdE) <- find(bytes, moovS, moovE, "mvhd")
        mvhdVer = bytes(mvhdS.toInt) & 0xff
        // v0: ts at +12, dur at +16 (u32); v1: ts at +20, dur at +24 (u64)
        if mvhdE - mvhdS >= (if (mvhdVer == 0) 24 else 36)
        timescale = if (mvhdVer == 0) u32(mvhdS + 12) else u32(mvhdS + 20)
        duration = if (mvhdVer == 0) u32(mvhdS + 16)
                   else (u32(mvhdS + 24) << 32) | u32(mvhdS + 28)
        (trakS, trakE) <- find(bytes, moovS, moovE, "trak")
        (tkhdS, tkhdE) <- find(bytes, trakS, trakE, "tkhd")
        tkhdVer = bytes(tkhdS.toInt) & 0xff
        whOff = tkhdS + (if (tkhdVer == 0) 76 else 88) // §8.3.2 layout
        if tkhdE >= whOff + 8
        width = (u32(whOff) >> 16).toInt
        height = (u32(whOff + 4) >> 16).toInt
        (mdiaS, mdiaE) <- find(bytes, trakS, trakE, "mdia")
        (minfS, minfE) <- find(bytes, mdiaS, mdiaE, "minf")
        (stblS, stblE) <- find(bytes, minfS, minfE, "stbl")
        (stsdS, stsdE) <- find(bytes, stblS, stblE, "stsd")
        if stsdE - stsdS >= 16
        format = new String(bytes, stsdS.toInt + 12, 4, "US-ASCII")
        samples <- sampleTable(bytes, stblS, stblE)
        // overflow-proof range check: a crafted co64 offset near
        // Long.MaxValue must not wrap `offset + size` negative and
        // sneak past `<= n`
        if samples.forall(s => s.offset >= 0 && s.size >= 0 &&
          s.size <= n && s.offset <= n - s.size)
      } yield Mp4Meta(timescale, duration, width, height, format, samples)
    } catch {
      // Crafted sizes / truncated tables must skip the asset, not
      // crash a scan task (the codec-tier contract).
      case _: RuntimeException => None
    }
  }

  /** Resolve per-sample (offset, size, duration) from the stbl:
    * stts runs → durations; stsz → sizes; stsc chunk runs × stco/co64
    * chunk offsets → absolute positions (samples laid out
    * back-to-back within each chunk, §8.7.4).
    */
  private def sampleTable(bytes: Array[Byte], stblS: Long, stblE: Long)
      : Option[Vector[Sample]] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def u32(o: Long): Long = bb.getInt(o.toInt) & 0xffffffffL
    def u64(o: Long): Long = (u32(o) << 32) | u32(o + 4)

    val sttsOpt = find(bytes, stblS, stblE, "stts")
    val stszOpt = find(bytes, stblS, stblE, "stsz")
    val stscOpt = find(bytes, stblS, stblE, "stsc")
    val coOpt = find(bytes, stblS, stblE, "stco").map((_, false))
      .orElse(find(bytes, stblS, stblE, "co64").map((_, true)))
    if (sttsOpt.isEmpty || stszOpt.isEmpty || stscOpt.isEmpty || coOpt.isEmpty)
      return None
    val (sttsS, sttsE) = sttsOpt.get
    val (stszS, stszE) = stszOpt.get
    val (stscS, stscE) = stscOpt.get
    val ((coS, coE), co64) = coOpt.get

    // ---- sizes (stsz §8.7.3: fixed sample_size or a per-sample list)
    if (stszE - stszS < 12) return None
    val fixedSize = u32(stszS + 4)
    val nSamples = u32(stszS + 8)
    if (nSamples > 1000000L)
      return None // sanity: a crafted count can't allocate unbounded arrays
    val nS = nSamples.toInt
    val sizes = new Array[Long](nS)
    if (fixedSize != 0) java.util.Arrays.fill(sizes, fixedSize)
    else {
      if (stszE - stszS < 12L + 4L * nS) return None
      var i = 0
      while (i < nS) { sizes(i) = u32(stszS + 12 + 4L * i); i += 1 }
    }

    // ---- durations (stts §8.6.1.2: entry_count × (count, delta))
    if (sttsE - sttsS < 8) return None
    val nRuns = u32(sttsS + 4)
    if (nRuns > nS || sttsE - sttsS < 8L + 8L * nRuns) return None
    val durations = new Array[Long](nS)
    var di = 0
    var r = 0L
    while (r < nRuns && di < nS) {
      val cnt = u32(sttsS + 8 + 8 * r)
      val delta = u32(sttsS + 12 + 8 * r)
      var c = 0L
      while (c < cnt && di < nS) { durations(di) = delta; di += 1; c += 1 }
      r += 1
    }
    if (di != nS) return None

    // ---- chunk offsets (stco/co64 §8.7.5)
    if (coE - coS < 8) return None
    val nChunks = u32(coS + 4)
    val coEntry = if (co64) 8L else 4L
    if (coE - coS < 8L + coEntry * nChunks) return None
    def chunkOffset(c: Int): Long =
      if (co64) u64(coS + 8 + 8L * c) else u32(coS + 8 + 4L * c)

    // ---- sample→chunk runs (stsc §8.7.4: first_chunk is 1-based and
    // strictly increasing; a run covers chunks [first_chunk, next run's
    // first_chunk) each holding samples_per_chunk samples)
    if (stscE - stscS < 8) return None
    val nScRuns = u32(stscS + 4)
    if (stscE - stscS < 8L + 12L * nScRuns) return None
    val out = Vector.newBuilder[Sample]
    var sIdx = 0
    var run = 0L
    while (run < nScRuns && sIdx < nS) {
      val firstChunk = u32(stscS + 8 + 12 * run)
      val perChunk = u32(stscS + 12 + 12 * run)
      val lastChunkExcl =
        if (run + 1 < nScRuns) u32(stscS + 8 + 12 * (run + 1)) else nChunks + 1
      if (firstChunk < 1 || lastChunkExcl <= firstChunk ||
        lastChunkExcl > nChunks + 1 || perChunk < 1) return None
      var c = firstChunk
      while (c < lastChunkExcl && sIdx < nS) {
        var pos = chunkOffset((c - 1).toInt)
        var k = 0L
        while (k < perChunk && sIdx < nS) {
          out += Sample(pos, sizes(sIdx), durations(sIdx))
          pos += sizes(sIdx)
          sIdx += 1
          k += 1
        }
        c += 1
      }
      run += 1
    }
    if (sIdx != nS) None else Some(out.result())
  }
}
