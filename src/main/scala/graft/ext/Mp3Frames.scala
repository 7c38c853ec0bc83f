package graft.ext

/** Pure-JVM MPEG-1 Audio Layer III frame walker (ISO/IEC 11172-3
  * §2.4.1.3 header syntax) — the compressed-AUDIO counterpart of the
  * container tier [[Mp4Codec]] retires for video: everything a
  * training-data pipeline reads from an MP3 WITHOUT decoding samples
  * (frame count, sample rate, per-frame bitrate, exact duration)
  * comes from the 4-byte frame headers alone, and that walk is fully
  * implementable from the public spec with no codec jars. Sample
  * decode (Huffman spectrum + IMDCT + synthesis filterbank) stays
  * the documented stub boundary.
  *
  * Scope:
  *  - '''synthesis''': a valid MPEG-1 Layer III frame sequence (the
  *    encoder twin the oracle contract needs): caller-chosen
  *    bitrate-index/padding per frame, deterministic filler payload,
  *    optional ID3v2 prefix tag (syncsafe size, ID3v2.3 §3.1).
  *  - '''walk''': skip an ID3v2 tag if present, then parse
  *    consecutive frame headers — 11-bit sync, version/layer fields,
  *    bitrate and sampling-rate table lookups, padding — hopping
  *    `N = 144·bitrate/samplerate + padding` bytes per frame
  *    (§2.4.3.1 for Layer II/III). Returns `None`, never a throw,
  *    on desync, reserved indices (bitrate 0/15, rate 3), truncated
  *    trailing frames, or a malformed tag; offsets are Long-checked
  *    (the [[PngCodec]] crafted-length lesson).
  */
object Mp3Frames {

  /** Bitrate table, MPEG-1 Layer III (§2.4.2.3), kbit/s by index
    * 1..14 (0 = free format, 15 = forbidden — both rejected).
    */
  private val BitrateKbps = Array(
    -1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)

  /** Sampling rates, MPEG-1 (§2.4.2.3), Hz by 2-bit index (3 reserved). */
  private val SampleRateHz = Array(44100, 48000, 32000, -1)

  /** Samples per Layer III MPEG-1 frame (granules × subband window). */
  val SamplesPerFrame = 1152

  final case class Frame(offset: Long, nBytes: Int, bitrateKbps: Int, padding: Int)
  final case class Mp3Meta(sampleRateHz: Int, frames: Vector[Frame]) {
    def durationMs: Long =
      frames.length.toLong * SamplesPerFrame * 1000L / sampleRateHz
  }

  /** Header-declared frame length in bytes (§2.4.3.1, Layer II/III):
    * `144 · bitrate / sampling_rate + padding`.
    */
  def frameLen(bitrateKbps: Int, sampleRateHz: Int, padding: Int): Int =
    (144L * bitrateKbps * 1000L / sampleRateHz).toInt + padding

  // ------------------------------------------------------------------
  // Synthesis (encoder twin)
  // ------------------------------------------------------------------

  /** One frame: sync FFF, version 11 (MPEG-1), layer 01 (III),
    * protection 1 (no CRC), then bitrate/rate/padding; joint-stereo
    * mode 01, no mode ext/copyright/original, no emphasis. Payload
    * filler is position-keyed so frame bytes are deterministic.
    */
  def frameBytes(bitrateIdx: Int, rateIdx: Int, padding: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2
      && (padding == 0 || padding == 1), "reserved header field")
    val len = frameLen(BitrateKbps(bitrateIdx), SampleRateHz(rateIdx), padding)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // 111 11 01 1: sync | MPEG-1 | Layer III | no CRC
    out(2) = ((bitrateIdx << 4) | (rateIdx << 2) | (padding << 1)).toByte
    out(3) = 0x40.toByte // 01 00 0 0 00: joint stereo
    var i = 4
    while (i < len) { out(i) = ((i * 31 + bitrateIdx * 7) & 0xff).toByte; i += 1 }
    out
  }

  /** ID3v2.3 tag: "ID3", version 3.0, flags 0, syncsafe body size
    * (§3.1 — 4 × 7-bit groups), zero-filled body.
    */
  def id3v2(bodySize: Int): Array[Byte] = {
    require(bodySize >= 0 && bodySize < (1 << 28), "syncsafe overflow")
    val out = new Array[Byte](10 + bodySize)
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3; out(4) = 0; out(5) = 0
    out(6) = ((bodySize >>> 21) & 0x7f).toByte
    out(7) = ((bodySize >>> 14) & 0x7f).toByte
    out(8) = ((bodySize >>> 7) & 0x7f).toByte
    out(9) = (bodySize & 0x7f).toByte
    out
  }

  // ------------------------------------------------------------------
  // Walker
  // ------------------------------------------------------------------

  /** Walk a whole file: optional ID3v2 tag, then back-to-back MPEG-1
    * Layer III frames to EOF. All frames must share one sampling
    * rate (a real stream's invariant; a mismatch means desync).
    */
  def walk(bytes: Array[Byte]): Option[Mp3Meta] = {
    val n = bytes.length.toLong
    var pos = 0L
    // ID3v2 prefix (ID3v2.3 §3.1): "ID3" + ver(2) + flags + syncsafe size
    if (n >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if ((bytes(6) | bytes(7) | bytes(8) | bytes(9)) < 0) return None // non-syncsafe
      val size = ((bytes(6) & 0x7fL) << 21) | ((bytes(7) & 0x7fL) << 14) |
        ((bytes(8) & 0x7fL) << 7) | (bytes(9) & 0x7fL)
      pos = 10L + size
      if (pos > n) return None
    }
    val frames = Vector.newBuilder[Frame]
    var count = 0
    var rate = -1
    while (pos < n) {
      if (pos + 4 > n) return None // truncated header
      val b1 = bytes(pos.toInt) & 0xff
      val b2 = bytes(pos.toInt + 1) & 0xff
      val b3 = bytes(pos.toInt + 2) & 0xff
      // sync (11 bits) + MPEG-1 (11) + Layer III (01); CRC bit free
      if (b1 != 0xff || (b2 & 0xfe) != 0xfa) return None
      val hasCrc = (b2 & 0x01) == 0
      val bitrateIdx = (b3 >>> 4) & 0xf
      val rateIdx = (b3 >>> 2) & 0x3
      val padding = (b3 >>> 1) & 0x1
      if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
      if (rate < 0) rate = SampleRateHz(rateIdx)
      else if (rate != SampleRateHz(rateIdx)) return None // desync
      val len = frameLen(BitrateKbps(bitrateIdx), rate, padding)
      if (len < (if (hasCrc) 6 else 4) || pos + len > n) return None
      frames += Frame(pos, len, BitrateKbps(bitrateIdx), padding)
      count += 1
      if (count > 4000000) return None // crafted-stream walk bound
      pos += len
    }
    if (rate < 0) None else Some(Mp3Meta(rate, frames.result()))
  }
}
