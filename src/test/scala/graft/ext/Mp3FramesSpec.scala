package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III frame-walker validation. No JVM built-in MP3
  * parser exists to cross-check against, so the protocol is the
  * spec-twin discipline: hand-computed header bytes and frame
  * lengths straight from ISO/IEC 11172-3 (including the classic
  * 128 kbps / 44.1 kHz / no-padding frame: header FF FB 90 00,
  * length 417 — the most widely published worked example of the
  * §2.4.3.1 length formula), walker runs on hand-built streams the
  * synthesizer never emits (CRC-protected frames, ID3 edge sizes),
  * then roundtrips. No Spark session needed.
  */
class Mp3FramesSpec extends AnyFunSuite {

  test("hand-computed header: 128 kbps, 44.1 kHz, no padding = FF FB 90 00, 417 bytes") {
    // bitrate index 9 -> 128 kbps; rate index 0 -> 44100 Hz
    val f = Mp3Frames.frameBytes(bitrateIdx = 9, rateIdx = 0, padding = 0)
    assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xfb)
    assert((f(2) & 0xff) == 0x90) // 1001 00 0 0
    assert(f.length == 417) // floor(144 * 128000 / 44100)
    // padding adds exactly one byte
    assert(Mp3Frames.frameBytes(9, 0, 1).length == 418)
    // 320 kbps @ 32 kHz: 144 * 320000 / 32000 = 1440 exactly
    assert(Mp3Frames.frameBytes(14, 2, 0).length == 1440)
  }

  test("walk: multi-frame stream with cycling bitrates, padding, and ID3v2 tag") {
    for (tagBody <- Seq(-1, 0, 5, 127, 200)) { // -1 = no tag
      val frames = (0 until 6).map(f =>
        Mp3Frames.frameBytes(1 + f % 14, 1, f % 2))
      val tag = if (tagBody < 0) Array.emptyByteArray else Mp3Frames.id3v2(tagBody)
      val bytes = tag ++ frames.flatten
      val meta = Mp3Frames.walk(bytes).getOrElse(fail(s"walk failed tag=$tagBody"))
      assert(meta.sampleRateHz == 48000)
      assert(meta.frames.size == 6)
      assert(meta.frames.map(_.nBytes) == frames.map(_.length).toVector)
      assert(meta.frames.map(_.padding) == Vector(0, 1, 0, 1, 0, 1))
      // offsets are cumulative from the end of the tag
      val expectedOffsets = frames.map(_.length.toLong)
        .scanLeft(tag.length.toLong)(_ + _).init
      assert(meta.frames.map(_.offset) == expectedOffsets.toVector)
      // duration: 6 frames * 1152 samples at 48 kHz = 144 ms
      assert(meta.durationMs == 144)
    }
  }

  test("walk: CRC-protected frames (protection bit 0, a shape the synth never emits)") {
    val f = Mp3Frames.frameBytes(9, 0, 0)
    f(1) = 0xfa.toByte // flip protection: CRC present
    val meta = Mp3Frames.walk(f).getOrElse(fail("CRC frame rejected"))
    assert(meta.frames.size == 1 && meta.frames.head.bitrateKbps == 128)
  }

  test("walk contract: None, never a throw, on malformed input") {
    val frames3 = (0 until 3).map(f => Mp3Frames.frameBytes(5, 0, f % 2))
    val good = Mp3Frames.id3v2(17) ++ frames3.flatten
    // a truncation at a frame boundary is a VALID shorter stream
    // (walk runs to EOF); anywhere else it must fail
    val boundaries = frames3.map(_.length)
      .scanLeft(27)(_ + _).toSet // 10 + 17 tag bytes
    var n = 0
    while (n < good.length) {
      val r = Mp3Frames.walk(java.util.Arrays.copyOf(good, n))
      if (boundaries(n) && n > 27)
        assert(r.nonEmpty, s"boundary truncation at $n should walk")
      else
        assert(r.isEmpty, s"truncation at $n")
      n += 3
    }
    // reserved indices: bitrate 0 (free format), 15, rate index 3
    for (b3 <- Seq(0x00, 0xf0, 0x9c)) {
      val f = Mp3Frames.frameBytes(9, 0, 0)
      f(2) = b3.toByte
      assert(Mp3Frames.walk(f).isEmpty, f"reserved b3=$b3%02x")
    }
    // sample-rate change mid-stream is a desync
    val mixed = Mp3Frames.frameBytes(9, 0, 0) ++ Mp3Frames.frameBytes(9, 1, 0)
    assert(Mp3Frames.walk(mixed).isEmpty)
    // non-syncsafe ID3 size byte
    val badTag = Mp3Frames.id3v2(5)
    badTag(6) = 0x80.toByte
    assert(Mp3Frames.walk(badTag ++ Mp3Frames.frameBytes(9, 0, 0)).isEmpty)
    // random garbage and a tag whose size runs past EOF
    val rnd = new java.util.Random(11)
    val junk = new Array[Byte](256)
    rnd.nextBytes(junk)
    junk(0) = 0.toByte // ensure no accidental 0xFF sync at start
    assert(Mp3Frames.walk(junk).isEmpty)
    assert(Mp3Frames.walk(Mp3Frames.id3v2(1000).take(30)).isEmpty)
  }
}
