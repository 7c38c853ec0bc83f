package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Multimodal plumbing: binary payloads, typed metadata, decode
  * boundary via mapPartitions, frame fan-out determinism.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("assets: binary payload bytes round-trip the document text") {
    val rows = Multimodal.assets(spark, dir).limit(10).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert(new String(bytes, "UTF-8") == docs(id))
      val meta = r.getStruct(3)
      assert(meta.getAs[Long]("nBytes") == bytes.length.toLong)
      assert(Set("image", "audio", "video")(r.getString(1)))
    }
  }

  test("decodeAssets: stub decoder runs partition-parallel and is deterministic") {
    val d1 = Multimodal.decodeAssets(Multimodal.assets(spark, dir))
      .collect().map(d => d.assetId -> d).toMap
    val d2 = Multimodal.decodeAssets(Multimodal.assets(spark, dir).repartition(7))
      .collect().map(d => d.assetId -> d).toMap
    assert(d1.keySet == d2.keySet)
    for ((id, d) <- d1) {
      assert(d == d2(id)) // partitioning must not change decode output
      assert(d.width >= 16 && d.width < 80 && d.nFrames >= 1)
    }
  }

  /** Real image bytes via the JDK's own encoder (javax.imageio) — an
    * independent producer for the header parsers under test.
    */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"ImageIO lacks $fmt")
    out.toByteArray
  }

  test("PngCodec: round-trips exercise all five scanline filters exactly") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((1, 1), (3, 2), (17, 5), (32, 24), (1, 9), (40, 1))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      for (ft <- 0 to 4) {
        val enc = PngCodec.encodeGray8(w, h, px, _ => ft)
        val dec = PngCodec.decodeGray8(enc).getOrElse(fail(s"decode $w x $h ft=$ft"))
        assert(dec.width == w && dec.height == h)
        assert(dec.pixels.sameElements(px), s"$w x $h ft=$ft")
      }
      // mixed filters (row-cycling, the mm_image shape)
      val enc = PngCodec.encodeGray8(w, h, px, r => r % 5)
      assert(PngCodec.decodeGray8(enc).get.pixels.sameElements(px))
    }
  }

  test("PngCodec: output is a real PNG — ImageIO decodes it to the same pixels") {
    val w = 23; val h = 11
    val px = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256).toByte)
    val enc = PngCodec.encodeGray8(w, h, px, r => r % 5)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = img.getRaster.getSample(x, y, 0)
      assert(v == (px(y * w + x) & 0xff), s"($x,$y)")
    }
  }

  test("PngCodec: decodes a PNG written by a mainstream codec (ImageIO gray fixture)") {
    val w = 19; val h = 13
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (x <- 0 until w; y <- 0 until h)
      img.getRaster.setSample(x, y, 0, (x * 29 + y * 53) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val dec = PngCodec.decodeGray8(out.toByteArray)
      .getOrElse(fail("PngCodec rejected an ImageIO PNG"))
    assert(dec.width == w && dec.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.pixels(y * w + x) & 0xff) == (x * 29 + y * 53) % 256, s"($x,$y)")
  }

  test("PngCodec: corrupt or out-of-subset inputs yield None, never garbage") {
    val good = PngCodec.encodeGray8(5, 4, Array.fill(20)(9.toByte))
    assert(PngCodec.decodeGray8(good).isDefined)
    // flipped IDAT byte breaks the chunk CRC
    val bad = good.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x5a).toByte
    assert(PngCodec.decodeGray8(bad).isEmpty)
    assert(PngCodec.decodeGray8(good.take(30)).isEmpty) // truncated
    assert(PngCodec.decodeGray8("no".getBytes).isEmpty)
    // RGB (color type 2) is outside the gray8 subset -> None
    val rgb = imageBytes("png", 6, 6)
    assert(PngCodec.decodeGray8(rgb).isEmpty)
  }

  test("mmImage: every image asset's stats equal the closed-form raster") {
    val rows = Multimodal.mmImage(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(0)
      val (w, h) = (r.getLong(1), r.getLong(2))
      assert(h == 1 + id % 24)
      assert(r.getLong(3) == w * h)
      val vals = for (y <- 0L until h; x <- 0L until w)
        yield (id * 31 + 7 * x + 13 * y) % 256
      assert(r.getLong(4) == vals.sum, s"sum $id")
      assert(r.getLong(5) == vals.min && r.getLong(6) == vals.max, s"minmax $id")
      assert(r.getLong(7) == vals.sum * 1000 / (w * h), s"mean $id")
    }
  }

  test("PngCodec.metaGray8: surfaces pHYs + tEXt written by the encoder, CRC-gated") {
    val px = Array.fill(6 * 4)(42.toByte)
    val enc = PngCodec.encodeGray8(6, 4, px,
      physPpm = Some((2835, 1417)),
      texts = Seq("Title" -> "t1", "Author" -> "a, with punct: é"))
    val m = PngCodec.metaGray8(enc).getOrElse(fail("meta walk failed"))
    assert(m.width == 6 && m.height == 4)
    assert(m.ppmX == 2835 && m.ppmY == 1417)
    assert(m.texts == Seq("Title" -> "t1", "Author" -> "a, with punct: é"))
    // absent pHYs -> (0, 0); empty tEXt list preserved
    val plain = PngCodec.encodeGray8(6, 4, px)
    val mp = PngCodec.metaGray8(plain).get
    assert(mp.ppmX == 0 && mp.ppmY == 0 && mp.texts.isEmpty)
    // the metadata walk keeps the pixel decoder's corruption discipline
    val bad = enc.clone()
    bad(40) = (bad(40) ^ 0x5a).toByte // inside pHYs -> CRC mismatch
    assert(PngCodec.metaGray8(bad).isEmpty)
    assert(PngCodec.metaGray8(enc.take(30)).isEmpty)
    assert(PngCodec.metaGray8("no".getBytes).isEmpty)
    // metadata-bearing PNGs still pixel-decode (ancillary chunks skipped)
    assert(PngCodec.decodeGray8(enc).get.pixels.sameElements(px))
    // and an independent producer's PNG walks fine (no pHYs/tEXt)
    val mi = PngCodec.metaGray8(imageBytes("png", 9, 7))
    assert(mi.exists(x => x.width == 9 && x.height == 7))
  }

  test("mmImageMeta: ancillary metadata of every image asset equals the closed form") {
    val rows = Multimodal.mmImageMeta(spark, dir).collect()
    assert(rows.nonEmpty)
    val nChars = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      assert(id % 3 == 0)
      assert(r.getLong(1) == 1 + nChars(id) % 32, s"width $id")
      assert(r.getLong(2) == 1 + id % 24, s"height $id")
      assert(r.getLong(3) == 1000 + id % 50, s"ppm_x $id")
      assert(r.getLong(4) == 1000 + nChars(id) % 40, s"ppm_y $id")
      assert(r.getLong(5) == 2L && r.getString(6) == s"doc-$id")
    }
  }

  test("mmImageProg: progressive-JPEG stats equal the closed-form block grid") {
    val rows = Multimodal.mmImageProg(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(0)
      val (w, h) = (r.getLong(1), r.getLong(2))
      assert(w == (1 + id % 4) * 8)
      val (wb, hb) = (w / 8, h / 8)
      val vals = for (by <- 0L until hb; bx <- 0L until wb)
        yield (23 * id + 7 * bx + 19 * by) % 256
      assert(r.getLong(3) == w * h)
      assert(r.getLong(4) == vals.sum * 64, s"sum $id")
      assert(r.getLong(5) == vals.min && r.getLong(6) == vals.max, s"minmax $id")
    }
  }

  test("mmVideo: MP4 demux + per-frame decode equals the closed-form frame grid") {
    val rows = Multimodal.mmVideo(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getAs[Long]("asset_id")
      val nf = r.getAs[Long]("n_frames")
      assert(nf == 1 + id % 5)
      val (w, h) = (r.getAs[Long]("width"), r.getAs[Long]("height"))
      // width derives from n_chars (not in this projection); height from id
      assert(w % 8 == 0 && w >= 8 && w <= 32 && h == (1 + id % 3) * 8)
      val (wb, hb) = (w / 8, h / 8)
      val vals = for (f <- 0L until nf; by <- 0L until hb; bx <- 0L until wb)
        yield (17 * id + 23 * f + 5 * bx + 11 * by) % 256
      assert(r.getAs[Long]("n_pixels") == nf * w * h)
      assert(r.getAs[Long]("sum_lum") == vals.sum * 64, s"sum $id")
      assert(r.getAs[Long]("min_lum") == vals.min &&
        r.getAs[Long]("max_lum") == vals.max, s"minmax $id")
      val ticks = (0L until nf).map(f => 24 + (id + f) % 2).sum
      assert(r.getAs[Long]("duration_ticks") == ticks, s"ticks $id")
      assert(r.getAs[Long]("duration_ms") == ticks * 1000 / 600, s"ms $id")
    }
  }

  test("mmAudioMp3: frame walk equals the header-law closed form") {
    val rows = Multimodal.mmAudioMp3(spark, dir).collect()
    assert(rows.nonEmpty)
    val kbps = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val rates = Array(44100, 48000, 32000)
    for (r <- rows) {
      val id = r.getAs[Long]("asset_id")
      val nf = r.getAs[Long]("n_frames")
      val rate = rates((id % 3).toInt)
      assert(r.getAs[Long]("sample_rate") == rate)
      assert(r.getAs[Long]("duration_ms") == nf * 1152 * 1000 / rate)
      val perFrame = (0L until nf).map { f =>
        val k = kbps(((id + f) % 14).toInt)
        val pad = (id + f) % 2
        (k.toLong, 144000L * k / rate + pad, pad)
      }
      assert(r.getAs[Long]("sum_kbps") == perFrame.map(_._1).sum, s"kbps $id")
      assert(r.getAs[Long]("frame_bytes") == perFrame.map(_._2).sum, s"bytes $id")
      assert(r.getAs[Long]("n_padded") == perFrame.map(_._3).sum, s"pad $id")
    }
  }

  test("ImageHeaderDecoder: real PNG/JPEG/GIF bytes decode to true dimensions") {
    for ((fmt, w, h) <- Seq(("png", 13, 7), ("jpg", 40, 25), ("gif", 9, 31))) {
      val bytes = imageBytes(fmt, w, h)
      assert(Multimodal.ImageHeaderDecoder.imageDims(bytes).contains((w, h)),
        s"$fmt ${bytes.take(4).map(b => f"${b & 0xff}%02x").mkString}")
      val d = Multimodal.ImageHeaderDecoder.decode(1L, "image", bytes)
      assert((d.width, d.height, d.nFrames) == (w, h, 1), fmt)
    }
  }

  test("ImageHeaderDecoder: progressive JPEG (SOF2 after APP0+comment) and edge cases") {
    // hand-built marker stream: SOI, APP0, COM, SOF2(h=300,w=520)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    val sof2 = Array[Byte](8, 1, 44, 2, 8, 3) // precision, h=0x012C, w=0x0208
    val jpeg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xe0, "JFIF".getBytes) ++ seg(0xfe, "comment".getBytes) ++ seg(0xc2, sof2)
    assert(Multimodal.ImageHeaderDecoder.jpegDims(jpeg).contains((520, 300)))
    // DHT (C4) must NOT be mistaken for a SOF
    val dhtFirst = Array(0xff.toByte, 0xd8.toByte) ++ seg(0xc4, Array[Byte](0)) ++ seg(0xc0, sof2)
    assert(Multimodal.ImageHeaderDecoder.jpegDims(dhtFirst).contains((520, 300)))
    // truncated / non-image payloads parse to None, never throw
    assert(Multimodal.ImageHeaderDecoder.imageDims("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageHeaderDecoder.imageDims(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Multimodal.ImageHeaderDecoder.imageDims(Array.emptyByteArray).isEmpty)
    assert(Multimodal.ImageHeaderDecoder.imageDims(imageBytes("png", 5, 5).take(20)).isEmpty)
  }

  test("decodeAssets with real image payloads yields true dimensions through the Spark path") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image", imageBytes("png", 64, 48)),
      (2L, "image", imageBytes("jpg", 32, 32)),
      (3L, "image", "garbage".getBytes), // unrecognized -> stub fallback
      (4L, "audio", imageBytes("png", 9, 9))) // wrong kind -> stub
      .toDF("asset_id", "kind", "bytes")
    val out = Multimodal.decodeAssets(rows).collect().map(d => d.assetId -> d).toMap
    assert((out(1L).width, out(1L).height) == (64, 48))
    assert((out(2L).width, out(2L).height) == (32, 32))
    assert(out(3L) == Multimodal.StubDecoder.decode(3L, "image", "garbage".getBytes))
    assert(out(4L).width < 80) // stub range, not the PNG's true 9
  }

  test("AudioHeaderDecoder: a JDK-written WAV decodes to true rate/channels/samples") {
    import javax.sound.sampled._
    val nSamples = 1234
    val fmt = new AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](nSamples * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray
    assert(Multimodal.AudioHeaderDecoder.wavMeta(bytes)
      .contains(Multimodal.AudioMeta(8000, 2, 16, nSamples.toLong)))
    // non-WAV audio payloads still fall back to the documented stub
    assert(Multimodal.AudioHeaderDecoder.wavMeta("not a riff".getBytes).isEmpty)
    // hostile chunk sizes must return None, not hang or throw: a
    // size of 0xFFFFFFF8 would stall an Int cursor (+= 0), and
    // 0x80000000 would wrap it negative
    for (hostile <- Seq(0xFFFFFFF8L, 0x80000000L)) {
      val evil = java.util.Arrays.copyOf(bytes, 64)
      System.arraycopy("junk".getBytes, 0, evil, 12, 4) // unknown chunk id
      for (k <- 0 until 4) evil(16 + k) = ((hostile >> (8 * k)) & 0xff).toByte
      assert(Multimodal.AudioHeaderDecoder.wavMeta(evil).isEmpty,
        s"hostile size 0x${hostile.toHexString} not rejected")
    }
    // and through the Spark decode path end-to-end
    import spark.implicits._
    val out = Multimodal.decodeAssets(
      Seq((7L, "audio", bytes)).toDF("asset_id", "kind", "bytes"))
      .collect().head
    assert((out.width, out.height, out.nFrames) == (8000, 2, nSamples))
  }

  test("mmFrames: offsets within payload, at most 8 frames, video only") {
    val rows = Multimodal.mmFrames(spark, dir).collect()
    assert(rows.nonEmpty)
    val byAsset = rows.groupBy(_.getLong(0))
    for ((id, fs) <- byAsset) {
      assert(id % 3 == 2)
      assert(fs.length <= 8)
      assert(fs.map(_.getLong(1)).sorted.sameElements(0L until fs.length))
    }
  }

  test("wavBytes→wavMeta roundtrip holds across rates/channels incl. empty data") {
    for {
      rate <- Seq(8000, 16000, 44100)
      ch <- Seq(1, 2)
      n <- Seq(0, 1, 553)
    } {
      val m = Multimodal.AudioHeaderDecoder
        .wavMeta(Multimodal.wavBytes(rate, ch, n))
      assert(m.exists(x =>
        x.sampleRate == rate && x.channels == ch && x.nSamples == n.toLong),
        s"roundtrip failed for ($rate, $ch, $n): $m")
    }
  }

  test("mmAudio: every audio asset decodes to its attribute-derived params") {
    val rows = Multimodal.mmAudio(spark, dir).collect()
    assert(rows.length == spark.read.parquet(s"$dir/documents.parquet")
      .filter("doc_id % 3 = 1").count())
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getLong(1) == 8000L + (id % 4) * 4000L)
      assert(r.getLong(2) == 1L + id % 2)
      assert(r.getLong(4) == r.getLong(3) * 1000L / r.getLong(1))
    }
  }
}
