package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (north star):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * The header decode tier is REAL: [[ImageHeaderDecoder]] parses
  * PNG/JPEG/GIF headers to true dimensions and
  * [[AudioHeaderDecoder]] parses WAV (RIFF/WAVE) headers to sample
  * rate/channels/sample count, pure-JVM from the public specs. PNG
  * PIXEL decode is real ([[PngCodec]]: inflate + all five scanline
  * filters, exercised end-to-end by `mm_image`), and so is baseline
  * JPEG PIXEL decode ([[JpegCodec]]: Huffman + dequant + IDCT from
  * ISO/IEC 10918-1, exercised by `mm_image_jpeg`). VIDEO is real at
  * the container + Motion-JPEG tier ([[Mp4Codec]]: ISO/IEC 14496-12
  * box mux/demux with per-frame [[JpegCodec]] pixel decode,
  * exercised by `mm_video`), and progressive (SOF2) JPEG decodes for
  * real too (Annex G multi-scan, exercised by `mm_image_prog`); the
  * remaining compressed codecs (MP3 sample decode — headers are real,
  * see `mm_audio_mp3` — and inter-frame video: H.264/HEVC/VP9) stay a
  * clearly-marked deterministic STUB behind [[MediaDecoder]]
  * (ffmpeg-class codecs don't ship in this offline environment);
  * everything Spark-side —
  * binary column handling, schema, partitioned decode via
  * `mapPartitions`, deterministic frame sampling, digest/size
  * metadata — is real and oracle-/test-covered. Swapping in a
  * JNI/ffmpeg-backed decoder changes no plan shape: the decode runs
  * data-parallel per partition with no shuffle.
  *
  * Assets are synthesized deterministically from `documents` (UTF-8
  * bytes of the text; kind = doc_id mod 3), so the DuckDB oracle can
  * reproduce byte-level results with `encode()`.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class AssetMeta(kind: String, nBytes: Long)
  final case class Asset(assetId: Long, kind: String, bytes: Array[Byte], meta: AssetMeta)

  /** Decoded representation (fake fields; a real decoder would emit
    * width/height/duration/frames).
    */
  final case class Decoded(assetId: Long, kind: String, width: Int, height: Int, nFrames: Int)

  /** Decode boundary. Real implementations (pdfbox/ffmpeg/javacv) are
    * not buildable offline — see SURVEY.md §7.4.
    */
  trait MediaDecoder extends Serializable {
    def decode(assetId: Long, kind: String, bytes: Array[Byte]): Decoded
  }

  /** STUB decoder: deterministic fake that derives "dimensions" from
    * the payload bytes (first/last byte + length). Replace with a
    * codec-backed implementation when a media jar is available.
    */
  object StubDecoder extends MediaDecoder {
    def decode(assetId: Long, kind: String, bytes: Array[Byte]): Decoded = {
      val first = if (bytes.nonEmpty) bytes(0) & 0xFF else 0
      val last = if (bytes.nonEmpty) bytes(bytes.length - 1) & 0xFF else 0
      Decoded(assetId, kind, 16 + first % 64, 16 + last % 64, 1 + bytes.length / 100)
    }
  }

  /** REAL image decode for the header tier: PNG IHDR, JPEG SOFn, and
    * GIF logical-screen dimensions parsed pure-JVM from the public
    * file-format specs (PNG RFC 2083 §3.1/§4.1.1, ISO/IEC 10918-1
    * Annex B marker syntax, GIF89a §18) — no codec dependency.
    * Audio/video and unrecognized image payloads delegate to
    * [[StubDecoder]] (still environment-blocked: pixel/sample decode
    * needs ffmpeg-class codecs). This de-stubs the `kind = image`
    * path end-to-end: real bytes in, true dimensions out.
    */
  object ImageHeaderDecoder extends MediaDecoder {
    def decode(assetId: Long, kind: String, bytes: Array[Byte]): Decoded =
      if (kind == "image")
        imageDims(bytes) match {
          case Some((w, h)) => Decoded(assetId, kind, w, h, 1)
          case None => StubDecoder.decode(assetId, kind, bytes)
        }
      else StubDecoder.decode(assetId, kind, bytes)

    /** (width, height) if the payload is a recognizable PNG/JPEG/GIF. */
    def imageDims(b: Array[Byte]): Option[(Int, Int)] =
      pngDims(b).orElse(jpegDims(b)).orElse(gifDims(b))

    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    /** PNG: 8-byte signature, then the IHDR chunk (always first):
      * length(4) "IHDR" width(4 BE) height(4 BE).
      */
    private[ext] def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (b.length >= 24 && b.startsWith(sig) &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some((be32(b, 16), be32(b, 20)))
      else None
    }

    /** JPEG: walk the marker segments from SOI to the first SOFn
      * (C0–CF except C4/C8/CC); the frame header carries
      * precision(1) height(2) width(2). Length-less standalone
      * markers (TEM, RSTn) skip; EOI/SOS before any SOF means no
      * parseable frame header.
      */
    private[ext] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // marker desync
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val m = b(j) & 0xff
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1 // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI / SOS
        else {
          if (j + 2 >= b.length) return None
          val len = be16(b, j + 1)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 7 >= b.length) return None
            return Some((be16(b, j + 6), be16(b, j + 4)))
          }
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    }

    /** GIF87a/89a: 6-byte signature + logical screen width/height
      * (16-bit LITTLE-endian).
      */
    private[ext] def gifDims(b: Array[Byte]): Option[(Int, Int)] =
      if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        Some(((b(6) & 0xff) | ((b(7) & 0xff) << 8), (b(8) & 0xff) | ((b(9) & 0xff) << 8)))
      else None
  }

  /** Parsed WAV (RIFF/WAVE) header metadata. */
  final case class AudioMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long)

  /** REAL audio decode for the header tier: WAV `fmt `/`data` chunk
    * parsing pure-JVM from the public RIFF/WAVE layout (channels,
    * sample rate, bit depth; sample count from the data chunk size /
    * block align). Compressed codecs (MP3/AAC/...) remain
    * environment-blocked behind [[StubDecoder]].
    */
  object AudioHeaderDecoder {
    private def le32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
        b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

    /** Walk the RIFF chunk list (word-aligned: odd chunk sizes pad
      * one byte) collecting `fmt ` and `data`.
      */
    private[ext] def wavMeta(b: Array[Byte]): Option[AudioMeta] = {
      if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
      // walk in Long so a hostile 32-bit size can neither wrap the
      // cursor negative nor stall it (malformed input must return
      // None, not hang or throw — the stub fallback's contract)
      var i = 12L
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
      var dataSize = -1L
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
        val at = i.toInt
        val size = le32(b, at + 4) // unsigned 32-bit, always >= 0
        if (tag(b, at, "fmt ") && i + 24 <= b.length)
          fmt = Some((le16(b, at + 10), le32(b, at + 12).toInt,
            le16(b, at + 20), le16(b, at + 22)))
        else if (tag(b, at, "data"))
          dataSize = math.min(size, (b.length - i - 8))
        i += 8L + size + (size & 1L)
      }
      fmt.collect {
        case (ch, rate, block, bits) if ch > 0 && rate > 0 && block > 0 && dataSize >= 0 =>
          AudioMeta(rate, ch, bits, dataSize / block)
      }
    }
  }

  /** Header-tier router: image payloads through
    * [[ImageHeaderDecoder]], WAV audio through [[AudioHeaderDecoder]]
    * (the [[Decoded]] slots are kind-generic — audio reports
    * (sample_rate, channels, n_samples) in (width, height, nFrames);
    * a tagged-union boundary costs schema churn for no plan change),
    * everything else to the documented stub.
    */
  object MediaHeaderDecoder extends MediaDecoder {
    def decode(assetId: Long, kind: String, bytes: Array[Byte]): Decoded =
      kind match {
        case "audio" =>
          AudioHeaderDecoder.wavMeta(bytes) match {
            case Some(m) =>
              Decoded(assetId, kind, m.sampleRate, m.channels,
                math.min(m.nSamples, Int.MaxValue.toLong).toInt)
            case None => StubDecoder.decode(assetId, kind, bytes)
          }
        case _ => ImageHeaderDecoder.decode(assetId, kind, bytes)
      }
  }

  /** Binary asset table synthesized from documents: `bytes` is the
    * UTF-8 payload, `kind` cycles image/audio/video, `meta` is the
    * typed metadata struct.
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.table(spark, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .withColumn("meta", struct(col("kind"),
        octet_length(col("bytes")).cast("long").as("nBytes")))

  /** Partition-parallel decode through the [[MediaDecoder]] boundary
    * (mapPartitions: one decoder instance per task, no shuffle) —
    * the plumbing a real codec would use. Covered by MultimodalSpec.
    */
  def decodeAssets(
      assets: DataFrame,
      decoder: MediaDecoder = MediaHeaderDecoder): Dataset[Decoded] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) => decoder.decode(id, kind, bytes) }
      }
  }

  /** Metadata features over the binary column — size, content digest,
    * kind split. Fully portable (sha256 + octet_length), so
    * DuckDB-oracle-backed.
    */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(
        col("asset_id"), col("kind"),
        col("meta.nBytes").as("n_bytes"),
        sha2(col("bytes"), 256).as("digest"))
      .orderBy("asset_id")

  val mmFeaturesSql: String =
    """SELECT doc_id AS asset_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                  ELSE 'video' END AS kind,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS digest
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Deterministic frame sampling for `video` assets: up to 8 frames
    * at a byte stride of n_bytes/8, each frame tagged with its byte
    * offset and the sampled lead byte (codepoint — ASCII payloads).
    * The `explode(sequence(...))` shape is exactly how a real
    * frame-sampler would fan out per-frame rows before a decode UDF.
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2 && length(col("text")) > 0)
      .select(
        col("doc_id").as("asset_id"), col("text"),
        // stride over CHARACTERS, not bytes: substr indexes chars, so
        // byte-based offsets would drift (or fall off the end) on
        // multi-byte payloads
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("stride", greatest(lit(1L), expr("n_chars div 8")))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), least(lit(7L), expr("(n_chars - 1) div stride")))))
      .withColumn("char_off", col("frame_idx") * col("stride"))
      .select(
        col("asset_id"), col("frame_idx"), col("char_off"),
        ascii(col("text").substr((col("char_off") + 1).cast("int"), lit(1)))
          .cast("long").as("lead_cp"))
      .orderBy("asset_id", "frame_idx")

  /** Canonical 44-byte PCM WAV container around a silent payload —
    * the synthesis half of the audio tier (RIFF/WAVE public layout;
    * 16-bit samples, so block align = 2·channels).
    */
  private[ext] def wavBytes(rate: Int, channels: Int, nSamples: Int,
      info: Seq[(String, String)] = Nil): Array[Byte] = {
    val block = channels * 2
    val dataSize = nSamples * block
    // LIST(INFO) chunk (round 15, the mm_audio_meta gate): each tag is
    // fourcc + size + null-terminated ISO-8859-1 text, word-aligned
    // (the public RIFF §INFO layout); written between fmt and data
    val infoBody: Array[Byte] =
      if (info.isEmpty) Array.emptyByteArray
      else {
        val out = new java.io.ByteArrayOutputStream()
        out.write("INFO".getBytes("US-ASCII"), 0, 4)
        for ((k, v) <- info) {
          require(k.length == 4 && k.forall(c => c < 128),
            s"bad INFO fourcc '$k'")
          val z = (v + "\u0000").getBytes("ISO-8859-1")
          val hdr = java.nio.ByteBuffer.allocate(8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          hdr.put(k.getBytes("US-ASCII")); hdr.putInt(z.length)
          out.write(hdr.array(), 0, 8)
          out.write(z, 0, z.length)
          if ((z.length & 1) == 1) out.write(0) // word alignment pad
        }
        out.toByteArray
      }
    val listSize = if (infoBody.isEmpty) 0 else 8 + infoBody.length
    val buf = java.nio.ByteBuffer.allocate(44 + listSize + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + listSize + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(rate); buf.putInt(rate * block)
    buf.putShort(block.toShort); buf.putShort(16)
    if (infoBody.nonEmpty) {
      buf.put("LIST".getBytes("US-ASCII")); buf.putInt(infoBody.length)
      buf.put(infoBody)
    }
    buf.put("data".getBytes("US-ASCII")); buf.putInt(dataSize)
    buf.array()
  }

  /** RIFF LIST(INFO) tag walk (round 15): the same hostile-size-safe
    * chunk discipline as [[AudioHeaderDecoder.wavMeta]], surfacing
    * the INFO metadata tags the sample decoder skips — fourcc keys
    * with their null-terminated values, in file order. None on
    * anything structurally malformed, never a garble.
    */
  private[ext] def wavInfo(b: Array[Byte]): Option[Seq[(String, String)]] = {
    def tag(i: Int, s: String): Boolean =
      b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
        b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    val tags = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = le32(at + 4)
      if (tag(at, "LIST") && size >= 4 && i + 8 + size <= b.length &&
          tag(at + 8, "INFO")) {
        var j = i + 12
        val end = i + 8 + size
        while (j + 8 <= end) {
          val ja = j.toInt
          val zl = le32(ja + 4)
          if (j + 8 + zl > end) return None // truncated tag
          val four = new String(b, ja, 4, "US-ASCII")
          val raw = new String(b, ja + 8, zl.toInt, "ISO-8859-1")
          val z = raw.indexOf('\u0000')
          if (z < 0) return None // INFO values are null-terminated
          tags += ((four, raw.substring(0, z)))
          j += 8L + zl + (zl & 1L)
        }
      }
      i += 8L + size + (size & 1L)
    }
    Some(tags.toSeq)
  }

  /** Registered AUDIO decode tier: every audio-slice asset gets a
    * real PCM WAV container whose parameters derive from its row
    * (rate ∈ {8k,12k,16k,20k} by id, mono/stereo by parity, one
    * sample per text char), synthesized and decoded back through
    * [[AudioHeaderDecoder]] INSIDE the partition kernel (binary
    * work is genuine per-row imperative logic — the same
    * mapPartitions boundary as [[decodeAssets]], no shuffle). The
    * oracle recomputes the fields from the row attributes alone, so
    * a hash match proves the RIFF encode→walk→decode loop exact on
    * every asset — the container plumbing a real codec plugs into,
    * with compressed formats staying the documented stub.
    */
  def mmAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1) // assets()'s audio slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val channels = (1 + id % 2).toInt
        val bytes = wavBytes(rate, channels, nChars.toInt)
        val m = AudioHeaderDecoder.wavMeta(bytes)
          .getOrElse(sys.error(s"undecodable WAV for asset $id"))
        (id, m.sampleRate.toLong, m.channels.toLong, m.nSamples)
      }
    }.toDF("asset_id", "sample_rate", "channels", "n_samples")
      .withColumn("duration_ms",
        expr("n_samples * 1000 div sample_rate"))
      .orderBy("asset_id")
  }

  /** Registered IMAGE pixel-decode tier: every image-slice asset gets
    * a real 8-bit grayscale PNG whose geometry and pixel values
    * derive deterministically from its row (w = 1 + n_chars mod 32,
    * h = 1 + id mod 24, pixel(x,y) = (31·id + 7x + 13y) mod 256),
    * with the scanline filter CYCLING through all five types by row —
    * synthesized and pixel-decoded back through [[PngCodec]] inside
    * the partition kernel (the [[mmAudio]] pattern: encode → full
    * decode per row, no shuffle). The per-channel statistics are
    * computed from the DECODED pixels, and the oracle recomputes them
    * in closed form from the row attributes alone — a hash match
    * proves the deflate→chunk→inflate→unfilter loop bit-exact on
    * every asset and every filter type. This retires the PNG pixel
    * stub; JPEG/video stay the documented codec boundary.
    */
  def mmImage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0) // assets()'s image slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val w = (1 + nChars % 32).toInt
        val h = (1 + id % 24).toInt
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = (((id * 31 + 7L * x + 13L * y) % 256).toInt & 0xff).toByte
            x += 1
          }
          y += 1
        }
        val bytes = PngCodec.encodeGray8(w, h, px, filterOfRow = r => r % 5)
        val img = PngCodec.decodeGray8(bytes)
          .getOrElse(sys.error(s"undecodable PNG for asset $id"))
        var sum = 0L
        var mn = 255L
        var mx = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = (img.pixels(i) & 0xff).toLong
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (id, img.width.toLong, img.height.toLong,
          img.pixels.length.toLong, sum, mn, mx)
      }
    }.toDF("asset_id", "width", "height", "n_pixels",
        "sum_lum", "min_lum", "max_lum")
      .withColumn("mean_lum_x1000", expr("sum_lum * 1000 div n_pixels"))
      .orderBy("asset_id")
  }

  /** PNG ancillary-metadata tier (`mm_image_meta`, round 15): the same
    * image-slice assets re-synthesized WITH physical-density (pHYs)
    * and two tEXt keyword/value chunks, then read back through
    * [[PngCodec.metaGray8]] — the CRC-verified metadata walk that
    * surfaces ancillary chunks WITHOUT inflating a single IDAT byte.
    * This is the cheap first pass a 100 TB image-corpus audit runs
    * (dimensions, DPI, provenance tags) before deciding what to
    * pixel-decode; the gate proves the writer's §4.2 chunk ordering,
    * the NULL-separated tEXt layout, and the reader's walk
    * bit-exactly via the closed-form oracle. Per-asset rowwise work,
    * no shuffle beyond the final sort (the mm family convention).
    */
  def mmImageMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0) // assets()'s image slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val w = (1 + nChars % 32).toInt
        val h = (1 + id % 24).toInt
        val px = new Array[Byte](w * h) // pixels irrelevant to the meta walk
        val ppmX = (1000 + id % 50).toInt
        val ppmY = (1000 + nChars % 40).toInt
        val bytes = PngCodec.encodeGray8(w, h, px,
          physPpm = Some((ppmX, ppmY)),
          texts = Seq("Title" -> s"doc-$id", "Software" -> "graft-png"))
        val m = PngCodec.metaGray8(bytes)
          .getOrElse(sys.error(s"unwalkable PNG meta for asset $id"))
        (id, m.width.toLong, m.height.toLong,
          m.ppmX.toLong, m.ppmY.toLong,
          m.texts.length.toLong, m.texts.head._2)
      }
    }.toDF("asset_id", "width", "height", "ppm_x", "ppm_y",
        "n_texts", "title")
      .orderBy("asset_id")
  }

  val mmImageMetaSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(1 + n_chars % 32 AS BIGINT) AS width,
      |  CAST(1 + doc_id % 24 AS BIGINT) AS height,
      |  CAST(1000 + doc_id % 50 AS BIGINT) AS ppm_x,
      |  CAST(1000 + n_chars % 40 AS BIGINT) AS ppm_y,
      |  CAST(2 AS BIGINT) AS n_texts,
      |  'doc-' || CAST(doc_id AS VARCHAR) AS title
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY asset_id""".stripMargin

  /** WAV ancillary-metadata tier (`mm_audio_meta`, round 15 — the
    * audio twin of [[mmImageMeta]]): the audio-slice assets
    * re-synthesized WITH a RIFF LIST(INFO) chunk (INAM title + ISFT
    * software tags, null-terminated word-aligned per the public RIFF
    * INFO layout) and walked back through [[wavInfo]] + the existing
    * [[AudioHeaderDecoder.wavMeta]] — proving the writer's chunk
    * interleave (fmt → LIST → data) breaks NEITHER the format walk
    * nor the tag walk, and the tag loop is bit-exact against the
    * closed-form oracle. Per-asset rowwise work, no shuffle beyond
    * the presentation sort.
    */
  def mmAudioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1) // assets()'s audio slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val rate = (8000 + (id % 4) * 4000).toInt
        val channels = (1 + id % 2).toInt
        val bytes = wavBytes(rate, channels, nChars.toInt,
          info = Seq("INAM" -> s"track-$id", "ISFT" -> "graft-wav"))
        val m = AudioHeaderDecoder.wavMeta(bytes)
          .getOrElse(sys.error(s"undecodable tagged WAV for asset $id"))
        val tags = wavInfo(bytes)
          .getOrElse(sys.error(s"unwalkable INFO for asset $id"))
        (id, m.sampleRate.toLong, m.channels.toLong, m.nSamples,
          tags.length.toLong, tags.head._2)
      }
    }.toDF("asset_id", "sample_rate", "channels", "n_samples",
        "n_tags", "title")
      .orderBy("asset_id")
  }

  val mmAudioMetaSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |  CAST(n_chars AS BIGINT) AS n_samples,
      |  CAST(2 AS BIGINT) AS n_tags,
      |  'track-' || CAST(doc_id AS VARCHAR) AS title
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY asset_id""".stripMargin

  /** Registered JPEG pixel-decode tier (round 8 — retires the JPEG
    * tier of the pixel stub the same way [[mmImage]] retired PNG's):
    * every image-slice asset gets a real baseline JFIF JPEG built
    * from 8×8-aligned CONSTANT blocks (wb = 1 + n_chars mod 4 blocks
    * wide, hb = 1 + id mod 3 high; block(bx,by) = (17·id + 5·bx +
    * 11·by) mod 256) encoded with the flat-8 quantization table —
    * the one family where the lossy DCT pipeline is provably
    * LOSSLESS: a constant level-shifted block has DC = 8·(v−128) and
    * zero AC, quantizer 8 inverts the DC gain exactly, and the IDCT
    * of a DC-only block is an exact constant fill. So
    * FDCT→quant→Huffman→parse→Huffman⁻¹→dequant→IDCT reconstructs
    * every pixel bit-exactly, and the oracle states the decoded
    * statistics in closed form over the block grid. Encode and full
    * pixel decode run through [[JpegCodec]] inside the partition
    * kernel ([[mmAudio]]'s pattern — per-row imperative binary work,
    * no shuffle). Progressive JPEG / MP3 / video remain the
    * documented boundary.
    */
  def mmImageJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0) // assets()'s image slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val wb = (1 + nChars % 4).toInt
        val hb = (1 + id % 3).toInt
        val w = wb * 8
        val h = hb * 8
        val px = constBlockRaster(wb, hb)((bx, by) =>
          (((17L * id + 5L * bx + 11L * by) % 256).toInt & 0xff).toByte)
        val bytes = JpegCodec.encodeGray8(w, h, px, JpegCodec.flatQuant(8))
        val img = JpegCodec.decodeGray8(bytes)
          .getOrElse(sys.error(s"undecodable JPEG for asset $id"))
        var sum = 0L
        var mn = 255L
        var mx = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = (img.pixels(i) & 0xff).toLong
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (id, img.width.toLong, img.height.toLong,
          img.pixels.length.toLong, sum, mn, mx, bytes.length.toLong)
      }
    }.toDF("asset_id", "width", "height", "n_pixels",
        "sum_lum", "min_lum", "max_lum", "n_bytes")
      .withColumn("mean_lum_x1000",
        expr("sum_lum * 1000 div n_pixels"))
      .drop("n_bytes") // sanity field for local debugging, not oracled
      .orderBy("asset_id")
  }

  /** Fill a (wb × hb)-block 8×8-aligned grayscale raster where block
    * (bx, by) is the constant `value(bx, by)` — the shared synthesis
    * kernel of the JPEG/MJPEG decode tiers (constant blocks are the
    * family where the lossy DCT pipeline is provably lossless; each
    * tier's closed-form oracle restates the same (wb, hb, value)
    * parameterization).
    */
  private def constBlockRaster(wb: Int, hb: Int)(
      value: (Int, Int) => Byte): Array[Byte] = {
    val w = wb * 8
    val px = new Array[Byte](w * hb * 8)
    var by = 0
    while (by < hb) {
      var bx = 0
      while (bx < wb) {
        val v = value(bx, by)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            px((by * 8 + y) * w + bx * 8 + x) = v
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    px
  }

  /** Registered COMPRESSED-AUDIO metadata tier (round 8): every
    * audio-slice asset gets a real MPEG-1 Layer III frame sequence —
    * `nf = 1 + n_chars mod 7` frames whose bitrate index cycles
    * `1 + (id + f) mod 14` with padding `(id + f) mod 2`, sampling
    * rate keyed by id, and (for even ids) a leading ID3v2.3 tag of
    * `id mod 32` body bytes — synthesized by [[Mp3Frames.frameBytes]]
    * and walked back by [[Mp3Frames.walk]] inside the partition
    * kernel. Frame count, per-frame byte lengths (the §2.4.3.1
    * `144·bitrate/rate + padding` law), bitrate sum, and exact
    * duration all come from the HEADERS, which is precisely what a
    * corpus pipeline reads from compressed audio; sample decode
    * (Huffman spectrum + IMDCT) stays the documented stub boundary.
    * The oracle restates every output in closed form from the row
    * attributes, so a hash match proves the synth→tag-skip→walk loop
    * exact on every asset.
    */
  def mmAudioMp3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1) // assets()'s audio slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val rateIdx = (id % 3).toInt
        val nf = (1 + nChars % 7).toInt
        val frames = Array.tabulate(nf) { f =>
          Mp3Frames.frameBytes(
            bitrateIdx = (1 + (id + f) % 14).toInt,
            rateIdx = rateIdx,
            padding = ((id + f) % 2).toInt)
        }
        val tag =
          if (id % 2 == 0) Mp3Frames.id3v2((id % 32).toInt)
          else Array.emptyByteArray
        val bytes = tag ++ frames.flatten
        val meta = Mp3Frames.walk(bytes)
          .getOrElse(sys.error(s"unwalkable MP3 for asset $id"))
        if (meta.frames.size != nf)
          sys.error(s"MP3 frame-count mismatch for asset $id")
        (id, nf.toLong, meta.sampleRateHz.toLong, meta.durationMs,
          meta.frames.map(_.nBytes.toLong).sum,
          meta.frames.map(_.bitrateKbps.toLong).sum,
          meta.frames.map(_.padding.toLong).sum)
      }
    }.toDF("asset_id", "n_frames", "sample_rate", "duration_ms",
        "frame_bytes", "sum_kbps", "n_padded")
      .orderBy("asset_id")
  }

  /** Closed form from the header law: frame length =
    * `144000·kbps // rate + padding` (§2.4.3.1), duration =
    * `frames·1152·1000 // rate`.
    */
  val mmAudioMp3Sql: String =
    """WITH au AS (
      |  SELECT doc_id AS asset_id,
      |    ([44100, 48000, 32000])[CAST(1 + doc_id % 3 AS INT)] AS rate,
      |    1 + n_chars % 7 AS nf
      |  FROM documents WHERE doc_id % 3 = 1),
      |fr AS (
      |  SELECT asset_id, rate, nf,
      |    unnest(generate_series(0, nf - 1)) AS f
      |  FROM au),
      |k AS (
      |  SELECT asset_id, rate, nf,
      |    ([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
      |      )[CAST(1 + (asset_id + f) % 14 AS INT)] AS kbps,
      |    (asset_id + f) % 2 AS pad
      |  FROM fr)
      |SELECT asset_id,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(rate AS BIGINT) AS sample_rate,
      |  CAST(nf * 1152 * 1000 // rate AS BIGINT) AS duration_ms,
      |  CAST(sum(144000 * kbps // rate + pad) AS BIGINT) AS frame_bytes,
      |  CAST(sum(kbps) AS BIGINT) AS sum_kbps,
      |  CAST(sum(pad) AS BIGINT) AS n_padded
      |FROM k GROUP BY asset_id, rate, nf
      |ORDER BY asset_id""".stripMargin

  /** Registered PROGRESSIVE-JPEG pixel-decode tier (round 8 —
    * retires the progressive tier of the JPEG boundary): every
    * image-slice asset gets a real SOF2 progressive JFIF JPEG —
    * constant 8×8 blocks (`wb = 1 + id mod 4` wide,
    * `hb = 1 + n_chars mod 3` high, block value
    * `(23·id + 7·bx + 19·by) mod 256`) encoded by
    * [[JpegCodec.encodeGray8Progressive]]'s three-scan script (DC at
    * Al=1, the full AC band with EOB-run batching, DC refinement)
    * and pixel-decoded back through the Annex G multi-scan decoder.
    * The flat-8 DC-exactness argument carries (the split DC passes
    * reassemble bit-for-bit), so the closed-form block-grid oracle
    * hash-proves the whole progression loop exact on every asset.
    * The JDK's own progressive scan scripts (spectral bands + AC
    * successive approximation) are pinned in `JpegCodecSpec`.
    */
  def mmImageProg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0) // assets()'s image slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val wb = (1 + id % 4).toInt
        val hb = (1 + nChars % 3).toInt
        val w = wb * 8
        val h = hb * 8
        val px = constBlockRaster(wb, hb)((bx, by) =>
          (((23L * id + 7L * bx + 19L * by) % 256).toInt & 0xff).toByte)
        val bytes = JpegCodec.encodeGray8Progressive(w, h, px, JpegCodec.flatQuant(8))
        val img = JpegCodec.decodeGray8(bytes)
          .getOrElse(sys.error(s"undecodable progressive JPEG for asset $id"))
        var sum = 0L
        var mn = 255L
        var mx = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = (img.pixels(i) & 0xff).toLong
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (id, img.width.toLong, img.height.toLong,
          img.pixels.length.toLong, sum, mn, mx)
      }
    }.toDF("asset_id", "width", "height", "n_pixels",
        "sum_lum", "min_lum", "max_lum")
      .withColumn("mean_lum_x1000", expr("sum_lum * 1000 div n_pixels"))
      .orderBy("asset_id")
  }

  /** Closed form over the block grid (the [[mmImageJpegSql]] shape
    * with the progressive query's parameterization).
    */
  val mmImageProgSql: String =
    """WITH img AS (
      |  SELECT doc_id AS asset_id,
      |    1 + doc_id % 4 AS wb, 1 + n_chars % 3 AS hb
      |  FROM documents WHERE doc_id % 3 = 0),
      |blk AS (
      |  SELECT asset_id, wb, hb,
      |    unnest(generate_series(0, wb * hb - 1)) AS i
      |  FROM img),
      |v AS (
      |  SELECT asset_id, wb, hb,
      |    (23 * asset_id + 7 * (i % wb) + 19 * (i // wb)) % 256 AS v
      |  FROM blk)
      |SELECT asset_id,
      |  CAST(wb * 8 AS BIGINT) AS width, CAST(hb * 8 AS BIGINT) AS height,
      |  CAST(wb * hb * 64 AS BIGINT) AS n_pixels,
      |  CAST(sum(v) * 64 AS BIGINT) AS sum_lum,
      |  CAST(min(v) AS BIGINT) AS min_lum,
      |  CAST(max(v) AS BIGINT) AS max_lum,
      |  CAST(sum(v) * 64 * 1000 // (wb * hb * 64) AS BIGINT) AS mean_lum_x1000
      |FROM v GROUP BY asset_id, wb, hb
      |ORDER BY asset_id""".stripMargin

  /** Registered VIDEO decode tier (round 8 — retires the video tier
    * of the decode stub at the container + Motion-JPEG level): every
    * video-slice asset gets a real single-track MJPEG MP4 —
    * `nf = 1 + id mod 5` frames of constant-8×8-block baseline JPEGs
    * (the [[mmImageJpeg]] lossless-DC construction, with the block
    * value additionally keyed by the frame index) muxed by
    * [[Mp4Codec.muxMjpeg]] with per-frame durations
    * `24 + (id + f) mod 2` ticks at timescale 600 (so the `stts`
    * run-length coder sees both single- and multi-run shapes) — and
    * the decode half demuxes the box tree back (mvhd duration, tkhd
    * dims, stsd fourcc, stts/stsc/stsz/stco sample walk), slices
    * every frame out of `mdat`, and pixel-decodes it through
    * [[JpegCodec]]. The oracle restates the decoded statistics in
    * closed form over the (frame × block) grid, so a hash match
    * proves the full mux→demux→per-frame-Huffman⁻¹→IDCT loop
    * bit-exact on every asset. Inter-frame codecs (H.264-class)
    * remain the documented boundary.
    */
  /** MP4 ancillary-metadata tier (`mm_video_meta`, round 15 — the
    * video rung of the metadata ladder beside [[mmImageMeta]] and
    * [[mmAudioMeta]]): the same MJPEG containers demuxed for their
    * BOX metadata alone — stsd fourcc, mvhd timescale/duration, tkhd
    * dims, stts sample durations — with NO frame pixel-decode
    * anywhere (the cheap container audit a 100 TB video corpus runs
    * before deciding what to transcode). The kernel additionally
    * asserts the mvhd duration equals the stts sum — the
    * cross-box consistency check a real probe (ffprobe-class) does.
    * Per-asset rowwise, no shuffle beyond the presentation sort.
    */
  def mmVideoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2) // assets()'s video slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val wb = (1 + nChars % 4).toInt
        val hb = (1 + id % 3).toInt
        val w = wb * 8
        val h = hb * 8
        val nf = (1 + id % 5).toInt
        val frames = Array.tabulate(nf) { f =>
          val px = constBlockRaster(wb, hb)((bx, by) =>
            (((17L * id + 23L * f + 5L * bx + 11L * by) % 256).toInt & 0xff).toByte)
          JpegCodec.encodeGray8(w, h, px, JpegCodec.flatQuant(8))
        }
        val durs = Array.tabulate(nf)(f => (24 + (id + f) % 2).toInt)
        val mp4 = Mp4Codec.muxMjpeg(w, h, 600, durs, frames)
        val m = Mp4Codec.demux(mp4)
          .getOrElse(sys.error(s"undemuxable MP4 for asset $id"))
        // cross-box consistency: mvhd duration == Σ stts durations
        if (m.durationTicks != m.samples.map(_.durationTicks).sum)
          sys.error(s"mvhd/stts duration mismatch for asset $id")
        (id, m.format, m.timescale, m.width.toLong, m.height.toLong,
          m.samples.size.toLong, m.durationTicks,
          m.samples.map(_.durationTicks).min,
          m.samples.map(_.durationTicks).max)
      }
    }.toDF("asset_id", "format", "timescale", "width", "height",
        "n_frames", "duration_ticks", "min_tick", "max_tick")
      .orderBy("asset_id")
  }

  /** Closed form: every container field restates a synthesis
    * attribute; per-frame ticks are 24 + (id+f) mod 2, so the min is
    * 24 unless the single frame is odd-parity, and the max is 25
    * unless every frame is even-parity.
    */
  val mmVideoMetaSql: String =
    """WITH vid AS (
      |  SELECT doc_id AS asset_id, CAST(n_chars AS BIGINT) AS n_chars,
      |    1 + doc_id % 5 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT asset_id, n_chars, nf,
      |    unnest(generate_series(0, nf - 1)) AS f
      |  FROM vid)
      |SELECT asset_id, 'jpeg' AS format, CAST(600 AS BIGINT) AS timescale,
      |  CAST((1 + n_chars % 4) * 8 AS BIGINT) AS width,
      |  CAST((1 + asset_id % 3) * 8 AS BIGINT) AS height,
      |  CAST(max(nf) AS BIGINT) AS n_frames,
      |  CAST(sum(24 + (asset_id + f) % 2) AS BIGINT) AS duration_ticks,
      |  CAST(min(24 + (asset_id + f) % 2) AS BIGINT) AS min_tick,
      |  CAST(max(24 + (asset_id + f) % 2) AS BIGINT) AS max_tick
      |FROM fr
      |GROUP BY asset_id, n_chars
      |ORDER BY asset_id""".stripMargin

  def mmVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2) // assets()'s video slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val wb = (1 + nChars % 4).toInt
        val hb = (1 + id % 3).toInt
        val w = wb * 8
        val h = hb * 8
        val nf = (1 + id % 5).toInt
        val frames = Array.tabulate(nf) { f =>
          val px = constBlockRaster(wb, hb)((bx, by) =>
            (((17L * id + 23L * f + 5L * bx + 11L * by) % 256).toInt & 0xff).toByte)
          JpegCodec.encodeGray8(w, h, px, JpegCodec.flatQuant(8))
        }
        val durs = Array.tabulate(nf)(f => (24 + (id + f) % 2).toInt)
        val mp4 = Mp4Codec.muxMjpeg(w, h, 600, durs, frames)
        val meta = Mp4Codec.demux(mp4)
          .getOrElse(sys.error(s"undemuxable MP4 for asset $id"))
        if (meta.format != "jpeg" || meta.width != w || meta.height != h ||
          meta.samples.size != nf)
          sys.error(s"MP4 metadata mismatch for asset $id")
        var sum = 0L
        var mn = 255L
        var mx = 0L
        for (s <- meta.samples) {
          val fb = java.util.Arrays.copyOfRange(
            mp4, s.offset.toInt, (s.offset + s.size).toInt)
          val img = JpegCodec.decodeGray8(fb)
            .getOrElse(sys.error(s"undecodable MJPEG frame for asset $id"))
          var i = 0
          while (i < img.pixels.length) {
            val v = (img.pixels(i) & 0xff).toLong
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            i += 1
          }
        }
        (id, nf.toLong, w.toLong, h.toLong, meta.durationTicks,
          nf.toLong * w * h, sum, mn, mx)
      }
    }.toDF("asset_id", "n_frames", "width", "height", "duration_ticks",
        "n_pixels", "sum_lum", "min_lum", "max_lum")
      .withColumn("duration_ms", expr("duration_ticks * 1000 div 600"))
      .withColumn("mean_lum_x1000", expr("sum_lum * 1000 div n_pixels"))
      .orderBy("asset_id")
  }

  /** Closed form over the (frame × block) grid: each 8×8 block
    * contributes 64 identical pixels; the container fields restate
    * the synthesis parameters (Σ per-frame tick durations, tkhd
    * dims, sample count).
    */
  val mmVideoSql: String =
    """WITH vid AS (
      |  SELECT doc_id AS asset_id,
      |    1 + n_chars % 4 AS wb, 1 + doc_id % 3 AS hb,
      |    1 + doc_id % 5 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (
      |  SELECT asset_id, wb, hb, nf,
      |    unnest(generate_series(0, nf - 1)) AS f
      |  FROM vid),
      |dur AS (
      |  SELECT asset_id, SUM(24 + (asset_id + f) % 2) AS ticks
      |  FROM fr GROUP BY asset_id),
      |blk AS (
      |  SELECT asset_id, wb, hb, nf, f,
      |    unnest(generate_series(0, wb * hb - 1)) AS i
      |  FROM fr),
      |v AS (
      |  SELECT asset_id, wb, hb, nf,
      |    (17 * asset_id + 23 * f + 5 * (i % wb) + 11 * (i // wb)) % 256 AS v
      |  FROM blk)
      |SELECT v.asset_id,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(wb * 8 AS BIGINT) AS width,
      |  CAST(hb * 8 AS BIGINT) AS height,
      |  CAST(ticks AS BIGINT) AS duration_ticks,
      |  CAST(nf * wb * hb * 64 AS BIGINT) AS n_pixels,
      |  CAST(sum(v.v) * 64 AS BIGINT) AS sum_lum,
      |  CAST(min(v.v) AS BIGINT) AS min_lum,
      |  CAST(max(v.v) AS BIGINT) AS max_lum,
      |  CAST(ticks * 1000 // 600 AS BIGINT) AS duration_ms,
      |  CAST(sum(v.v) * 64 * 1000 // (nf * wb * hb * 64) AS BIGINT)
      |    AS mean_lum_x1000
      |FROM v JOIN dur ON v.asset_id = dur.asset_id
      |GROUP BY v.asset_id, wb, hb, nf, ticks
      |ORDER BY v.asset_id""".stripMargin

  /** Closed form over the BLOCK grid (each 8×8 block contributes 64
    * identical pixels, so sum = 64·Σv and min/max range over block
    * values).
    */
  val mmImageJpegSql: String =
    """WITH img AS (
      |  SELECT doc_id AS asset_id,
      |    1 + n_chars % 4 AS wb, 1 + doc_id % 3 AS hb
      |  FROM documents WHERE doc_id % 3 = 0),
      |blk AS (
      |  SELECT asset_id, wb, hb,
      |    unnest(generate_series(0, wb * hb - 1)) AS i
      |  FROM img),
      |v AS (
      |  SELECT asset_id, wb, hb,
      |    (17 * asset_id + 5 * (i % wb) + 11 * (i // wb)) % 256 AS v
      |  FROM blk)
      |SELECT asset_id,
      |  CAST(wb * 8 AS BIGINT) AS width, CAST(hb * 8 AS BIGINT) AS height,
      |  CAST(wb * hb * 64 AS BIGINT) AS n_pixels,
      |  CAST(sum(v) * 64 AS BIGINT) AS sum_lum,
      |  CAST(min(v) AS BIGINT) AS min_lum,
      |  CAST(max(v) AS BIGINT) AS max_lum,
      |  CAST(sum(v) * 64 * 1000 // (wb * hb * 64) AS BIGINT) AS mean_lum_x1000
      |FROM v GROUP BY asset_id, wb, hb
      |ORDER BY asset_id""".stripMargin

  /** Closed form of the synthetic raster: pixel index i has
    * x = i mod w, y = i div w.
    */
  val mmImageSql: String =
    """WITH img AS (
      |  SELECT doc_id AS asset_id,
      |    1 + n_chars % 32 AS w, 1 + doc_id % 24 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT asset_id, w, h,
      |    unnest(generate_series(0, w * h - 1)) AS i
      |  FROM img),
      |v AS (
      |  SELECT asset_id, w, h,
      |    (asset_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256 AS v
      |  FROM px)
      |SELECT asset_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(sum(v) AS BIGINT) AS sum_lum,
      |  CAST(min(v) AS BIGINT) AS min_lum,
      |  CAST(max(v) AS BIGINT) AS max_lum,
      |  CAST(sum(v) * 1000 // (w * h) AS BIGINT) AS mean_lum_x1000
      |FROM v GROUP BY asset_id, w, h
      |ORDER BY asset_id""".stripMargin

  /** Perceptual average-hash extraction (`mm_image_phash`, round 15 —
    * the image near-dup FINGERPRINT tier): each image-slice asset's
    * PNG is synthesized, FULLY pixel-decoded through [[PngCodec]],
    * and reduced to the classic 8×8 aHash — pixels bucket into an
    * 8×8 cell grid (`cx = x·8 div w`), a cell's bit is 1 iff its
    * mean exceeds the global mean, compared INTEGER-exactly by
    * cross-multiplying (`s_c·N > S·n_c`, no float mean), and the 64
    * bits release as two 32-bit BIGINT halves (row-major, hi = rows
    * 0–3). Cells empty under tiny widths carry bit 0, documented.
    * This is the standard pHash-family fingerprint an image-dedup
    * pipeline banks per asset; the closed-form oracle recomputes the
    * raster AND the hash, so the gate proves decode + binning +
    * thresholding bit-exact per asset. Rowwise kernel, no shuffle
    * beyond the presentation sort.
    */
  def mmImagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = graft.sources.Tables.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0) // assets()'s image slice
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { it =>
      it.map { case (id, nChars) =>
        val w = (1 + nChars % 32).toInt
        val h = (1 + id % 24).toInt
        val px = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) = (((id * 31 + 7L * x + 13L * y) % 256).toInt & 0xff).toByte
            x += 1
          }
          y += 1
        }
        val bytes = PngCodec.encodeGray8(w, h, px, filterOfRow = r => r % 5)
        val img = PngCodec.decodeGray8(bytes)
          .getOrElse(sys.error(s"undecodable PNG for asset $id"))
        val cellN = new Array[Long](64)
        val cellS = new Array[Long](64)
        var total = 0L
        var i = 0
        while (i < img.pixels.length) {
          val x = i % w; val yy = i / w
          val c = (yy * 8 / h) * 8 + (x * 8 / w)
          val v = (img.pixels(i) & 0xff).toLong
          cellN(c) += 1; cellS(c) += v; total += v
          i += 1
        }
        val n = (w * h).toLong
        var hi = 0L; var lo = 0L; var filled = 0L
        var c = 0
        while (c < 64) {
          if (cellN(c) > 0) filled += 1
          val bit = if (cellS(c) * n > total * cellN(c)) 1L else 0L
          if (c < 32) hi |= bit << c else lo |= bit << (c - 32)
          c += 1
        }
        (id, w.toLong, h.toLong, filled, hi, lo)
      }
    }.toDF("asset_id", "width", "height", "n_filled_cells",
        "hash_hi", "hash_lo")
      .orderBy("asset_id")
  }

  val mmImagePhashSql: String =
    """WITH img AS (
      |  SELECT doc_id AS asset_id,
      |    1 + n_chars % 32 AS w, 1 + doc_id % 24 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT asset_id, w, h,
      |    unnest(generate_series(0, w * h - 1)) AS i
      |  FROM img),
      |v AS (
      |  SELECT asset_id, w, h,
      |    ((i // w) * 8 // h) * 8 + ((i % w) * 8 // w) AS c,
      |    (asset_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256 AS v
      |  FROM px),
      |cell AS (
      |  SELECT asset_id, w, h, c,
      |    count(*) AS n_c, CAST(sum(v) AS BIGINT) AS s_c
      |  FROM v GROUP BY 1, 2, 3, 4),
      |tot AS (
      |  SELECT asset_id, CAST(sum(s_c) AS BIGINT) AS s,
      |    CAST(sum(n_c) AS BIGINT) AS n
      |  FROM cell GROUP BY 1),
      |bits AS (
      |  SELECT cell.asset_id, w, h, c, n_c,
      |    CASE WHEN s_c * n > s * n_c THEN 1 ELSE 0 END AS bit
      |  FROM cell JOIN tot ON tot.asset_id = cell.asset_id)
      |SELECT asset_id, CAST(max(w) AS BIGINT) AS width,
      |  CAST(max(h) AS BIGINT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_filled_cells,
      |  CAST(sum(CASE WHEN c < 32 THEN bit * (CAST(1 AS BIGINT) << c)
      |           ELSE 0 END) AS BIGINT) AS hash_hi,
      |  CAST(sum(CASE WHEN c >= 32 THEN bit * (CAST(1 AS BIGINT) << (c - 32))
      |           ELSE 0 END) AS BIGINT) AS hash_lo
      |FROM bits GROUP BY asset_id
      |ORDER BY asset_id""".stripMargin

  val mmAudioSql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
      |  CAST(n_chars AS BIGINT) AS n_samples,
      |  CAST(n_chars * 1000 // (8000 + (doc_id % 4) * 4000) AS BIGINT)
      |    AS duration_ms
      |FROM documents WHERE doc_id % 3 = 1 ORDER BY asset_id""".stripMargin

  val mmFramesSql: String =
    """WITH v AS (
      |  SELECT doc_id AS asset_id, text,
      |         length(text) AS n_chars,
      |         greatest(1, length(text) // 8) AS stride
      |  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
      |f AS (
      |  SELECT asset_id, text, stride,
      |         unnest(generate_series(0, least(7, (n_chars - 1) // stride))) AS frame_idx
      |  FROM v)
      |SELECT asset_id, frame_idx, frame_idx * stride AS char_off,
      |       CAST(unicode(substr(text, CAST(frame_idx * stride + 1 AS INT), 1)) AS BIGINT) AS lead_cp
      |FROM f ORDER BY asset_id, frame_idx""".stripMargin
}
