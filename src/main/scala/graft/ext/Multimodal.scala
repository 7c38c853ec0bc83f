package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines (north star):
  * image/audio/video as opaque `binary` columns with typed metadata.
  *
  * No media codecs ship in this offline environment, so the *decode*
  * step is a clearly-marked deterministic STUB behind
  * [[MediaDecoder]]; everything Spark-side — binary column handling,
  * schema, partitioned decode via `mapPartitions`, deterministic
  * frame sampling, digest/size metadata — is real and oracle-/test-
  * covered. Swapping [[StubDecoder]] for a JNI/ffmpeg-backed
  * implementation changes no plan shape: the decode runs
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
      decoder: MediaDecoder = StubDecoder): Dataset[Decoded] = {
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
