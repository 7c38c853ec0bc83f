package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SourceFormatsSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("jsonl/csv/orc/xml roundtrips equal the parquet-direct fingerprint") {
    val expected = SourceFormats
      .fingerprinted(Tables.table(spark, dir, "documents"))
      .collect().map(_.toString).toSeq
    assert(expected.nonEmpty)
    for ((name, q) <- Seq(
        "jsonl" -> SourceFormats.sourceJsonl _,
        "csv" -> SourceFormats.sourceCsv _,
        "orc" -> SourceFormats.sourceOrc _,
        "xml" -> SourceFormats.sourceXml _)) {
      val got = q(spark, dir).collect().map(_.toString).toSeq
      assert(got == expected, s"$name roundtrip drifted")
    }
  }

  test("the xor fingerprint detects a single-character corruption") {
    val docs = Tables.table(spark, dir, "documents")
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 3L, concat(col("text"), lit("x")))
        .otherwise(col("text")))
    val a = SourceFormats.fingerprinted(docs).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    val b = SourceFormats.fingerprinted(corrupted).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    val changed = a.keySet.filter(k => a(k) != b(k))
    assert(changed.size == 1, s"exactly one source should drift: $changed")
  }
}
