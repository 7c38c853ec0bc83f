package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Normalize

/** Edge cases for the end-to-end `pdf_chunk_stats` gate query that
  * the driver corpus (plain ASCII prose) never exercises: literal-
  * string escaping, whitespace-only pages (chunk dropped, page
  * kept), blank-line normalization, the `\\uXXXX` drop rule, and the
  * six-variant writer cycle including all three encryption families.
  */
class PdfCorpusSpec extends AnyFunSuite with SparkTestBase {

  private def miniCorpus(texts: Seq[String]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pdfcorpus").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** The oracle's closed form, in Scala: (pages, chunks, text_size). */
  private def expected(text: String): (Long, Long, Long) = {
    val pages = text.grouped(PdfCorpus.PageChars).toSeq
    val stripped = pages.map(_.strip())
    (pages.size.toLong,
      stripped.count(_.nonEmpty).toLong,
      stripped.filter(_.nonEmpty).map(s => Normalize.normalize(s).length.toLong).sum)
  }

  test("six-variant synthesis round-trips bit-exact through the full pipeline") {
    // one text per variant (ids 0..5 cycle the writers), each with a
    // hostile payload: parens/backslashes (escaping), a whitespace-only
    // middle page, blank-line runs, a literal \\uXXXX token, digits
    val texts = Seq(
      "plain (classic) with \\ backslash and (nested (parens)) " + "a" * 300,
      "flate variant\n\nwith blank\n\n\nline runs " + "b" * 250,
      "objstm variant with a literal \\u0041 escape token " + "c" * 250,
      "rc4 " + "d" * 150 + " " * 250 + "e" * 100, // whitespace-only page 1
      "aes128 variant (mixed) 0123456789 " + "f" * 400,
      "aes256 variant final ) stray paren " + "g" * 500)
    val dir = miniCorpus(texts)
    val rows = PdfCorpus.pdfChunkStats(spark, dir).collect()
    assert(rows.length == 7, "6 docs + SUM TOTAL")
    val byPath = rows.map(r => r.getString(0) -> r).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val r = byPath(i.toString)
      val (pg, ch, ts) = expected(t)
      assert(r.getLong(1) == i % 6, s"variant of doc $i")
      assert(r.getLong(2) == pg, s"pages of doc $i")
      assert(r.getLong(3) == ch, s"chunks of doc $i")
      assert(r.getLong(4) == ts, s"text_size of doc $i")
      assert(r.getLong(5) == 0L, s"unmapped_fonts of doc $i")
      // the bit-exactness claim: extracted page concat == source text
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(r.getString(6) == md5, s"text_md5 of doc $i")
    }
    // the whitespace-only page drops its chunk but keeps its page
    val ws = byPath("3")
    assert(ws.getLong(2) == 3L && ws.getLong(3) == 2L,
      "doc 3: 3 pages, 2 chunks (middle page whitespace-only)")
    val total = byPath("SUM TOTAL")
    assert(total.getLong(2) == texts.map(expected(_)._1).sum)
    assert(total.getLong(3) == texts.map(expected(_)._2).sum)
    assert(total.getLong(4) == texts.map(expected(_)._3).sum)
    assert(total.isNullAt(6), "total row has no md5")
  }

  test("CJK alphabet: every ideograph is a 2-byte round-trip in every variant charset") {
    // The property the pdf_cjk_stats oracle RESTS on: the writer's
    // charset encode followed by the extractor's CharsetGlyphDecoder
    // must be the identity on the derived alphabet, in every variant
    // family. 2 bytes each also guarantees the DBCS (not ASCII-row)
    // ranges are what the gate exercises.
    assert(PdfCorpus.CjkAlphabet.length == 26)
    assert(PdfCorpus.CjkAlphabet.toSet.size == 26, "bijection: distinct images")
    for ((_, cs) <- PdfCorpus.CjkVariants; c <- PdfCorpus.CjkAlphabet) {
      val b = c.toString.getBytes(cs)
      assert(b.length == 2, f"$c%c (U+${c.toInt}%04X) must be 2 bytes in $cs")
      assert(new String(b, cs) == c.toString,
        f"$c%c (U+${c.toInt}%04X) must round-trip through $cs")
    }
  }

  test("ten-variant CJK synthesis round-trips DBCS text bit-exact") {
    // one text per CMap variant (ids 0..9): mixed-case + digits keep
    // the 1-byte ASCII row in play, lowercase becomes 2-byte DBCS
    val texts = Seq(
      "gbk simplified (Horizontal) 0123 " + "a" * 300,
      "eten big5 Vertical\n\nwith blank lines " + "b" * 250,
      "rksj shift-jis variant " + " " * 250 + "c" * 150, // whitespace-only page
      "ksc euc-kr Vertical variant " + "d" * 400,
      "uhc Half-Width 949 row 456 " + "e" * 350, // KSCms-UHC-HW-H (r11)
      "uhc half-width Vertical 789 " + "f" * 320, // KSCms-UHC-HW-V (r12)
      "gb18030 2k Vertical variant 13 " + "g" * 280, // GBK2K-V (r13)
      "euc-jp japan1 Horizontal 14 " + "h" * 260, // EUC-H (r14)
      "hkscs big5 cns1 Horizontal 15 " + "i" * 240, // HKscs-B5-H (r15)
      "euc-tw cns 11643 plane 1 row 16 " + "j" * 220) // CNS-EUC-H (r15 s2)
    val dir = miniCorpus(texts)
    val rows = PdfCorpus.pdfCjkStats(spark, dir).collect()
    assert(rows.length == 11, "10 docs + SUM TOTAL")
    val byPath = rows.map(r => r.getString(0) -> r).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val derived = PdfCorpus.toCjk(t)
      assert(derived.length == t.length, "translate preserves length")
      val r = byPath(i.toString)
      val (pg, ch, ts) = expected(derived)
      assert(r.getLong(1) == i % PdfCorpus.CjkVariants.length,
        s"variant of doc $i")
      assert(r.getLong(2) == pg, s"pages of doc $i")
      assert(r.getLong(3) == ch, s"chunks of doc $i")
      assert(r.getLong(4) == ts, s"text_size of doc $i")
      assert(r.getLong(5) == 0L,
        s"unmapped_fonts of doc $i: the charset tier must DECODE, not drop")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(derived.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(r.getString(6) == md5, s"text_md5 of doc $i (bit-exact DBCS loop)")
    }
    // the SUM TOTAL row pins unmapped_fonts == 0 corpus-wide: a font
    // falling through to OpaqueGlyphDecoder anywhere fails the gate
    // (VERDICT r10 ask #5), it does not just increment telemetry
    assert(byPath("SUM TOTAL").getLong(5) == 0L,
      "corpus-wide unmapped_fonts must be 0")
  }

  test("synthesis is deterministic and the assets publish once per corpus state") {
    val dir = miniCorpus(Seq("determinism probe " + "x" * 250))
    val a = PdfCorpus.ensureAssets(spark, dir)
    val bytes1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(a).getPath, "doc0.pdf"))
    val b = PdfCorpus.ensureAssets(spark, dir) // second call: memo hit
    assert(a == b)
    val bytes2 = PdfCorpus.synthesize(0L, "determinism probe " + "x" * 250)
    assert(java.util.Arrays.equals(bytes1, bytes2),
      "published file bytes == direct synthesis bytes")
  }
}
