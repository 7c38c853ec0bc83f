package graft.sources.pdf

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

import scala.collection.mutable

/** Synthetic in-test PDF builders — no library involved, so the
  * parser under test is validated against independently hand-written
  * file structure: classic xref tables, FlateDecode content, and
  * PDF 1.5 xref streams with object streams + PNG Up predictor.
  */
object PdfFixtures {

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Escape a text line into a PDF literal string body. */
  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  /** Standard content stream showing each line with T* between. */
  def contentFor(pageText: String): String = {
    val lines = pageText.split("\n", -1)
    val shows = lines.map(l => s"(${esc(l)}) Tj").mkString(" T*\n")
    s"BT\n/F1 12 Tf\n72 720 Td\n$shows\nET"
  }

  private final class Out {
    val bytes = new ByteArrayOutputStream()
    val offsets = mutable.LinkedHashMap.empty[Int, Int]
    def <<(s: String): Unit = bytes.write(s.getBytes(Ascii))
    def <<(b: Array[Byte]): Unit = bytes.write(b)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = bytes.size()
      this << s"$num 0 obj\n"
      body
      this << "\nendobj\n"
    }
    def streamObj(num: Int, dictExtra: String, payload: Array[Byte]): Unit =
      obj(num) {
        this << s"<< /Length ${payload.length} $dictExtra >>\nstream\n"
        this << payload
        this << "\nendstream"
      }
  }

  /** Classic-xref PDF: one content stream per page, optionally
    * FlateDecode-compressed. Object layout: 1 catalog, 2 pages node,
    * 2i+1/2i+2 per page (page, content), last = font.
    */
  def classicPdf(pages: Seq[String], compress: Boolean = false): Array[Byte] = {
    val o = new Out
    o << "%PDF-1.4\n%âãÏÓ\n"
    val n = pages.length
    val pageNums = (0 until n).map(i => 3 + 2 * i)
    val fontNum = 3 + 2 * n
    o.obj(1) { o << "<< /Type /Catalog /Pages 2 0 R >>" }
    o.obj(2) {
      o << s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] /Count $n >>"
    }
    for ((text, i) <- pages.zipWithIndex) {
      val pn = 3 + 2 * i
      o.obj(pn) {
        o << s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents ${pn + 1} 0 R >>"
      }
      val raw = contentFor(text).getBytes(Ascii)
      if (compress)
        o.streamObj(pn + 1, "/Filter /FlateDecode", deflate(raw))
      else
        o.streamObj(pn + 1, "", raw)
    }
    o.obj(fontNum) { o << "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>" }
    // classic xref table
    val xrefOff = o.bytes.size()
    val maxNum = fontNum
    o << s"xref\n0 ${maxNum + 1}\n"
    o << "0000000000 65535 f \n"
    for (num <- 1 to maxNum) o << f"${o.offsets(num)}%010d 00000 n \n"
    o << s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
    o.bytes.toByteArray
  }

  /** PDF 1.5 structure: page tree + font packed into an object
    * stream (type-2 xref entries), content streams as regular
    * objects, and a FlateDecode + PNG-Up-predictor xref STREAM
    * instead of a table.
    */
  def xrefStreamPdf(pages: Seq[String]): Array[Byte] = {
    val o = new Out
    o << "%PDF-1.5\n%âãÏÓ\n"
    val n = pages.length
    val pageNums = (0 until n).map(i => 3 + i)
    val contentNums = (0 until n).map(i => 3 + n + i)
    val fontNum = 3 + 2 * n
    val objStmNum = fontNum + 1
    val xrefNum = objStmNum + 1

    o.obj(1) { o << "<< /Type /Catalog /Pages 2 0 R >>" }
    for ((text, i) <- pages.zipWithIndex) {
      val raw = contentFor(text).getBytes(Ascii)
      o.streamObj(contentNums(i), "/Filter /FlateDecode", deflate(raw))
    }
    // object stream holding: pages node (2), page dicts, font
    val inStm: Seq[(Int, String)] =
      (2 -> s"<< /Type /Pages /Kids [${pageNums.map(p => s"$p 0 R").mkString(" ")}] /Count $n >>") +:
      pages.indices.map { i =>
        pageNums(i) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontNum 0 R >> >> /Contents ${contentNums(i)} 0 R >>")
      } :+
      (fontNum -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val bodies = inStm.map(_._2.getBytes(Ascii))
    val rels = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = inStm.zip(rels).map { case ((num, _), r) => s"$num $r" }.mkString(" ") + "\n"
    val stmPayload = header.getBytes(Ascii) ++
      bodies.flatMap(b => b :+ '\n'.toByte)
    o.streamObj(objStmNum,
      s"/Type /ObjStm /N ${inStm.length} /First ${header.length} /Filter /FlateDecode",
      deflate(stmPayload))

    // xref stream: W [1 4 2], rows for objects 0..xrefNum
    val size = xrefNum + 1
    val xrefOff = o.bytes.size()
    def row(t: Int, f2: Long, f3: Int): Array[Byte] =
      Array[Byte](t.toByte,
        ((f2 >> 24) & 0xff).toByte, ((f2 >> 16) & 0xff).toByte,
        ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val stmIndex = inStm.map(_._1).zipWithIndex.toMap
    val rows: Seq[Array[Byte]] = (0 until size).map { num =>
      if (num == 0) row(0, 0, 65535)
      else if (stmIndex.contains(num)) row(2, objStmNum, stmIndex(num))
      else if (num == xrefNum) row(1, xrefOff, 0)
      else row(1, o.offsets(num), 0)
    }
    // PNG Up predictor over 7-byte rows
    val cols = 7
    val encoded = new ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    for (r <- rows) {
      encoded.write(2) // Up
      val e = new Array[Byte](cols)
      for (i <- 0 until cols) e(i) = ((r(i) - prev(i)) & 0xff).toByte
      encoded.write(e)
      prev = r
    }
    o.streamObj(xrefNum,
      s"/Type /XRef /Size $size /W [1 4 2] /Index [0 $size] /Root 1 0 R " +
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>",
      deflate(encoded.toByteArray))
    o << s"startxref\n$xrefOff\n%%EOF\n"
    o.bytes.toByteArray
  }
}
