package graft.sources.pdf

import graft.sources.PageExtractor

/** Content-stream text extraction: interpret the text-showing subset
  * of the PDF content operator language (BT/ET blocks; Tj, TJ, ' and
  * " shows; the line-move operators Td, TD, "T star" and Tm become
  * newlines) and decode string payloads (UTF-16BE when BOM-prefixed,
  * Latin-1 otherwise — the simple-font case; CID/ToUnicode CMaps are
  * out of scope for this minimal codec and documented as such).
  *
  * This closes SURVEY.md §2.1 S3 for native `.pdf` bytes — the one
  * capability round 1 stubbed (`/root/reference/pdf_reader.py:442-443`
  * via pypdf; VERDICT r1 task 2) — with zero new dependencies:
  * FlateDecode rides on `java.util.zip.Inflater`.
  */
object PdfTextExtractor extends PageExtractor {

  /** One entry per page, in document page order. A file that fails to
    * parse as PDF yields no pages (the scan skips it, mirroring the
    * reference's per-file error handling, `pdf_reader.py:567-575`).
    */
  def extract(path: String, bytes: Array[Byte]): Seq[(Int, String)] =
    try {
      val doc = new PdfDocument(bytes)
      doc.pages.zipWithIndex.map { case (page, i) =>
        val text = try extractText(doc.pageContent(page)) catch {
          case scala.util.control.NonFatal(_) => ""
        }
        (i, text)
      }
    } catch {
      // any malformation (parse errors, corrupt flate data, bad
      // lengths/indices) skips the file — never fails the scan task
      case scala.util.control.NonFatal(_) => Nil
    }

  /** Walk one decoded content stream, collecting shown text. */
  private[pdf] def extractText(content: Array[Byte]): String = {
    val lx = new PdfLexer(content)
    val sb = new StringBuilder
    var operands = List.empty[PdfObj]
    var shownOnLine = false

    def newline(): Unit = {
      if (shownOnLine) { sb += '\n'; shownOnLine = false }
    }
    def show(obj: PdfObj): Unit = obj match {
      case PStr(b) =>
        sb ++= decodeText(b)
        shownOnLine = true
      case _ => ()
    }

    while ({ lx.skipWs(); !lx.atEnd }) {
      val c = lx.peek
      if (c == '/' || c == '(' || c == '[' || c == '<' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        // operand (content streams have no indirect refs)
        operands = lx.parseValue(allowRefs = false) :: operands
      } else if (c == ']' || c == '}' || c == ')' || c == '>') {
        lx.pos += 1 // stray delimiter: skip defensively
      } else {
        lx.readToken() match {
          case "Tj" => operands.headOption.foreach(show)
          case "'" => newline(); operands.headOption.foreach(show)
          case "\"" => newline(); operands.headOption.foreach(show)
          case "TJ" =>
            operands.headOption.foreach {
              case PArr(items) => items.foreach(show)
              case _ => ()
            }
          case "Td" | "TD" | "T*" | "Tm" => newline()
          case "BI" =>
            // inline image: skip to EI
            val idx = lx.indexOf("EI", lx.pos)
            lx.pos = if (idx < 0) lx.length else idx + 2
          case _ => () // other operators carry no text
        }
        operands = Nil
      }
    }
    sb.toString
  }

  /** PDF text-string decoding: UTF-16BE with BOM, else Latin-1 (the
    * standard simple-font byte mapping; ASCII in practice here).
    */
  private[pdf] def decodeText(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
    else
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
}
