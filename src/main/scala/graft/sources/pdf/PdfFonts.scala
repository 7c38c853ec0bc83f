package graft.sources.pdf

import scala.collection.mutable

/** Font-aware string decoding (ISO 32000 §9): the bytes of a shown
  * string are CHARACTER CODES whose meaning depends on the font the
  * `Tf` operator selected. Two decoding tiers:
  *
  *   - `/ToUnicode` CMap present (the reliable path for both simple
  *     and composite fonts — it is exactly what pypdf extracts text
  *     through, `/root/reference/pdf_reader.py:442-443`): codes map
  *     through the embedded bfchar/bfrange tables to UTF-16BE
  *     Unicode. Type0 (CID) fonts use 2-byte codes under Identity-H —
  *     the encoding produced by LaTeX, Word, and Chrome print.
  *   - no CMap: simple fonts fall back to the byte≈Latin-1 heuristic
  *     ([[PdfTextExtractor.decodeText]]); a Type0 font without
  *     ToUnicode yields no text (its codes are font-internal glyph
  *     ids — emitting them as chars would silently corrupt the size
  *     ratios the tool computes; documented scope).
  */
private[pdf] sealed trait GlyphDecoder {
  def decode(bytes: Array[Byte]): String
}

/** BOM-sniffing simple-font default (the pre-font-tracking behavior). */
private[pdf] case object DefaultGlyphDecoder extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String = PdfTextExtractor.decodeText(bytes)
}

/** Code→Unicode table decoder. `codeBytes` is 1 (simple fonts) or 2
  * (CID fonts under Identity-H). Unmapped 1-byte codes fall back to
  * Latin-1 (partial CMaps are common); unmapped 2-byte codes are
  * dropped (glyph ids carry no recoverable character identity).
  */
private[pdf] final case class CMapGlyphDecoder(
    codeBytes: Int, map: Map[Int, String]) extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + codeBytes <= bytes.length) {
      val code =
        if (codeBytes == 2) ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        else bytes(i) & 0xff
      map.get(code) match {
        case Some(s) => sb ++= s
        case None => if (codeBytes == 1) sb += code.toChar
      }
      i += codeBytes
    }
    sb.toString
  }
}

/** A Type0 font whose codes cannot be mapped back to text. */
private[pdf] case object OpaqueGlyphDecoder extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String = ""
}

private[pdf] object PdfFonts {

  /** Resource-name → decoder for every font in a page's
    * `/Resources /Font` dict. Per-font failures degrade to the
    * default decoder — a broken CMap must not fail the page.
    */
  def forPage(doc: PdfDocument, resources: Option[PDict]): Map[String, GlyphDecoder] = {
    val fontDict = resources
      .flatMap(r => r.get("Font"))
      .flatMap(doc.resolveDict)
    fontDict.fold(Map.empty[String, GlyphDecoder]) { fd =>
      fd.entries.flatMap { case (name, fontRef) =>
        doc.resolveDict(fontRef).map { font =>
          // a Type0 font whose CMap is corrupt must degrade to NO
          // text, not to the Latin-1 heuristic — 2-byte glyph ids
          // rendered as byte pairs would silently corrupt the size
          // ratios this tool exists to compute
          val isType0 =
            try doc.resolve(font.get("Subtype").getOrElse(PNull)) == PName("Type0")
            catch { case scala.util.control.NonFatal(_) => false }
          name -> (try decoderFor(doc, font, isType0) catch {
            case scala.util.control.NonFatal(_) =>
              if (isType0) OpaqueGlyphDecoder else DefaultGlyphDecoder
          })
        }
      }
    }
  }

  private def decoderFor(doc: PdfDocument, font: PDict, isType0: Boolean): GlyphDecoder = {
    doc.resolve(font.get("ToUnicode").getOrElse(PNull)) match {
      case s: PStream =>
        val (srcBytes, map) = parseToUnicode(doc.decodeStream(s))
        // a Type0 font is 2-byte under Identity-H even if the CMap's
        // codespace declaration is missing or malformed
        val width = if (isType0) math.max(srcBytes, 2) else srcBytes
        CMapGlyphDecoder(width, map)
      case _ =>
        if (isType0) OpaqueGlyphDecoder else DefaultGlyphDecoder
    }
  }

  /** Parse a ToUnicode CMap stream (§9.10.3): collect
    * `begincodespacerange` source widths, `beginbfchar` single
    * mappings, and `beginbfrange` runs (destination either a start
    * string incremented per code, or an explicit array). Destination
    * hex strings are UTF-16BE. Returns (source code width in bytes,
    * code→string map).
    */
  def parseToUnicode(bytes: Array[Byte]): (Int, Map[Int, String]) = {
    val lx = new PdfLexer(bytes)
    val map = mutable.Map.empty[Int, String]
    var srcBytes = 0

    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      var i = 0
      while (i < b.length && i < 4) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    /** dst string for `lo + off` in a bfrange: the destination is
      * treated as a big-endian number and incremented (§9.10.3 — the
      * usual consecutive-codepoint run).
      */
    def incremented(dst: Array[Byte], off: Int): String = {
      val out = dst.clone()
      var carry = off
      var i = out.length - 1
      while (i >= 0 && carry != 0) {
        val v = (out(i) & 0xff) + carry
        out(i) = (v & 0xff).toByte
        carry = v >> 8
        i -= 1
      }
      utf16(out)
    }
    /** Values until the closing keyword; tolerate malformed tails.
      * Any byte that neither starts a value nor a keyword (stray
      * delimiters — readToken() returns "" without advancing on
      * those) is skipped one byte at a time, so a corrupt CMap can
      * never livelock the scan task.
      */
    def block(end: String)(handle: Vector[PdfObj] => Unit): Unit = {
      val items = Vector.newBuilder[PdfObj]
      var go = true
      while (go) {
        lx.skipWs()
        if (lx.atEnd) go = false
        else if (lx.peek == '<' || lx.peek == '[') items += lx.parseValue(allowRefs = false)
        else if (!lx.isRegular(lx.peek)) lx.pos += 1 // stray delimiter
        else { if (lx.readToken() != end) () /* stray keyword: skip */ else go = false }
      }
      handle(items.result())
    }

    while ({ lx.skipWs(); !lx.atEnd }) {
      val c = lx.peek
      if (c == '/' || c == '(' || c == '[' || c == '<' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        lx.parseValue(allowRefs = false) // operand (counts, names, dicts): ignored
        ()
      } else if (!lx.isRegular(c)) {
        lx.pos += 1 // stray delimiter: skip, never livelock
      } else lx.readToken() match {
        case "begincodespacerange" =>
          block("endcodespacerange") { items =>
            items.foreach {
              case PStr(b) => srcBytes = math.max(srcBytes, b.length)
              case _ => ()
            }
          }
        case "beginbfchar" =>
          block("endbfchar") { items =>
            items.grouped(2).foreach {
              case Vector(PStr(src), PStr(dst)) =>
                srcBytes = math.max(srcBytes, src.length)
                map(codeOf(src)) = utf16(dst)
              case _ => ()
            }
          }
        case "beginbfrange" =>
          block("endbfrange") { items =>
            items.grouped(3).foreach {
              case Vector(PStr(lo), PStr(hi), dstObj) =>
                srcBytes = math.max(srcBytes, lo.length)
                val loC = codeOf(lo)
                val hiC = codeOf(hi)
                // runaway guard: a corrupt range must not allocate 4B entries
                if (hiC >= loC && hiC - loC <= 65535) dstObj match {
                  case PStr(dst) =>
                    for (off <- 0 to (hiC - loC)) map(loC + off) = incremented(dst, off)
                  case PArr(dsts) =>
                    dsts.zipWithIndex.foreach {
                      case (PStr(d), off) if loC + off <= hiC => map(loC + off) = utf16(d)
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          }
        case _ => () // begincmap / def / findresource / ...: structure noise
      }
    }
    (math.max(1, math.min(srcBytes, 2)), map.toMap)
  }
}
