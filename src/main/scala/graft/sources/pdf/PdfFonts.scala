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
  *     ToUnicode decodes through [[Utf16GlyphDecoder]] when its
  *     predefined CMap family declares a Unicode code space
  *     (the Uni…-UCS2-… and Uni…-UTF16-… common CJK shapes), through
  *     [[CharsetGlyphDecoder]] when it declares a CHARSET code space
  *     (GBK-EUC-H, ETen-B5-H, 90ms-RKSJ-H, KSC-EUC-H, … — round 9),
  *     and otherwise yields no text (Identity-H codes are
  *     font-internal glyph ids — emitting raw codes as chars would
  *     silently corrupt the size ratios the tool computes).
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

/** Type0 font under a PREDEFINED CHARSET-codespace CMap (round 9,
  * VERDICT r8 ask #5): for the legacy CJK families — `GBK-EUC-H`,
  * `ETen-B5-H`, `90ms-RKSJ-H`, `KSC-EUC-H`, … — the shown string's
  * bytes are CHARSET-ENCODED TEXT (GBK / Big5 / Shift-JIS / EUC)
  * and the CMap's code→CID payload matters only for glyph
  * selection, which this tool never does. The charset decoder IS
  * the codespace walk: the Adobe CMap's codespacerange (1-byte
  * ASCII rows + 2-byte lead ranges) is by construction the byte
  * structure of the charset it encodes, so the JVM's public charset
  * decoders (GBK, Big5, windows-31j, EUC-JP/KR — spec-equivalent
  * public tables, same tier as [[PdfFonts.baseTable]]'s cp1252)
  * segment and map codes exactly. Malformed or unmappable units are
  * DROPPED (`CodingErrorAction.IGNORE`) — the no-noise contract of
  * the unmapped-code policy, never garbled bytes.
  */
private[pdf] final case class CharsetGlyphDecoder(charsetName: String)
    extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String =
    try {
      // CharsetDecoder instances are stateful/not thread-safe: one per
      // call (cheap relative to the PDF parse around it)
      val dec = java.nio.charset.Charset.forName(charsetName).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.IGNORE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.IGNORE)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case scala.util.control.NonFatal(_) => "" }
}

/** Type0 font under a PREDEFINED Unicode-codespace CMap (the
  * `Uni{JIS,GB,KS,CNS}[2004]-{UCS2,UTF16}-{H,V}` families, ISO 32000
  * §9.7.5.2 Table 118): those CMaps declare their CODE space as
  * UCS-2 / UTF-16BE, so for TEXT extraction the shown string's bytes
  * already ARE Unicode — the CMap's actual payload (code→CID) only
  * matters for glyph selection, which this tool never does. Decoding
  * is therefore a strict UTF-16BE walk with no data tables: a
  * surrogate pair appends the astral char (UTF16 variants), a LONE
  * surrogate or odd trailing byte is dropped (never garbled — the
  * unmapped-code policy of the CMap tier). This is the tier pypdf
  * serves from its bundled predefined-CMap tables; the
  * non-Unicode-codespace families (GBK-EUC-H etc.), whose codes are
  * charset bytes rather than Unicode, decode through
  * [[CharsetGlyphDecoder]] (round 9).
  */
private[pdf] case object Utf16GlyphDecoder extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i + 2 <= bytes.length) {
      val c = (((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)).toChar
      if (Character.isHighSurrogate(c) && i + 4 <= bytes.length) {
        val lo = (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)).toChar
        if (Character.isLowSurrogate(lo)) { sb += c; sb += lo; i += 4 }
        else i += 2 // lone high surrogate: drop
      } else if (Character.isSurrogate(c)) i += 2 // lone surrogate: drop
      else { sb += c; i += 2 }
    }
    sb.toString
  }
}

/** Simple-font byte→string table decoder (256 entries), built from a
  * base encoding (§D.2) with optional `/Differences` overrides.
  */
private[pdf] final case class ByteTableDecoder(table: Array[String]) extends GlyphDecoder {
  def decode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) { sb ++= table(bytes(i) & 0xff); i += 1 }
    sb.toString
  }
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
        if (isType0) {
          // predefined Unicode-codespace CMaps need no ToUnicode: the
          // codes themselves are UCS-2/UTF-16BE (see Utf16GlyphDecoder)
          val unicodeCodespace = doc.resolve(font.get("Encoding").getOrElse(PNull)) match {
            case PName(n) =>
              // Any Uni*-UCS2-*/Uni*-UTF16-* family member is a
              // Unicode-codespace CMap (ISO 32000 Table 118): the
              // registry prefix and suffix segments vary — UniJIS,
              // UniJIS2004, UniJISX0213, UniJISX02132004; -HW- half-
              // width variants; -H/-V writing modes — but the
              // -UCS2-/-UTF16- infix is what fixes the code values
              // as UCS-2/UTF-16BE, which is all the decoder needs.
              n.matches("Uni[A-Za-z0-9]+-(UCS2|UTF16)(-[A-Za-z0-9]+)*-[HV]")
            case _ => false
          }
          if (unicodeCodespace) Utf16GlyphDecoder
          else doc.resolve(font.get("Encoding").getOrElse(PNull)) match {
            // charset-codespace families (GBK-EUC-H etc.): the codes
            // are charset bytes — decode them as such (round 9; the
            // former opaque-no-noise fallback now extracts real text,
            // and `unmapped_fonts` keeps counting whatever remains)
            case PName(n) =>
              charsetFor(n)
                .filter(java.nio.charset.Charset.isSupported)
                .map(CharsetGlyphDecoder.apply)
                .getOrElse(OpaqueGlyphDecoder)
            case _ => OpaqueGlyphDecoder
          }
        } else encodingDecoder(doc, font).getOrElse(DefaultGlyphDecoder)
    }
  }

  /** Predefined charset-codespace CMap name → JVM charset (Adobe CMap
    * registry, ISO 32000 §9.7.5.2 Table 118). Writing-mode suffixes
    * (-H/-V) strip off; the half-width `KSCms-UHC-HW-*` keys carry
    * their own entry. `Identity-H/V` deliberately matches NOTHING —
    * its codes are font-internal glyph ids, not characters, and must
    * stay opaque. Mac-flavor CMaps (GBpc, B5pc, 90pv) differ from
    * their mainstream sibling only in the 1-byte row / a handful of
    * vendor glyphs; the mainstream charset is the honest public
    * approximation and mismatched singles drop rather than garble.
    */
  private[pdf] def charsetFor(cmapName: String): Option[String] = {
    val base = cmapName.replaceAll("-(H|V)$", "")
    Map(
      // Adobe-GB1 (Simplified Chinese)
      "GB-EUC" -> "GB2312", "GBpc-EUC" -> "GB2312",
      "GBK-EUC" -> "GBK", "GBKp-EUC" -> "GBK", "GBK2K" -> "GB18030",
      // Adobe-CNS1 (Traditional Chinese)
      "B5pc" -> "Big5", "ETen-B5" -> "Big5", "ETenms-B5" -> "Big5",
      "HKscs-B5" -> "Big5-HKSCS", "CNS-EUC" -> "x-EUC-TW",
      // Adobe-Japan1
      "90ms-RKSJ" -> "windows-31j", "90msp-RKSJ" -> "windows-31j",
      "90pv-RKSJ" -> "Shift_JIS", "83pv-RKSJ" -> "Shift_JIS",
      "Add-RKSJ" -> "Shift_JIS", "Ext-RKSJ" -> "Shift_JIS",
      // round 10: the JIS C 6226-1978 flavor families — their RKSJ
      // byte structure is Shift-JIS; the '78-vs-'83 deltas are a few
      // dozen glyph swaps that drop rather than garble (same honest
      // approximation as the Mac-flavor entries below)
      "78-RKSJ" -> "Shift_JIS", "78ms-RKSJ" -> "windows-31j",
      "EUC" -> "EUC-JP",
      // Adobe-Korea1 / Adobe-KR
      "KSC-EUC" -> "EUC-KR", "KSCpc-EUC" -> "EUC-KR",
      "KSCms-UHC" -> "x-windows-949", "KSCms-UHC-HW" -> "x-windows-949"
    ).get(base)
  }

  // ---- simple-font /Encoding handling (§9.6.5, Annex D) ----

  /** A simple font without ToUnicode but WITH an `/Encoding` entry:
    * a named base encoding (WinAnsi/MacRoman — decoded through the
    * JVM's public cp1252 / MacRoman charsets) and/or an encoding
    * dict whose `/Differences` array remaps individual codes through
    * AGL glyph names. pypdf resolves exactly this tier before its
    * own Latin-1-ish fallback; without it, accented or renamed
    * glyphs garble. StandardEncoding and symbolic (built-in) fonts
    * stay on the byte≈Latin-1 default — documented scope.
    */
  private def encodingDecoder(doc: PdfDocument, font: PDict): Option[GlyphDecoder] =
    doc.resolve(font.get("Encoding").getOrElse(PNull)) match {
      case PName(base) => baseTable(base).map(ByteTableDecoder.apply)
      case d: PDict =>
        val base = doc.resolve(d.get("BaseEncoding").getOrElse(PNull)) match {
          case PName(n) => baseTable(n)
          case _ => None
        }
        doc.resolve(d.get("Differences").getOrElse(PNull)) match {
          case PArr(items) =>
            // the array alternates: a number sets the next code; each
            // following name assigns to consecutive codes
            val table = base.getOrElse(latin1Table()).clone()
            var code = 0
            items.foreach {
              case n: PNum => code = n.toInt
              case PName(glyph) =>
                if (code >= 0 && code < 256) { table(code) = glyphText(glyph); code += 1 }
              case _ => ()
            }
            Some(ByteTableDecoder(table))
          case _ => base.map(ByteTableDecoder.apply)
        }
      case _ => None
    }

  /** 256-entry table for a named base encoding, via the JVM's own
    * single-byte charset decoders (public, spec-equivalent tables).
    */
  private def baseTable(name: String): Option[Array[String]] = {
    def fromCharset(cs: String): Option[Array[String]] =
      if (!java.nio.charset.Charset.isSupported(cs)) None
      else {
        val charset = java.nio.charset.Charset.forName(cs)
        Some(Array.tabulate(256)(b => new String(Array(b.toByte), charset)))
      }
    name match {
      case "WinAnsiEncoding" => fromCharset("windows-1252")
      case "MacRomanEncoding" => fromCharset("x-MacRoman")
      case _ => None // StandardEncoding / MacExpert / unknown: default tier
    }
  }

  private def latin1Table(): Array[String] =
    Array.tabulate(256)(b => b.toChar.toString)

  /** Glyph name → text: single-char names are themselves (A–z, the
    * bulk of any Latin /Differences), then the AGL subset below,
    * then the AGL's algorithmic `uniXXXX`/`uXXXX[XX]` forms; unknown
    * names yield no text rather than noise (same policy as unmapped
    * CID codes).
    */
  private[pdf] def glyphText(name: String): String =
    if (name.length == 1) name
    else Agl.get(name).orElse(uniFormText(name)).getOrElse("")

  private def uniFormText(name: String): Option[String] =
    try {
      if (name.startsWith("uni") && name.length >= 7 && (name.length - 3) % 4 == 0)
        Some(name.drop(3).grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString)
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
        Some(new String(Character.toChars(Integer.parseInt(name.drop(1), 16))))
      else None
    } catch { case _: NumberFormatException => None }

  /** Adobe Glyph List subset: ASCII punctuation names, the Latin-1
    * supplement, and the common typographic/ligature names (the
    * glyphs WinAnsi/MacRoman diverge on). Public AGL data.
    */
  private val Agl: Map[String, String] = {
    val packed =
      """space 20 exclam 21 quotedbl 22 numbersign 23 dollar 24 percent 25
        |ampersand 26 quotesingle 27 parenleft 28 parenright 29 asterisk 2A
        |plus 2B comma 2C hyphen 2D period 2E slash 2F zero 30 one 31 two 32
        |three 33 four 34 five 35 six 36 seven 37 eight 38 nine 39 colon 3A
        |semicolon 3B less 3C equal 3D greater 3E question 3F at 40
        |bracketleft 5B backslash 5C bracketright 5D asciicircum 5E
        |underscore 5F grave 60 braceleft 7B bar 7C braceright 7D asciitilde 7E
        |exclamdown A1 cent A2 sterling A3 currency A4 yen A5 brokenbar A6
        |section A7 dieresis A8 copyright A9 ordfeminine AA guillemotleft AB
        |logicalnot AC registered AE macron AF degree B0 plusminus B1
        |twosuperior B2 threesuperior B3 acute B4 mu B5 paragraph B6
        |periodcentered B7 cedilla B8 onesuperior B9 ordmasculine BA
        |guillemotright BB onequarter BC onehalf BD threequarters BE
        |questiondown BF Agrave C0 Aacute C1 Acircumflex C2 Atilde C3
        |Adieresis C4 Aring C5 AE C6 Ccedilla C7 Egrave C8 Eacute C9
        |Ecircumflex CA Edieresis CB Igrave CC Iacute CD Icircumflex CE
        |Idieresis CF Eth D0 Ntilde D1 Ograve D2 Oacute D3 Ocircumflex D4
        |Otilde D5 Odieresis D6 multiply D7 Oslash D8 Ugrave D9 Uacute DA
        |Ucircumflex DB Udieresis DC Yacute DD Thorn DE germandbls DF
        |agrave E0 aacute E1 acircumflex E2 atilde E3 adieresis E4 aring E5
        |ae E6 ccedilla E7 egrave E8 eacute E9 ecircumflex EA edieresis EB
        |igrave EC iacute ED icircumflex EE idieresis EF eth F0 ntilde F1
        |ograve F2 oacute F3 ocircumflex F4 otilde F5 odieresis F6 divide F7
        |oslash F8 ugrave F9 uacute FA ucircumflex FB udieresis FC yacute FD
        |thorn FE ydieresis FF
        |quoteleft 2018 quoteright 2019 quotedblleft 201C quotedblright 201D
        |quotesinglbase 201A quotedblbase 201E endash 2013 emdash 2014
        |bullet 2022 ellipsis 2026 dagger 2020 daggerdbl 2021 florin 192
        |fraction 2044 perthousand 2030 guilsinglleft 2039 guilsinglright 203A
        |OE 152 oe 153 Scaron 160 scaron 161 Zcaron 17D zcaron 17E
        |Ydieresis 178 trademark 2122 Euro 20AC minus 2212 fi FB01 fl FB02
        |dotlessi 131 circumflex 2C6 caron 2C7 breve 2D8 dotaccent 2D9
        |ring 2DA ogonek 2DB tilde 2DC hungarumlaut 2DD Lslash 141 lslash 142
        |nbspace A0 sfthyphen AD""".stripMargin
    packed.split("\\s+").grouped(2).collect {
      case Array(n, h) => n -> Integer.parseInt(h, 16).toChar.toString
    }.toMap
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
