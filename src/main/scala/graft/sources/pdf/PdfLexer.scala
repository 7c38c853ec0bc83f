package graft.sources.pdf

import scala.collection.mutable.ArrayBuffer

/** Recursive-descent reader over PDF COS syntax. One instance walks
  * one byte array; `pos` is mutable and can be saved/restored for the
  * `num num R` lookahead. No regexes, no charset assumptions — the
  * format is byte-oriented.
  */
final class PdfLexer(val data: Array[Byte], var pos: Int = 0) {

  def length: Int = data.length
  def atEnd: Boolean = pos >= data.length
  private def byte(i: Int): Int = data(i) & 0xff

  @inline private def isWhite(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  @inline private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'
  @inline def isRegular(c: Int): Boolean = !isWhite(c) && !isDelim(c)

  /** Skip whitespace and %-comments. */
  def skipWs(): Unit = {
    var go = true
    while (go && pos < data.length) {
      val c = byte(pos)
      if (isWhite(c)) pos += 1
      else if (c == '%') {
        while (pos < data.length && byte(pos) != '\n' && byte(pos) != '\r') pos += 1
      } else go = false
    }
  }

  def peek: Int = if (pos < data.length) byte(pos) else -1

  /** Read a run of regular characters (keyword / number / operator). */
  def readToken(): String = {
    skipWs()
    val start = pos
    while (pos < data.length && isRegular(byte(pos))) pos += 1
    new String(data, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** True and consumed if the next token is exactly `kw`. */
  def tryKeyword(kw: String): Boolean = {
    skipWs()
    val save = pos
    val t = readToken()
    if (t == kw) true else { pos = save; false }
  }

  def expectKeyword(kw: String): Unit =
    if (!tryKeyword(kw))
      throw new PdfParseException(s"expected '$kw' at byte $pos")

  /** Parse any COS value. `allowRefs` is false inside content streams
    * (where `num num R` cannot occur and numbers are operands).
    */
  def parseValue(allowRefs: Boolean = true): PdfObj = {
    skipWs()
    if (atEnd) throw new PdfParseException("unexpected end of data")
    byte(pos) match {
      case '/' => parseName()
      case '(' => parseLiteralString()
      case '[' => parseArray(allowRefs)
      case '<' =>
        if (pos + 1 < data.length && byte(pos + 1) == '<') parseDictOrStream(allowRefs)
        else parseHexString()
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        parseNumberOrRef(allowRefs)
      case _ =>
        val t = readToken()
        t match {
          case "true" => PBool(true)
          case "false" => PBool(false)
          case "null" => PNull
          case other => throw new PdfParseException(s"unexpected token '$other' at $pos")
        }
    }
  }

  def parseName(): PName = {
    pos += 1 // '/'
    val sb = new StringBuilder
    while (pos < data.length && isRegular(byte(pos))) {
      val c = byte(pos)
      if (c == '#' && pos + 2 < data.length) {
        val hex = new String(data, pos + 1, 2, java.nio.charset.StandardCharsets.ISO_8859_1)
        sb += Integer.parseInt(hex, 16).toChar
        pos += 3
      } else { sb += c.toChar; pos += 1 }
    }
    PName(sb.toString)
  }

  /** `(...)` with nesting, escapes, octal codes, line continuations. */
  def parseLiteralString(): PStr = {
    pos += 1 // '('
    val out = ArrayBuffer.empty[Byte]
    var depth = 1
    while (depth > 0) {
      if (atEnd) throw new PdfParseException("unterminated string")
      val c = byte(pos); pos += 1
      c match {
        case '(' => depth += 1; out += '('.toByte
        case ')' =>
          depth -= 1
          if (depth > 0) out += ')'.toByte
        case '\\' =>
          if (atEnd) throw new PdfParseException("dangling escape")
          val e = byte(pos); pos += 1
          e match {
            case 'n' => out += '\n'.toByte
            case 'r' => out += '\r'.toByte
            case 't' => out += '\t'.toByte
            case 'b' => out += '\b'.toByte
            case 'f' => out += '\f'.toByte
            case '(' => out += '('.toByte
            case ')' => out += ')'.toByte
            case '\\' => out += '\\'.toByte
            case '\r' => if (peek == '\n') pos += 1 // line continuation
            case '\n' => // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && pos < data.length &&
                  byte(pos) >= '0' && byte(pos) <= '7') {
                v = v * 8 + (byte(pos) - '0'); pos += 1; k += 1
              }
              out += (v & 0xff).toByte
            case other => out += other.toByte // spec: drop backslash
          }
        case other => out += other.toByte
      }
    }
    PStr(out.toArray)
  }

  def parseHexString(): PStr = {
    pos += 1 // '<'
    val out = ArrayBuffer.empty[Byte]
    var hi = -1
    var go = true
    while (go) {
      if (atEnd) throw new PdfParseException("unterminated hex string")
      val c = byte(pos); pos += 1
      if (c == '>') {
        if (hi >= 0) out += (hi << 4).toByte // odd count: pad 0
        go = false
      } else if (!isWhite(c)) {
        val v = Character.digit(c, 16)
        if (v < 0) throw new PdfParseException(s"bad hex digit '${c.toChar}'")
        if (hi < 0) hi = v else { out += ((hi << 4) | v).toByte; hi = -1 }
      }
    }
    PStr(out.toArray)
  }

  def parseArray(allowRefs: Boolean): PArr = {
    pos += 1 // '['
    val items = Vector.newBuilder[PdfObj]
    skipWs()
    while (peek != ']') {
      items += parseValue(allowRefs)
      skipWs()
      if (atEnd) throw new PdfParseException("unterminated array")
    }
    pos += 1 // ']'
    PArr(items.result())
  }

  /** `<<...>>`, optionally followed by `stream...endstream`. The raw
    * stream payload is sliced by /Length when it is a direct number;
    * a missing/indirect /Length falls back to scanning for the
    * `endstream` keyword (resolved lengths are re-sliced by the
    * document if needed).
    */
  def parseDictOrStream(allowRefs: Boolean): PdfObj = {
    pos += 2 // '<<'
    val entries = Map.newBuilder[String, PdfObj]
    skipWs()
    while (!(peek == '>' && pos + 1 < data.length && byte(pos + 1) == '>')) {
      val key = parseValue(allowRefs) match {
        case PName(n) => n
        case other => throw new PdfParseException(s"dict key must be a name, got $other")
      }
      entries += key -> parseValue(allowRefs)
      skipWs()
      if (atEnd) throw new PdfParseException("unterminated dict")
    }
    pos += 2 // '>>'
    val dict = PDict(entries.result())
    val save = pos
    if (tryKeyword("stream")) {
      // EOL after 'stream': CRLF or LF
      if (peek == '\r') pos += 1
      if (peek == '\n') pos += 1
      val start = pos
      dict.get("Length") match {
        case Some(PNum(len)) =>
          pos = start + len.toInt
          skipWs()
          expectKeyword("endstream")
          PStream(dict, java.util.Arrays.copyOfRange(data, start, start + len.toInt))
        case _ =>
          // indirect or absent Length: locate 'endstream' by scan
          val idx = indexOf("endstream", start)
          if (idx < 0) throw new PdfParseException("endstream not found")
          var end = idx
          // strip one trailing EOL belonging to the payload
          if (end > start && byte(end - 1) == '\n') end -= 1
          if (end > start && byte(end - 1) == '\r') end -= 1
          pos = idx
          expectKeyword("endstream")
          PStream(dict, java.util.Arrays.copyOfRange(data, start, end))
      }
    } else { pos = save; dict }
  }

  private def parseNumberOrRef(allowRefs: Boolean): PdfObj = {
    val first = readNumber()
    if (allowRefs && first.value >= 0 && first.value == math.floor(first.value)) {
      val save = pos
      skipWs()
      if (peek >= '0' && peek <= '9') {
        val gen = readToken()
        skipWs()
        val save2 = pos
        val r = readToken()
        if (r == "R" && gen.forall(_.isDigit) && gen.nonEmpty)
          return PRef(first.toInt, gen.toInt)
        pos = save2
      }
      pos = save
    }
    first
  }

  def readNumber(): PNum = {
    skipWs()
    val start = pos
    if (peek == '+' || peek == '-') pos += 1
    while (pos < data.length &&
        ((byte(pos) >= '0' && byte(pos) <= '9') || byte(pos) == '.')) pos += 1
    if (pos == start) throw new PdfParseException(s"expected number at $start")
    PNum(new String(data, start, pos - start,
      java.nio.charset.StandardCharsets.ISO_8859_1).toDouble)
  }

  /** Byte-wise keyword search from `from`. */
  def indexOf(needle: String, from: Int): Int = {
    val n = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(0, from)
    val limit = data.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && data(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  def lastIndexOf(needle: String): Int = {
    val n = needle.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = data.length - n.length
    while (i >= 0) {
      var j = 0
      while (j < n.length && data(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i -= 1
    }
    -1
  }
}

final class PdfParseException(msg: String) extends RuntimeException(msg)
