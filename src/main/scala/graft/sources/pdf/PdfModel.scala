package graft.sources.pdf

/** COS (Carousel Object System) value model — the object syntax of
  * ISO 32000 / the classic Adobe PDF spec. Minimal surface for text
  * extraction: the reference's `PyPDFLoader` ultimately drives pypdf's
  * equivalent model (`/root/reference/pdf_reader.py:442-443`,
  * `requirements.txt:33`); this is an independent pure-JVM
  * implementation of the same public format.
  */
sealed trait PdfObj

case object PNull extends PdfObj
final case class PBool(value: Boolean) extends PdfObj
final case class PNum(value: Double) extends PdfObj {
  def toInt: Int = value.toInt
  def toLong: Long = value.toLong
}
/** String payload kept as raw bytes; text decoding happens at the
  * extraction boundary (UTF-16BE when BOM-prefixed, else Latin-1).
  */
final case class PStr(bytes: Array[Byte]) extends PdfObj
final case class PName(name: String) extends PdfObj
final case class PArr(items: Vector[PdfObj]) extends PdfObj
final case class PDict(entries: Map[String, PdfObj]) extends PdfObj {
  def get(key: String): Option[PdfObj] = entries.get(key)
}
/** Stream object: dict + the raw (still encoded) payload bytes. */
final case class PStream(dict: PDict, raw: Array[Byte]) extends PdfObj
/** Indirect reference `num gen R`. */
final case class PRef(num: Int, gen: Int) extends PdfObj

/** Cross-reference entry: where an object lives. */
sealed trait XrefEntry
/** Classic / xref-stream type-1 entry: absolute byte offset. */
final case class XrefOffset(offset: Long) extends XrefEntry
/** Xref-stream type-2 entry: index within an object stream. */
final case class XrefInStream(objStmNum: Int, index: Int) extends XrefEntry
