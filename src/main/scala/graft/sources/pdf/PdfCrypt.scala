package graft.sources.pdf

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** ISO 32000-1 §7.6 standard security handler — the empty-user-password
  * subset that covers how "protected" PDFs ship in the wild: the file is
  * encrypted, but any reader can open it because the user password is
  * empty. pypdf — the reference's extractor (`/root/reference/
  * pdf_reader.py:442-443`, `requirements.txt:33`) — decrypts these
  * transparently; without this module such files parse their xref and
  * then silently contribute zero pages.
  *
  * Supported: /Filter /Standard with
  *   - V 1/2, R 2/3 — RC4, 40..128-bit file key (§7.6.2 Algorithm 2)
  *   - V 4, R 4 — crypt filters /V2 (RC4) and /AESV2 (AES-128-CBC,
  *     16-byte IV prefix, PKCS#7 padding), /Identity passthrough
  * Out of scope (fails loudly, never garbles): non-empty user
  * passwords (Algorithm 6 check rejects), V 5 / R 5-6 (PDF 2.0
  * AES-256), and per-stream /Crypt filter overrides.
  */
final class PdfCrypt private (
    fileKey: Array[Byte],
    stmCfm: String,
    strCfm: String) {

  /** Decrypt a stream payload owned by object `num gen`. */
  def decryptStream(num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    decrypt(stmCfm, num, gen, bytes)

  /** Decrypt a string owned by object `num gen`. */
  def decryptString(num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    decrypt(strCfm, num, gen, bytes)

  private def decrypt(cfm: String, num: Int, gen: Int, bytes: Array[Byte]): Array[Byte] =
    cfm match {
      case "Identity" => bytes
      case "V2" => PdfCrypt.rc4(objectKey(num, gen, aes = false), bytes)
      case "AESV2" => aesCbcDecrypt(objectKey(num, gen, aes = true), bytes)
      case other => throw new PdfParseException(s"unsupported crypt filter method /$other")
    }

  /** §7.6.2 Algorithm 1: per-object key = MD5(fileKey + objnum[3 LE] +
    * gen[2 LE] (+ "sAlT" for AES)), truncated to min(len+5, 16).
    */
  private def objectKey(num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
    if (aes) md.update(PdfCrypt.AesSalt)
    md.digest().take(math.min(fileKey.length + 5, 16))
  }

  private def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) return data
    if (data.length < 32 || data.length % 16 != 0)
      throw new PdfParseException(s"bad AES payload length ${data.length}")
    val cipher = Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"),
      new IvParameterSpec(data, 0, 16))
    val plain = cipher.doFinal(data, 16, data.length - 16)
    // strip PKCS#7 padding; a bad pad byte means the key was wrong —
    // fail the parse rather than return garbage text
    val pad = plain(plain.length - 1) & 0xff
    if (pad < 1 || pad > 16 || pad > plain.length)
      throw new PdfParseException("bad AES padding (wrong key?)")
    java.util.Arrays.copyOfRange(plain, 0, plain.length - pad)
  }
}

object PdfCrypt {

  /** The 32-byte password pad of §7.6.3.3 (public spec constant). */
  val Pad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41, 0x64, 0x00, 0x4e, 0x56,
    0xff, 0xfa, 0x01, 0x08, 0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  /** AES per-object key salt "sAlT" (§7.6.2 Algorithm 1 step b). */
  val AesSalt: Array[Byte] = Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)

  /** Build the handler for a document's /Encrypt dict + first /ID
    * string, verifying the EMPTY user password. Throws
    * [[PdfParseException]] for unsupported revisions or a non-empty
    * user password — loud, never a silent zero-page parse.
    */
  def forDocument(
      enc: PDict,
      resolve: PdfObj => PdfObj,
      id0: Array[Byte]): PdfCrypt = {

    def num(key: String, default: => Int): Int = resolve(enc.get(key).getOrElse(PNull)) match {
      case PNum(v) => v.toInt
      case _ => default
    }
    def str(key: String): Array[Byte] = resolve(enc.get(key).getOrElse(PNull)) match {
      case PStr(b) => b
      case other => throw new PdfParseException(s"/Encrypt /$key missing or not a string: $other")
    }

    resolve(enc.get("Filter").getOrElse(PNull)) match {
      case PName("Standard") => ()
      case other => throw new PdfParseException(s"unsupported security handler $other")
    }
    val v = num("V", 0)
    val r = num("R", 2)
    if (v < 1 || v > 4 || r < 2 || r > 4)
      throw new PdfParseException(
        s"unsupported encryption V=$v R=$r (V5/R6 AES-256 not implemented)")

    val o = str("O")
    val p = num("P", -1)
    val keyLenBytes = if (v == 1) 5 else math.max(5, math.min(16, num("Length", 40) / 8))
    val encryptMetadata = resolve(enc.get("EncryptMetadata").getOrElse(PNull)) match {
      case PBool(b) => b
      case _ => true
    }

    val fileKey = deriveFileKey(Pad, o, p, id0, r, keyLenBytes, encryptMetadata)

    // Algorithm 6: verify the empty USER password against /U.
    val expectedU = computeU(fileKey, id0, r)
    val actualU = str("U")
    val cmpLen = if (r >= 3) 16 else 32
    if (!java.util.Arrays.equals(
        expectedU.take(cmpLen), actualU.take(cmpLen)))
      throw new PdfParseException(
        "encrypted PDF requires a non-empty user password (unsupported)")

    // V4 crypt filters: resolve /StmF and /StrF through /CF to a CFM
    // name; V1/V2 are implicit whole-file RC4.
    def cfmFor(which: String): String =
      if (v < 4) "V2"
      else resolve(enc.get(which).getOrElse(PName("Identity"))) match {
        case PName("Identity") => "Identity" // spec default when absent
        case PName(cfName) =>
          val cf = resolve(enc.get("CF").getOrElse(PNull)) match {
            case d: PDict => d
            case _ => throw new PdfParseException("/Encrypt V4 missing /CF")
          }
          resolve(cf.get(cfName).getOrElse(PNull)) match {
            case d: PDict => resolve(d.get("CFM").getOrElse(PNull)) match {
              case PName(m) => m
              case _ => throw new PdfParseException(s"crypt filter $cfName missing /CFM")
            }
            case _ => throw new PdfParseException(s"unknown crypt filter $cfName")
          }
        case other => throw new PdfParseException(s"bad $which: $other")
      }

    new PdfCrypt(fileKey, cfmFor("StmF"), cfmFor("StrF"))
  }

  /** §7.6.3.3 Algorithm 2: derive the file encryption key from the
    * (padded) user password, /O, /P, and the first document ID.
    */
  def deriveFileKey(
      paddedUser: Array[Byte],
      o: Array[Byte],
      p: Int,
      id0: Array[Byte],
      r: Int,
      keyLenBytes: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(paddedUser)
    md.update(o, 0, math.min(32, o.length))
    md.update(Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(id0)
    if (r >= 4 && !encryptMetadata)
      md.update(Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    var hash = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        val m2 = MessageDigest.getInstance("MD5")
        m2.update(hash, 0, keyLenBytes)
        hash = m2.digest()
        i += 1
      }
    }
    hash.take(keyLenBytes)
  }

  /** §7.6.3.4 Algorithms 4 (R2) / 5 (R3+): the /U entry for the empty
    * user password. R3+ returns the 16 significant bytes.
    */
  def computeU(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      val md = MessageDigest.getInstance("MD5")
      md.update(Pad)
      md.update(id0)
      var out = rc4(fileKey, md.digest())
      var i = 1
      while (i <= 19) {
        val k = fileKey.map(b => (b ^ i).toByte)
        out = rc4(k, out)
        i += 1
      }
      out
    }

  /** RC4 (public algorithm; KSA + PRGA). Symmetric: also used by the
    * test fixtures' independent encryptor twin.
    */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var n = 0
    while (n < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(n) = (data(n) ^ s((s(i) + s(j)) & 0xff)).toByte
      n += 1
    }
    out
  }
}
