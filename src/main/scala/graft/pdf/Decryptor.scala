package graft.pdf

import PObj._

import java.security.MessageDigest

/** Standard security handler (SURVEY.md §2.1 S13-adjacent): RC4 (V1/V2,
  * R2/R3) and AES-128-CBC (V4 /AESV2) stream decryption with the empty user
  * password — the overwhelmingly common "owner-locked" case in web corpora.
  * Follows the public ISO 32000-1 §7.6 algorithms (key derivation Algorithm 2,
  * per-object keys Algorithm 1). Wrong-password or unsupported filters leave
  * streams undecrypted and extraction degrades to empty pages rather than
  * failing (never-fail discipline).
  */
final class Decryptor(
    key: Array[Byte],
    val isAes: Boolean,
    /** /EncryptMetadata false ⇒ the catalog /Metadata stream is plaintext and
      * must not be "decrypted" (reference: xref.fetch(streamRef,
      * !encryptMetadata), pdf.combined.js:42562-42565). */
    val encryptMetadata: Boolean = true) {

  /** Per-object key: MD5(key + objNum[0..2] + gen[0..1] (+ "sAlT" for AES)),
    * truncated to min(key.length + 5, 16). */
  private[pdf] def objectKey(num: Int, gen: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(key)
    md.update(Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
    if (isAes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54)) // "sAlT"
    val digest = md.digest()
    java.util.Arrays.copyOf(digest, math.min(key.length + 5, 16))
  }

  def decrypt(data: Array[Byte], num: Int, gen: Int): Array[Byte] =
    try {
      val k = objectKey(num, gen)
      if (isAes) {
        if (data.length < 16) return Array.emptyByteArray
        val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k, "AES"),
          new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
        cipher.doFinal(data, 16, data.length - 16)
      } else Decryptor.rc4(k, data)
    } catch { case scala.util.control.NonFatal(_) => data }
}

object Decryptor {

  /** The standard 32-byte password padding (ISO 32000-1 Table , public). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  /** Build from the /Encrypt dict + first document ID, empty user password
    * (Algorithm 2). Returns None for unsupported filters/versions. */
  def fromEncryptDict(enc: PDict, docId: Array[Byte], resolve: PObj => PObj): Option[Decryptor] = {
    def name(k: String) = resolve(enc.entries.getOrElse(k, PNull)) match {
      case PName(n) => Some(n); case _ => None
    }
    def num(k: String) = resolve(enc.entries.getOrElse(k, PNull)) match {
      case PNum(v) => Some(v.toInt); case _ => None
    }
    def str(k: String) = resolve(enc.entries.getOrElse(k, PNull)) match {
      case PStr(b) => Some(b); case _ => None
    }
    if (!name("Filter").contains("Standard")) return None
    val v = num("V").getOrElse(0)
    val r = num("R").getOrElse(2)
    val o = str("O").getOrElse(return None)
    val p = num("P").getOrElse(-1)
    val lengthBits = num("Length").getOrElse(40)

    // V4: crypt-filter dictionary — support the common AESV2/V2 /StdCF layout
    val (isAes, keyBits) =
      if (v == 4) {
        val cfm = (for {
          cf <- enc.get("CF").map(resolve).collect { case d: PDict => d }
          std <- cf.get("StdCF").map(resolve).collect { case d: PDict => d }
          m <- std.get("CFM").map(resolve).collect { case PName(n) => n }
        } yield m).getOrElse("V2")
        cfm match {
          case "AESV2" => (true, 128)
          case "V2" => (false, 128)
          case _ => return None // AESV3/others out of scope
        }
      } else if (v == 1) (false, 40)
      else if (v == 2) (false, lengthBits)
      else return None

    val md = MessageDigest.getInstance("MD5")
    md.update(Pad) // empty user password → the bare pad
    md.update(java.util.Arrays.copyOf(o, 32))
    md.update(Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte, ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(docId)
    // the reference gates this on the algorithm: encryptMetadata is true only
    // for V=4/5 with the dict flag not false (pdf.combined.js:26356-26358) —
    // V1/V2 documents fetch the catalog metadata with suppressEncryption
    val encryptMetadata = (v == 4 || v == 5) &&
      (resolve(enc.entries.getOrElse("EncryptMetadata", PBool(true))) match {
        case PBool(b) => b; case _ => true
      })
    if (r >= 4 && !encryptMetadata) md.update(Array[Byte](-1, -1, -1, -1))
    var key = java.util.Arrays.copyOf(md.digest(), keyBits / 8)
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        key = java.util.Arrays.copyOf(
          MessageDigest.getInstance("MD5").digest(key), keyBits / 8)
        i += 1
      }
    }
    Some(new Decryptor(key, isAes, encryptMetadata))
  }
}
