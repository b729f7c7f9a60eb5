package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Type1 font-program header parsing — builtin /Encoding only (SURVEY.md §2.5
  * F7: the embedded-program amendment path; reference
  * Type1Parser.extractFontHeader, pdf.combined.js:37421-37474). Charstring /
  * eexec decryption stays out of scope — metrics come from the PDF dict; the
  * cleartext header carries everything the toUnicode amendment needs.
  */
object Type1Parser {

  def isType1Bytes(data: Array[Byte]): Boolean =
    (data.length > 2 && data(0) == '%' && data(1) == '!') ||
      (data.length > 6 && (data(0) & 0xff) == 0x80)

  /** code → glyph name from the program's /Encoding: a named base encoding
    * ("/Encoding StandardEncoding def") resolves through the public encoding
    * tables; the array form collects "dup <code> /<name> put" entries up to
    * the closing def. Empty when absent or unparseable. */
  def builtinEncoding(data: Array[Byte]): Map[Int, String] =
    try {
      val clear = clearText(data)
      val at = clear.indexOf("/Encoding")
      if (at < 0) return Map.empty
      val tail = clear.substring(at + "/Encoding".length)
      "^\\s*([A-Za-z]+Encoding)\\b".r.findPrefixMatchOf(tail) match {
        case Some(m) =>
          FontData.getEncoding(m.group(1)) match {
            case Some(arr) =>
              arr.iterator.zipWithIndex.collect {
                case (n, i) if n.nonEmpty => i -> n
              }.toMap
            case None => Map.empty
          }
        case None =>
          // "256 array ... dup <code> /<name> put ... readonly def"; the
          // ".notdef-fill for-loop" before the dups contains no ' def' token
          val end = { val i = tail.indexOf(" def"); if (i < 0) tail.length else i }
          val dup = "dup\\s+(\\d+)\\s*/([^\\s/\\[\\]{}()<>]+)\\s+put".r
          dup.findAllMatchIn(tail.substring(0, end))
            .map(m => m.group(1).toInt -> m.group(2))
            .filter { case (c, _) => c >= 0 && c < 256 }
            .toMap
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** The ASCII header: PFB segment-1 blocks concatenated (0x80 0x01 len32le)
    * or the raw PFA prefix, truncated at `eexec`. */
  private def clearText(data: Array[Byte]): String = {
    val s =
      if (data.length > 6 && (data(0) & 0xff) == 0x80) {
        val sb = new StringBuilder
        var i = 0
        var stop = false
        while (!stop && i + 6 <= data.length && (data(i) & 0xff) == 0x80) {
          val t = data(i + 1) & 0xff
          val len = (data(i + 2) & 0xff) | ((data(i + 3) & 0xff) << 8) |
            ((data(i + 4) & 0xff) << 16) | ((data(i + 5) & 0xff) << 24)
          if (t == 1 && len > 0 && i + 6 + len <= data.length)
            sb.append(new String(data, i + 6, len, ISO_8859_1))
          if (t != 1 || len <= 0) stop = true
          i += 6 + math.max(0, len)
        }
        sb.toString
      } else new String(data, 0, math.min(data.length, 1 << 16), ISO_8859_1)
    val e = s.indexOf("eexec")
    if (e >= 0) s.substring(0, e) else s
  }
}
