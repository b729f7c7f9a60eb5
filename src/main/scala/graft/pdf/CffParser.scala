package graft.pdf

/** Minimal CFF (Type1C / FontFile3) reader — just the structures glyph mapping
  * needs: charstring count, charset glyph names, built-in encoding
  * (SURVEY.md §2.5 F2/F4). Follows the public Adobe CFF spec; behavioral
  * details (predefined-encoding expansion over the charset, supplement merge)
  * mirror the reference's CFFParser.parseCharsets/parseEncoding
  * (pdf.combined.js:38445-38572) so downstream glyph mapping is identical.
  *
  * CID-keyed CFFs (ROS present) report `isCid` with charset left as SIDs; the
  * four reference papers contain none, and FontLoader degrades gracefully.
  */
final class CffParser(data: Array[Byte]) {

  private def u8(p: Int): Int = data(p) & 0xff
  private def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
  private def u24(p: Int): Int = (u16(p) << 8) | u8(p + 2)
  private def u32(p: Int): Long = (u24(p).toLong << 8) | u8(p + 3)

  private def offsetAt(p: Int, offSize: Int): Int = offSize match {
    case 1 => u8(p)
    case 2 => u16(p)
    case 3 => u24(p)
    case _ => u32(p).toInt
  }

  /** INDEX: returns (item offsets incl. end, data start, end position). */
  private final case class Index(count: Int, offsets: Array[Int], dataStart: Int, end: Int) {
    def item(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(data, dataStart + offsets(i) - 1, dataStart + offsets(i + 1) - 1)
  }

  private def readIndex(pos: Int): Index = {
    val count = u16(pos)
    if (count == 0) return Index(0, Array(1), pos + 2, pos + 2)
    val offSize = u8(pos + 2)
    val offs = new Array[Int](count + 1)
    var i = 0
    while (i <= count) { offs(i) = offsetAt(pos + 3 + i * offSize, offSize); i += 1 }
    val dataStart = pos + 3 + (count + 1) * offSize
    Index(count, offs, dataStart, dataStart + offs(count) - 1)
  }

  /** DICT: op -> operands (op is 1-byte, or 0xc00 | second byte for 12 xx). */
  private def parseDict(d: Array[Byte]): Map[Int, Vector[Double]] = {
    val out = Map.newBuilder[Int, Vector[Double]]
    var operands = Vector.empty[Double]
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      if (b <= 21) { // operator
        val op = if (b == 12) { i += 1; 0xc00 | (d(i) & 0xff) } else b
        out += op -> operands
        operands = Vector.empty
        i += 1
      } else if (b == 28) { operands :+= ((d(i + 1) << 8) | (d(i + 2) & 0xff)).toShort.toDouble; i += 3 }
      else if (b == 29) {
        operands :+= (((d(i + 1) & 0xff) << 24) | ((d(i + 2) & 0xff) << 16) |
          ((d(i + 3) & 0xff) << 8) | (d(i + 4) & 0xff)).toDouble
        i += 5
      } else if (b == 30) { // real number, nibble-encoded
        val sb = new StringBuilder
        var going = true
        i += 1
        while (going && i < d.length) {
          val by = d(i) & 0xff
          var half = 0
          while (going && half < 2) {
            val nib = if (half == 0) by >> 4 else by & 0xf
            nib match {
              case 0xf => going = false
              case 0xa => sb.append('.')
              case 0xb => sb.append('E')
              case 0xc => sb.append("E-")
              case 0xe => sb.append('-')
              case 0xd => ()
              case n => sb.append(('0' + n).toChar)
            }
            half += 1
          }
          i += 1
        }
        operands :+= (try sb.toString.toDouble catch { case _: NumberFormatException => 0.0 })
      } else if (b >= 32 && b <= 246) { operands :+= (b - 139).toDouble; i += 1 }
      else if (b >= 247 && b <= 250) { operands :+= ((b - 247) * 256 + (d(i + 1) & 0xff) + 108).toDouble; i += 2 }
      else if (b >= 251 && b <= 254) { operands :+= (-(b - 251) * 256 - (d(i + 1) & 0xff) - 108).toDouble; i += 2 }
      else i += 1
    }
    out.result()
  }

  val (charsetNames: Array[String], builtinEncoding: Map[Int, Int], numGlyphs: Int, isCid: Boolean) = {
    val hdrSize = u8(2)
    val nameIndex = readIndex(hdrSize)
    val topIndex = readIndex(nameIndex.end)
    val topDict = parseDict(topIndex.item(0))
    val stringIndex = readIndex(topIndex.end)
    def sid(id: Int): String =
      if (id < FontData.cffStandardStrings.length) FontData.cffStandardStrings(id)
      else if (id - 391 < stringIndex.count)
        new String(stringIndex.item(id - 391), java.nio.charset.StandardCharsets.ISO_8859_1)
      else s"sid$id"

    val cid = topDict.contains(0xc00 | 30) // ROS
    val charStringsOff = topDict.get(17).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val charStrings = if (charStringsOff > 0) readIndex(charStringsOff) else Index(0, Array(1), 0, 0)
    val nGlyphs = charStrings.count

    val charsetOff = topDict.get(15).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val charset: Array[String] = charsetOff match {
      case 0 => // ISOAdobe: glyph i -> standard string i (SIDs are sequential)
        (0 until nGlyphs).map(i => sid(i)).toArray
      case 1 | 2 => // Expert charsets — approximate with sequential SIDs (unused here)
        (0 until nGlyphs).map(i => sid(i)).toArray
      case pos =>
        val names = scala.collection.mutable.ArrayBuffer(".notdef")
        val fmt = u8(pos)
        var p = pos + 1
        fmt match {
          case 0 =>
            var i = 0
            while (i < nGlyphs - 1) { names += (if (cid) (u16(p)).toString else sid(u16(p))); p += 2; i += 1 }
          case 1 =>
            while (names.length < nGlyphs) {
              var id = u16(p); val count = u8(p + 2); p += 3
              var i = 0
              while (i <= count && names.length < nGlyphs) { names += (if (cid) id.toString else sid(id)); id += 1; i += 1 }
            }
          case 2 =>
            while (names.length < nGlyphs) {
              var id = u16(p); val count = u16(p + 2); p += 4
              var i = 0
              while (i <= count && names.length < nGlyphs) { names += (if (cid) id.toString else sid(id)); id += 1; i += 1 }
            }
          case _ => ()
        }
        names.toArray
    }

    val encoding: Map[Int, Int] = if (cid) Map.empty else {
      val encOff = topDict.get(16).flatMap(_.headOption).map(_.toInt).getOrElse(0)
      val enc = scala.collection.mutable.Map.empty[Int, Int]
      if (encOff == 0 || encOff == 1) {
        // predefined: encoding[stdEncIndexOf(charsetName)] = gid
        val base = if (encOff == 1) FontData.expertEncoding else FontData.standardEncoding
        var gid = 0
        while (gid < charset.length) {
          val idx = base.indexOf(charset(gid))
          if (idx != -1) enc(idx) = gid
          gid += 1
        }
      } else {
        val fmtRaw = u8(encOff)
        val fmt = fmtRaw & 0x7f
        var p = encOff + 1
        fmt match {
          case 0 =>
            val n = u8(p); p += 1
            var gid = 1
            while (gid <= n) { enc(u8(p)) = gid; p += 1; gid += 1 }
          case 1 =>
            val nRanges = u8(p); p += 1
            var gid = 1
            var r = 0
            while (r < nRanges) {
              val start = u8(p); val left = u8(p + 1); p += 2
              var c = start
              while (c <= start + left) { enc(c) = gid; gid += 1; c += 1 }
              r += 1
            }
          case _ => ()
        }
        if ((fmtRaw & 0x80) != 0) { // supplements
          val nSup = u8(p); p += 1
          var i = 0
          while (i < nSup) {
            val code = u8(p); val s = u16(p + 1); p += 3
            val gid = charset.indexOf(sid(s))
            enc(code) = gid
            i += 1
          }
        }
      }
      enc.toMap
    }

    (charset, encoding, nGlyphs, cid)
  }
}

object CffParser {
  /** FontFile3/Type1C sniff + safe parse. */
  def tryParse(data: Array[Byte]): Option[CffParser] =
    try {
      if (data.length < 4 || (data(0) & 0xff) != 1) None
      else Some(new CffParser(data))
    } catch { case scala.util.control.NonFatal(_) => None }
}
