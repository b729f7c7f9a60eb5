package graft.pdf

import PObj._

import scala.collection.mutable

/** File-level object syntax parser: dicts, arrays, strings, hex strings, names,
  * numbers, refs, streams (SURVEY.md §2.2 P1 — the Parser.getObj object model;
  * reference Parser/Lexer, pdf.combined.js:48900-49400). Operates directly on
  * the byte array; `pos` advances as values are consumed.
  */
final class ObjParser(val bytes: Array[Byte], var pos: Int) {

  private def isWs(c: Int): Boolean =
    c == 0x20 || c == 0x0a || c == 0x0d || c == 0x09 || c == 0x0c || c == 0x00
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  def skipWs(): Unit = {
    var going = true
    while (going && pos < bytes.length) {
      val c = bytes(pos) & 0xff
      if (isWs(c)) pos += 1
      else if (c == '%') { // comment to EOL
        while (pos < bytes.length && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
      } else going = false
    }
  }

  def peekKeyword(kw: String): Boolean = {
    skipWs()
    if (pos + kw.length > bytes.length) return false
    var i = 0
    while (i < kw.length) {
      if (bytes(pos + i) != kw.charAt(i).toByte) return false
      i += 1
    }
    val after = pos + kw.length
    after >= bytes.length || isWs(bytes(after) & 0xff) || isDelim(bytes(after) & 0xff)
  }

  def consumeKeyword(kw: String): Boolean = {
    if (peekKeyword(kw)) { pos += kw.length; true } else false
  }

  /** Parse one object. Refs are recognized by `num gen R` lookahead. */
  def parseValue(): PObj = {
    skipWs()
    if (pos >= bytes.length) return PNull
    val c = bytes(pos) & 0xff
    c match {
      case '/' => parseName()
      case '(' => parseLiteralString()
      case '[' =>
        pos += 1
        val items = Vector.newBuilder[PObj]
        skipWs()
        while (pos < bytes.length && bytes(pos) != ']') {
          items += parseValue()
          skipWs()
        }
        if (pos < bytes.length) pos += 1 // ']'
        PArr(items.result())
      case '<' =>
        if (pos + 1 < bytes.length && bytes(pos + 1) == '<') parseDictOrStream()
        else parseHexString()
      case _ if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        parseNumberOrRef()
      case _ =>
        if (consumeKeyword("true")) PBool(true)
        else if (consumeKeyword("false")) PBool(false)
        else if (consumeKeyword("null")) PNull
        else { pos += 1; PNull } // unknown byte: skip (never-fail)
    }
  }

  private def parseName(): PName = {
    pos += 1 // '/'
    val sb = new StringBuilder
    while (pos < bytes.length && !isWs(bytes(pos) & 0xff) && !isDelim(bytes(pos) & 0xff)) {
      val c = bytes(pos) & 0xff
      if (c == '#' && pos + 2 < bytes.length) {
        val h = Character.digit(bytes(pos + 1), 16)
        val l = Character.digit(bytes(pos + 2), 16)
        if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
        else { sb.append(c.toChar); pos += 1 }
      } else { sb.append(c.toChar); pos += 1 }
    }
    PName(sb.toString)
  }

  private def parseLiteralString(): PStr = {
    pos += 1 // '('
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    while (pos < bytes.length && depth > 0) {
      val c = bytes(pos) & 0xff
      c match {
        case '\\' =>
          pos += 1
          if (pos < bytes.length) {
            val e = bytes(pos) & 0xff
            e match {
              case 'n' => out.write('\n'); pos += 1
              case 'r' => out.write('\r'); pos += 1
              case 't' => out.write('\t'); pos += 1
              case 'b' => out.write('\b'); pos += 1
              case 'f' => out.write('\f'); pos += 1
              case '\r' => // line continuation
                pos += 1
                if (pos < bytes.length && bytes(pos) == '\n') pos += 1
              case '\n' => pos += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var n = 0
                while (n < 3 && pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '7') {
                  v = (v << 3) | (bytes(pos) - '0'); pos += 1; n += 1
                }
                out.write(v & 0xff)
              case other => out.write(other); pos += 1
            }
          }
        case '(' => depth += 1; out.write(c); pos += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.write(c)
          pos += 1
        case _ => out.write(c); pos += 1
      }
    }
    PStr(out.toByteArray)
  }

  private def parseHexString(): PStr = {
    pos += 1 // '<'
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var going = true
    while (going && pos < bytes.length) {
      val c = bytes(pos) & 0xff
      if (c == '>') { going = false; pos += 1 }
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
        pos += 1
      }
    }
    if (hi >= 0) out.write(hi << 4)
    PStr(out.toByteArray)
  }

  private def parseNumberOrRef(): PObj = {
    val save = pos
    val n1 = parseNumber()
    if (n1.value >= 0 && n1.value == math.floor(n1.value)) {
      val afterFirst = pos
      skipWs()
      val save2 = pos
      if (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        val n2 = parseNumber()
        skipWs()
        if (pos < bytes.length && bytes(pos) == 'R' &&
            (pos + 1 >= bytes.length || isWs(bytes(pos + 1) & 0xff) || isDelim(bytes(pos + 1) & 0xff))) {
          pos += 1
          return PRef(n1.value.toInt, n2.value.toInt)
        }
      }
      pos = afterFirst
      val _ = save2
    }
    val _ = save
    n1
  }

  def parseNumber(): PNum = {
    skipWs()
    val start = pos
    if (pos < bytes.length && (bytes(pos) == '+' || bytes(pos) == '-')) pos += 1
    while (pos < bytes.length && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.')) pos += 1
    val s = new String(bytes, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    PNum(try s.toDouble catch { case _: NumberFormatException => 0.0 })
  }

  /** `<< ... >>` possibly followed by `stream`. Raw stream bytes are sliced by
    * /Length when it is a direct number; an indirect /Length is resolved later
    * by PdfFile (which re-slices against `endstream` as a fallback). */
  private def parseDictOrStream(): PObj = {
    pos += 2 // '<<'
    val entries = Map.newBuilder[String, PObj]
    skipWs()
    while (pos + 1 < bytes.length && !(bytes(pos) == '>' && bytes(pos + 1) == '>')) {
      parseValue() match {
        case PName(key) => entries += key -> parseValue()
        case _ => () // junk key: value already consumed by next loop turn
      }
      skipWs()
    }
    if (pos + 1 < bytes.length) pos += 2 // '>>'
    val dict = PDict(entries.result())
    val save = pos
    skipWs()
    if (consumeKeyword("stream")) {
      // EOL after 'stream': CRLF or LF (spec 7.3.8.1)
      if (pos < bytes.length && bytes(pos) == '\r') pos += 1
      if (pos < bytes.length && bytes(pos) == '\n') pos += 1
      val dataStart = pos
      val len = dict.get("Length") match {
        case Some(PNum(v)) => v.toInt
        case _ => -1 // indirect or missing: scan for endstream
      }
      val dataEnd =
        if (len >= 0 && dataStart + len <= bytes.length &&
            endstreamNear(dataStart + len)) dataStart + len
        else scanEndstream(dataStart)
      pos = dataEnd
      skipWs()
      consumeKeyword("endstream")
      PStream(dict, java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd))
    } else { pos = save; dict }
  }

  private def endstreamNear(p: Int): Boolean = {
    var i = p
    val limit = math.min(bytes.length, p + 4)
    while (i < limit && (bytes(i) == '\r' || bytes(i) == '\n' || bytes(i) == ' ')) i += 1
    i + 9 <= bytes.length && new String(bytes, i, 9, java.nio.charset.StandardCharsets.ISO_8859_1) == "endstream"
  }

  private def scanEndstream(from: Int): Int = {
    val target = "endstream".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = from
    while (i + target.length <= bytes.length) {
      var j = 0
      while (j < target.length && bytes(i + j) == target(j)) j += 1
      if (j == target.length) {
        // strip at most one EOL before the keyword
        var e = i
        if (e > from && bytes(e - 1) == '\n') e -= 1
        if (e > from && bytes(e - 1) == '\r') e -= 1
        return e
      }
      i += 1
    }
    bytes.length
  }
}

/** Cross-reference machinery + object fetch (SURVEY.md §2.1 S3-S9): startxref
  * scan, classic xref tables with /Prev chains, xref streams (/W,/Index),
  * object streams (/Type/ObjStm), and the never-fail full-file recovery scan
  * (reference XRef, pdf.combined.js:43156-43664; recovery indexObjects
  * 43341-43428).
  */
final class PdfFile(val bytes: Array[Byte]) {

  /** objNum -> Right(byte offset) | Left((objstm num, index within)). */
  private val entries = mutable.Map.empty[Int, Either[(Int, Int), Int]]
  private val cache = mutable.Map.empty[Int, PObj]
  var trailer: PDict = PDict(Map.empty)
  private var recovered = false
  private var decryptor: Option[Decryptor] = None
  private var encryptNum: Int = -1
  // declared before the parseXRef()/initDecryptor() constructor statements —
  // fetch runs during construction, so this must already be initialized
  private val inFlight = mutable.Set.empty[Int]

  parseXRef()
  initDecryptor()

  /** Standard security handler (empty user password). The /Encrypt dict object
    * itself is never encrypted; it is fetched before the decryptor exists. */
  private def initDecryptor(): Unit =
    try {
      trailer.get("Encrypt").foreach { encObj =>
        encryptNum = encObj match { case PRef(n, _) => n; case _ => -1 }
        resolve(encObj) match {
          case d: PDict =>
            val docId = trailer.get("ID").map(resolve) match {
              case Some(PArr(items)) if items.nonEmpty =>
                resolve(items.head) match { case PStr(b) => b; case _ => Array.emptyByteArray }
              case _ => Array.emptyByteArray
            }
            decryptor = Decryptor.fromEncryptDict(d, docId, resolve)
          case _ => ()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Recursively decrypt strings and stream bytes of a fetched object
    * (xref streams are never encrypted; stream /Length stays plaintext). */
  private def decryptObj(o: PObj, dec: Decryptor, num: Int, gen: Int): PObj = o match {
    case PStream(d, raw) =>
      val isXref = d.get("Type").contains(PName("XRef"))
      // /EncryptMetadata false: the XMP metadata stream is stored plaintext —
      // running the cipher over it would garble it (reference fetches it with
      // suppressEncryption, pdf.combined.js:42562-42565)
      val isPlainMeta = !dec.encryptMetadata &&
        d.get("Type").contains(PName("Metadata"))
      val dd = decryptObj(d, dec, num, gen).asInstanceOf[PDict]
      if (isXref || isPlainMeta) PStream(dd, raw) else PStream(dd, dec.decrypt(raw, num, gen))
    case PStr(b) => PStr(dec.decrypt(b, num, gen))
    case PArr(items) => PArr(items.map(decryptObj(_, dec, num, gen)))
    case PDict(e) => PDict(e.map { case (k, v) => k -> decryptObj(v, dec, num, gen) })
    case other => other
  }

  def resolve(o: PObj): PObj = o match {
    case PRef(num, _) => resolve(fetch(num))
    case other => other
  }
  def dictGet(d: PDict, key: String): Option[PObj] =
    d.get(key).map(resolve).filter(_ != PNull)

  def decodeStream(s: PStream): Array[Byte] = Filters.decode(s, resolve)

  def fetch(num: Int): PObj = cache.get(num) match {
    case Some(v) => v
    case None =>
      // A corrupt xref can claim an ObjStm lives inside itself (or a mutual
      // A-in-B/B-in-A cycle); fetchFromObjStm -> fetch would then recurse
      // unboundedly and StackOverflowError escapes every never-fail catch.
      if (!inFlight.add(num)) return PNull
      // no getOrElseUpdate: the recovery retry re-enters this key, and
      // re-entrant getOrElseUpdate on a mutable map is undefined
      val v =
        try entries.get(num) match {
          case Some(Right(offset)) if offset >= 0 && offset < bytes.length =>
            parseObjectAt(offset, num)
          case Some(Left((stmNum, idx))) => fetchFromObjStm(stmNum, idx)
          case _ =>
            if (!recovered) { recoverScan(); fetchNoCache(num) }
            else PNull
        } finally inFlight.remove(num)
      cache(num) = v
      v
  }

  private def parseObjectAt(offset: Int, expectNum: Int): PObj = {
    val p = new ObjParser(bytes, offset)
    p.skipWs()
    val n = p.parseNumber()
    p.skipWs()
    val gen = p.parseNumber().value.toInt
    if (!p.consumeKeyword("obj")) {
      if (!recovered && n.value.toInt != expectNum) { recoverScan(); return fetchNoCache(expectNum) }
      return PNull
    }
    var obj = p.parseValue()
    // an indirect /Length leaves the raw slice to the endstream scan; resolve
    // and re-slice when the scan-derived slice disagrees with the real length
    obj match {
      case PStream(dict, raw) =>
        dict.get("Length") match {
          case Some(r: PRef) =>
            resolve(r) match {
              case PNum(v) if v.toInt >= 0 && v.toInt <= raw.length =>
                obj = PStream(dict, java.util.Arrays.copyOf(raw, v.toInt))
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    decryptor match {
      case Some(dec) if expectNum != encryptNum => obj = decryptObj(obj, dec, expectNum, gen)
      case _ => ()
    }
    obj
  }

  private def fetchNoCache(num: Int): PObj = entries.get(num) match {
    case Some(Right(offset)) if offset >= 0 && offset < bytes.length => parseObjectAt(offset, num)
    case Some(Left((stmNum, idx))) => fetchFromObjStm(stmNum, idx)
    case _ => PNull
  }

  private def fetchFromObjStm(stmNum: Int, idx: Int): PObj = {
    resolve(fetch(stmNum)) match {
      case s: PStream =>
        val data = decodeStream(s)
        val n = dictGet(s.dict, "N").collect { case PNum(v) => v.toInt }.getOrElse(0)
        val first = dictGet(s.dict, "First").collect { case PNum(v) => v.toInt }.getOrElse(0)
        if (idx >= n) return PNull
        val hp = new ObjParser(data, 0)
        var off = -1
        var i = 0
        while (i <= idx) {
          hp.skipWs(); hp.parseNumber() // obj num
          hp.skipWs(); val o = hp.parseNumber()
          if (i == idx) off = o.value.toInt
          i += 1
        }
        if (off < 0) PNull
        else new ObjParser(data, first + off).parseValue()
      case _ => PNull
    }
  }

  // ── xref parsing ──────────────────────────────────────────────────────────

  private def parseXRef(): Unit = {
    try {
      val start = findStartXRef()
      if (start < 0) { recoverScan(); return }
      val visited = mutable.Set.empty[Int]
      var offset = start
      while (offset >= 0 && offset < bytes.length && visited.add(offset)) {
        offset = parseXRefSection(offset)
      }
      if (entries.isEmpty) recoverScan()
    } catch { case scala.util.control.NonFatal(_) => recoverScan() }
  }

  private def findStartXRef(): Int = {
    val tail = math.max(0, bytes.length - 1024)
    val s = new String(bytes, tail, bytes.length - tail, java.nio.charset.StandardCharsets.ISO_8859_1)
    val i = s.lastIndexOf("startxref")
    if (i < 0) return -1
    val p = new ObjParser(bytes, tail + i + "startxref".length)
    p.skipWs()
    p.parseNumber().value.toInt
  }

  /** Parse one xref section (table or stream) at `offset`; returns /Prev or -1. */
  private def parseXRefSection(offset: Int): Int = {
    val p = new ObjParser(bytes, offset)
    if (p.consumeKeyword("xref")) {
      // classic table: subsections "first count" then 20-byte entries
      p.skipWs()
      var progressing = true
      while (progressing && !p.peekKeyword("trailer") && p.pos < bytes.length) {
        val before = p.pos
        val first = p.parseNumber().value.toInt
        if (p.pos == before) progressing = false
        else {
        p.skipWs()
        val count = p.parseNumber().value.toInt
        p.skipWs()
        var i = 0
        while (i < count) {
          val off = p.parseNumber().value.toInt
          p.skipWs()
          p.parseNumber() // gen
          p.skipWs()
          val kind = if (p.pos < bytes.length) bytes(p.pos).toChar else 'f'
          p.pos += 1
          val num = first + i
          if (kind == 'n' && !entries.contains(num)) entries(num) = Right(off)
          p.skipWs()
          i += 1
        }
        }
      }
      if (p.consumeKeyword("trailer")) {
        p.parseValue() match {
          case d: PDict =>
            mergeTrailer(d)
            // hybrid-reference file: /XRefStm points at an xref stream with
            // entries that take precedence in newer readers; parse it too
            d.get("XRefStm") match {
              case Some(PNum(v)) => parseXRefSection(v.toInt)
              case _ => ()
            }
            d.get("Prev") match {
              case Some(PNum(v)) => return v.toInt
              case _ => ()
            }
          case _ => ()
        }
      }
      -1
    } else {
      // xref stream: "N G obj << /Type /XRef ... >> stream"
      p.skipWs(); p.parseNumber(); p.skipWs(); p.parseNumber()
      if (!p.consumeKeyword("obj")) return -1
      p.parseValue() match {
        case s: PStream =>
          val dict = s.dict
          mergeTrailer(dict)
          val data = decodeStream(s)
          val w = dictGet(dict, "W") match {
            case Some(PArr(items)) => items.map(resolve).collect { case PNum(v) => v.toInt }
            case _ => return -1
          }
          val size = dictGet(dict, "Size").collect { case PNum(v) => v.toInt }.getOrElse(0)
          val index: Vector[Int] = dictGet(dict, "Index") match {
            case Some(PArr(items)) => items.map(resolve).collect { case PNum(v) => v.toInt }
            case _ => Vector(0, size)
          }
          val rowLen = w.sum
          var pos = 0
          var sec = 0
          while (sec + 1 < index.length) {
            val first = index(sec)
            val count = index(sec + 1)
            var i = 0
            while (i < count && pos + rowLen <= data.length) {
              var f = Array(if (w(0) == 0) 1L else 0L, 0L, 0L)
              var fi = 0
              var b = 0
              while (fi < 3) {
                var v = 0L
                var k = 0
                while (k < w(fi)) { v = (v << 8) | (data(pos + b) & 0xff); b += 1; k += 1 }
                if (w(fi) > 0) f = { f(fi) = v; f }
                fi += 1
              }
              val num = first + i
              if (!entries.contains(num)) {
                f(0) match {
                  case 1L => entries(num) = Right(f(1).toInt)
                  case 2L => entries(num) = Left((f(1).toInt, f(2).toInt))
                  case _ => () // free
                }
              }
              pos += rowLen
              i += 1
            }
            sec += 2
          }
          dictGet(dict, "Prev").collect { case PNum(v) => v.toInt }.getOrElse(-1)
        case _ => -1
      }
    }
  }

  private def mergeTrailer(d: PDict): Unit = {
    // first-seen wins: the newest section in the update chain is parsed first
    trailer = PDict(d.entries ++ trailer.entries)
  }

  /** Never-fail recovery: scan the whole file for "N G obj" headers (the
    * reference's XRef.indexObjects). Later offsets win — incremental updates
    * append replacement objects at the end of the file. */
  private def recoverScan(): Unit = {
    recovered = true
    val re = "(\\d+)\\s+(\\d+)\\s+obj\\b".r
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    for (m <- re.findAllMatchIn(s)) {
      // only accept headers at a line start-ish boundary
      val at = m.start
      if (at == 0 || s.charAt(at - 1) < '0' || s.charAt(at - 1) > '9') {
        entries(m.group(1).toInt) = Right(at)
      }
    }
    if (trailer.entries.isEmpty || !trailer.has("Root")) {
      val ti = s.lastIndexOf("trailer")
      if (ti >= 0) {
        val p = new ObjParser(bytes, ti + "trailer".length)
        p.parseValue() match {
          case d: PDict => mergeTrailer(d)
          case _ => ()
        }
      }
      if (!trailer.has("Root")) {
        // find any /Type /Catalog object
        val ci = s.indexOf("/Catalog")
        if (ci >= 0) {
          val hi = s.lastIndexOf("obj", ci)
          if (hi > 0) {
            val m2 = "(\\d+)\\s+(\\d+)\\s+obj".r.findAllMatchIn(s.substring(0, hi + 3)).toSeq.lastOption
            m2.foreach(m => mergeTrailer(PDict(Map("Root" -> PRef(m.group(1).toInt, m.group(2).toInt)))))
          }
        }
      }
    }
  }
}
