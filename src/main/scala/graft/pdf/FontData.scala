package graft.pdf

import scala.collection.immutable.ArraySeq
import scala.io.Source

/** Public Adobe font data tables, loaded from resources under
  * graft/fontdata/ (extracted from the reference's vendored copies of the
  * public Adobe Glyph List, predefined encodings, CFF standard strings,
  * core-14 AFM metrics and standard-font alias maps —
  * pdf.combined.js:5170 (AGL), 339-586 (encodings), 37484 (CFF strings),
  * 12896 (metrics), 16291-16420 (font maps); all of it published Adobe data).
  */
object FontData {

  private def res(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(s"/graft/fontdata/$name")
    require(in != null, s"missing resource graft/fontdata/$name")
    Source.fromInputStream(in, "UTF-8").getLines().filterNot(l => l.isEmpty || l.startsWith("# "))
  }

  /** Adobe Glyph List: glyph name -> unicode code point. */
  lazy val glyphsUnicode: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    res("agl.txt").foreach { l =>
      val sp = l.indexOf(' ')
      if (sp > 0) b += l.substring(0, sp) -> Integer.parseInt(l.substring(sp + 1), 16)
    }
    b.result()
  }

  /** Predefined encodings as position->glyph-name arrays, replicating the
    * reference's literal array lengths (StandardEncoding is 252 entries there,
    * ExpertEncoding 255 — lookups and `.length` loops behave identically). */
  lazy val encodings: Map[String, ArraySeq[String]] = {
    val out = Map.newBuilder[String, ArraySeq[String]]
    var cur: Array[String] = null
    var curName: String = null
    def flush(): Unit = if (curName != null) out += curName -> ArraySeq.unsafeWrapArray(cur)
    res("encodings.txt").foreach { l =>
      if (l.startsWith("#enc ")) {
        flush()
        val parts = l.substring(5).split(" ")
        curName = parts(0)
        val len = parts(1).stripPrefix("len=").toInt
        cur = Array.fill(len)("")
      } else {
        val sp = l.indexOf(' ')
        cur(l.substring(0, sp).toInt) = l.substring(sp + 1)
      }
    }
    flush()
    out.result()
  }

  def standardEncoding: ArraySeq[String] = encodings("StandardEncoding")
  def winAnsiEncoding: ArraySeq[String] = encodings("WinAnsiEncoding")
  def macRomanEncoding: ArraySeq[String] = encodings("MacRomanEncoding")
  def symbolSetEncoding: ArraySeq[String] = encodings("SymbolSetEncoding")
  def zapfDingbatsEncoding: ArraySeq[String] = encodings("ZapfDingbatsEncoding")
  def expertEncoding: ArraySeq[String] = encodings("ExpertEncoding")

  def getEncoding(name: String): Option[ArraySeq[String]] = name match {
    case "WinAnsiEncoding" => Some(winAnsiEncoding)
    case "StandardEncoding" => Some(standardEncoding)
    case "MacRomanEncoding" => Some(macRomanEncoding)
    case "SymbolSetEncoding" => Some(symbolSetEncoding)
    case "ZapfDingbatsEncoding" => Some(zapfDingbatsEncoding)
    case "ExpertEncoding" => Some(expertEncoding)
    case "MacExpertEncoding" => Some(expertEncoding)
    case _ => None
  }

  /** CFF standard strings, SID 0..390. */
  lazy val cffStandardStrings: ArraySeq[String] =
    ArraySeq.unsafeWrapArray(res("cff-std-strings.txt").toArray)

  /** Core-14 metrics: font -> Left(monospace width) | Right(glyph name -> width). */
  lazy val metrics: Map[String, Either[Double, Map[String, Double]]] = {
    val out = Map.newBuilder[String, Either[Double, Map[String, Double]]]
    var curName: String = null
    var curMap = Map.newBuilder[String, Double]
    def flush(): Unit = if (curName != null) out += curName -> Right(curMap.result())
    res("metrics.txt").foreach { l =>
      if (l.startsWith("#font ")) {
        flush()
        val rest = l.substring(6)
        val sp = rest.indexOf(' ')
        if (sp > 0 && rest.charAt(sp + 1) == '=') {
          out += rest.substring(0, sp) -> Left(rest.substring(sp + 2).toDouble)
          curName = null
        } else {
          curName = rest
          curMap = Map.newBuilder[String, Double]
        }
      } else if (curName != null) {
        val sp = l.indexOf(' ')
        curMap += l.substring(0, sp) -> l.substring(sp + 1).toDouble
      }
    }
    flush()
    out.result()
  }

  private lazy val fontMaps: Map[String, Map[String, String]] = {
    val out = Map.newBuilder[String, Map[String, String]]
    var curName: String = null
    var curMap = Map.newBuilder[String, String]
    def flush(): Unit = if (curName != null) out += curName -> curMap.result()
    res("font-maps.txt").foreach { l =>
      if (l.startsWith("#map ")) {
        flush(); curName = l.substring(5); curMap = Map.newBuilder[String, String]
      } else {
        val sp = l.indexOf(' ')
        curMap += l.substring(0, sp) -> l.substring(sp + 1)
      }
    }
    flush()
    out.result()
  }

  def stdFontMap: Map[String, String] = fontMaps("stdFontMap")
  def nonStdFontMap: Map[String, String] = fontMaps("nonStdFontMap")
  def serifFonts: Set[String] = fontMaps("serifFonts").keySet
  def symbolsFonts: Set[String] = fontMaps("symbolsFonts").keySet

  /** getUnicodeForGlyph (pdf.combined.js:16676-16704): AGL lookup with
    * uniXXXX / uXXXX{XX} recovery (upper-case hex only). */
  def unicodeForGlyph(name: String): Int = {
    glyphsUnicode.get(name) match {
      case Some(u) => u
      case None =>
        if (name == null || name.isEmpty) return -1
        if (name.charAt(0) == 'u') {
          val n = name.length
          val hex =
            if (n == 7 && name.startsWith("uni")) name.substring(3)
            else if (n >= 5 && n <= 7) name.substring(1)
            else return -1
          if (hex == hex.toUpperCase && hex.forall(c => Character.digit(c, 16) >= 0)) {
            try {
              val u = Integer.parseInt(hex, 16)
              if (u >= 0) return u
            } catch { case _: NumberFormatException => () }
          }
        }
        -1
    }
  }

  /** ProblematicCharRanges (pdf.combined.js:34214-34233): fontChar codes in
    * these ranges are moved to the private-use area by adjustMapping. */
  private val problematicRanges: Array[Int] = Array(
    0x0000, 0x0020, 0x007F, 0x00A1, 0x00AD, 0x00AE,
    0x0600, 0x0780, 0x08A0, 0x10A0, 0x1780, 0x1800,
    0x2000, 0x2010, 0x2011, 0x2012, 0x2028, 0x2030, 0x205F, 0x2070,
    0x25CC, 0x25CD, 0xAA60, 0xAA80, 0xFFF0, 0x10000)

  def isProblematicUnicodeLocation(code: Int): Boolean = {
    var i = 0
    var j = problematicRanges.length - 1
    while (i < j) {
      val c = (i + j + 1) >> 1
      if (code < problematicRanges(c)) j = c - 1 else i = c
    }
    (i & 1) == 0
  }

  /** mapSpecialUnicodeValues (pdf.combined.js:16640-16647 + the special-PUA
    * symbol table): collapse Specials block, remap Adobe PUA symbols. */
  def mapSpecialUnicodeValues(code: Int): Int = {
    if (code >= 0xFFF0 && code <= 0xFFFF) 0
    else if (code >= 0xF600 && code <= 0xF8FF) specialPUASymbols.getOrElse(code, code)
    else code
  }

  private val specialPUASymbols: Map[Int, Int] = Map(
    63721 -> 0x00A9, 63193 -> 0x00A9, 63720 -> 0x00AE, 63194 -> 0x00AE,
    63722 -> 0x2122, 63195 -> 0x2122, 63729 -> 0x23A7, 63730 -> 0x23A8,
    63731 -> 0x23A9, 63740 -> 0x23AB, 63741 -> 0x23AC, 63742 -> 0x23AD,
    63726 -> 0x23A1, 63727 -> 0x23A2, 63728 -> 0x23A3, 63737 -> 0x23A4,
    63738 -> 0x23A5, 63739 -> 0x23A6, 63723 -> 0x239B, 63724 -> 0x239C,
    63725 -> 0x239D, 63734 -> 0x239E, 63735 -> 0x239F, 63736 -> 0x23A0)
}
