package graft.svg

import graft.core.{GlyphRun, NumFmt}

import scala.collection.mutable.ArrayBuffer

/** Parses the reference's SVG output dialect back into positioned glyph runs.
  *
  * Hand-rolled forward scanner (no XML library): finds `svg:text`/`svg:tspan`
  * elements in document order, tracks the enclosing text transform, decodes the
  * xmlEncode entity set plus the common extras, and splits the space-joined
  * per-glyph `x` array. Document order is extraction order (FIXTURES.md §2).
  *
  * Tolerant by design (north-star: never fail the row) — malformed markup yields
  * the runs parsed so far plus an error count.
  */
object GlyphRunParser {

  final case class Parsed(runs: Vector[GlyphRun], errors: Int)

  def parse(svg: String): Parsed = {
    val runs = Vector.newBuilder[GlyphRun]
    var errors = 0
    var i = 0
    var textMatrix: Array[Double] = NumFmt.Identity
    val n = svg.length

    while (i < n) {
      val lt = svg.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (svg.startsWith("<svg:text", lt)) {
        val (attrs, end) = parseAttrs(svg, lt + 9)
        textMatrix = attrs.get("transform").map(parseTransform).getOrElse(NumFmt.Identity)
        i = end
      } else if (svg.startsWith("<svg:tspan", lt)) {
        val (attrs, tagEnd) = parseAttrs(svg, lt + 10)
        val close = svg.indexOf("</svg:tspan>", tagEnd)
        if (close < 0) { errors += 1; i = n }
        else {
          val raw = svg.substring(tagEnd, close)
          val text = xmlDecode(raw)
          val xs = attrs.get("x").map(parseDoubles).getOrElse(Array.empty[Double])
          val y = attrs.get("y").flatMap(parseDouble).getOrElse(0.0)
          val size = attrs.get("font-size")
            .map(s => s.stripSuffix("px")).flatMap(parseDouble).getOrElse(0.0)
          if (text.nonEmpty) {
            runs += GlyphRun(
              text, xs, y,
              attrs.getOrElse("font-family", ""), size,
              attrs.getOrElse("font-style", "normal"),
              attrs.getOrElse("font-weight", "normal"),
              attrs.getOrElse("fill", "rgb(0,0,0)"),
              textMatrix)
          }
          i = close + 12
        }
      } else {
        // skip any other tag
        val gt = svg.indexOf('>', lt)
        i = if (gt < 0) n else gt + 1
      }
    }
    Parsed(runs.result(), errors)
  }

  /** Parse attributes from after the tag name to the closing '>'.
    * Returns (attrs, index just past '>'). */
  private def parseAttrs(s: String, from: Int): (Map[String, String], Int) = {
    val attrs = Map.newBuilder[String, String]
    var i = from
    val n = s.length
    var done = false
    while (!done && i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i >= n || s.charAt(i) == '>' ) { done = true; if (i < n) i += 1 }
      else if (s.charAt(i) == '/' ) { i += 1 } // self-closing
      else {
        val eq = s.indexOf('=', i)
        if (eq < 0) { done = true; i = n }
        else {
          val name = s.substring(i, eq).trim
          var j = eq + 1
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val end = s.indexOf(q, j + 1)
            if (end < 0) { done = true; i = n }
            else {
              attrs += name -> xmlDecode(s.substring(j + 1, end))
              i = end + 1
            }
          } else { done = true; i = n }
        }
      }
    }
    (attrs.result(), i)
  }

  /** Inverse of the reference's pm() short forms: "", scale(..), rotate(..),
    * translate(..), matrix(..); trailing " scale(1, -1)" (the Y flip on svg:text)
    * is recognized and dropped — run coordinates stay in text space. */
  def parseTransform(t0: String): Array[Double] = {
    var m = NumFmt.Identity
    val t = t0.trim
    var i = 0
    while (i < t.length) {
      val open = t.indexOf('(', i)
      if (open < 0) { i = t.length }
      else {
        val name = t.substring(i, open).trim
        val close = t.indexOf(')', open)
        if (close < 0) { i = t.length }
        else {
          val nums = parseDoubles(t.substring(open + 1, close).replace(',', ' '))
          val part: Array[Double] = name match {
            case "matrix" if nums.length == 6 => nums
            case "scale" if nums.length == 2 => Array(nums(0), 0, 0, nums(1), 0, 0)
            case "scale" if nums.length == 1 => Array(nums(0), 0, 0, nums(0), 0, 0)
            case "translate" if nums.length == 2 => Array(1, 0, 0, 1, nums(0), nums(1))
            case "rotate" if nums.length == 1 =>
              val a = math.toRadians(nums(0))
              Array(math.cos(a), math.sin(a), -math.sin(a), math.cos(a), 0, 0)
            case _ => NumFmt.Identity
          }
          // drop the trailing Y flip the emitter always appends to svg:text
          val isFlip = part.sameElements(Array(1.0, 0, 0, -1.0, 0, 0))
          if (!isFlip) m = NumFmt.mul(m, part)
          i = close + 1
        }
      }
    }
    m
  }

  private def parseDouble(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s.trim)) catch { case _: NumberFormatException => None }

  def parseDoubles(s: String): Array[Double] = {
    val out = ArrayBuffer.empty[Double]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\n' || s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
      var j = i
      while (j < n && s.charAt(j) != ' ' && s.charAt(j) != '\n' && s.charAt(j) != '\t' && s.charAt(j) != '\r') j += 1
      if (j > i) parseDouble(s.substring(i, j)).foreach(out += _)
      i = j
    }
    out.toArray
  }

  /** Decode the xmlEncode set plus tolerated extras (&gt; &apos; &#NN; &#xNN;). */
  def xmlDecode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          val decoded: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.substring(2), 16))))
              catch { case _: Exception => None }
            case e if e.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(e.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
