package graft.extract

/** Markdown → main-content text: the transcript corpora this engine targets
  * carry markdown turn payloads alongside HTML/SVG/PDF, so the extractor
  * treats it as a first-class dialect. Line-structural elements (front
  * matter, headings, blockquotes, list markers, fences) strip to their
  * content; inline emphasis/code/link syntax unwraps to the visible text;
  * backslash escapes resolve last, so `\*` survives as a literal `*`.
  * CommonMark's full grammar is public and far larger — this covers the
  * constructs that carry or hide content, which is what extraction needs.
  */
object MarkdownLite {

  final case class Ex(text: String, droppedLines: Int)

  private val Heading = "^#{1,6}\\s+(.*)$".r
  private val Blockquote = "^(?:>\\s?)+(.*)$".r
  private val Bullet = "^\\s*(?:[-*+]|\\d+\\.)\\s+(.*)$".r

  /** Escape-aware single-pass inline processor: resolves backslash escapes,
    * keeps code-span content verbatim (CommonMark: escapes do not apply
    * inside code spans), unwraps emphasis pairs and link/image syntax;
    * unmatched markers stay literal. Escape awareness is backslash-PARITY
    * based (`\\**` is an escaped backslash followed by a live marker),
    * which regex lookbehinds cannot express. */
  private def inline(s: String): String = {
    val n = s.length
    // marker at j is live iff preceded by an even number of backslashes
    def live(j: Int): Boolean = {
      var k = j - 1
      var bs = 0
      while (k >= 0 && s.charAt(k) == '\\') { bs += 1; k -= 1 }
      bs % 2 == 0
    }
    def findLive(marker: String, from: Int): Int = {
      var j = s.indexOf(marker, from)
      while (j >= 0 && !live(j)) j = s.indexOf(marker, j + 1)
      j
    }
    val out = new StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) { out.append(s.charAt(i + 1)); i += 2 }
      else if (c == '`') {
        val close = s.indexOf('`', i + 1) // code spans: no escapes inside
        if (close < 0) { out.append(c); i += 1 }
        else { out.append(s.substring(i + 1, close)); i = close + 1 }
      } else if ((c == '*' || c == '_') && live(i)) {
        val double = i + 1 < n && s.charAt(i + 1) == c
        val marker = if (double) s"$c$c" else c.toString
        val close = findLive(marker, i + marker.length)
        if (close < 0) { out.append(c); i += 1 }
        else {
          out.append(inline(s.substring(i + marker.length, close)))
          i = close + marker.length
        }
      } else if (c == '!' && i + 1 < n && s.charAt(i + 1) == '[' && live(i)) {
        parseLink(s, i + 1) match {
          case Some((alt, end)) => out.append(inline(alt)); i = end
          case None => out.append(c); i += 1
        }
      } else if (c == '[' && live(i)) {
        parseLink(s, i) match {
          case Some((txt, end)) => out.append(inline(txt)); i = end
          case None => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** `[text](url)` starting at the `[` — returns (text, index past `)`). */
  private def parseLink(s: String, open: Int): Option[(String, Int)] = {
    var j = open + 1
    var bs = false
    while (j < s.length && (bs || s.charAt(j) != ']')) {
      bs = !bs && s.charAt(j) == '\\'
      j += 1
    }
    if (j >= s.length || j + 1 >= s.length || s.charAt(j + 1) != '(') return None
    val txt = s.substring(open + 1, j)
    var k = j + 2
    while (k < s.length && s.charAt(k) != ')') k += 1
    if (k >= s.length) None else Some((txt, k + 1))
  }

  def strip(md: String): Ex = {
    var dropped = 0
    val lines = md.split("\n", -1)
    var i = 0
    // YAML front matter: leading --- block is metadata, not content
    if (lines.nonEmpty && lines(0).trim == "---") {
      var j = 1
      while (j < lines.length && lines(j).trim != "---") j += 1
      if (j < lines.length) { dropped += j + 1; i = j + 1 }
    }
    val out = new StringBuilder
    var inFence = false
    while (i < lines.length) {
      val raw = lines(i)
      if (raw.trim.startsWith("```")) {
        inFence = !inFence
        dropped += 1
      } else if (inFence) {
        if (out.nonEmpty) out.append('\n')
        out.append(raw) // fenced content is verbatim — no inline processing
      } else if (raw.trim.isEmpty) {
        // blank lines are CONTENT once text has started (consecutive newlines
        // round-trip); leading blanks — including the separator right after a
        // front-matter fence — are structural and drop
        if (out.nonEmpty) { out.append('\n'); out.append(raw) }
        else dropped += 1
      } else {
        val structural = raw match {
          case Heading(rest) => rest
          case Blockquote(rest) => rest
          case Bullet(rest) => rest
          case other => other
        }
        val t = inline(structural)
        if (out.nonEmpty) out.append('\n')
        out.append(t)
      }
      i += 1
    }
    Ex(out.toString, dropped)
  }
}
