package graft.extract

/** Bidi-lite (reference `bidi`, pdf.combined.js:1788-1990: UAX#9-lite with a
  * 30% RTL-character heuristic). Applied per line on the document-text
  * reading-order surface (`PdfDocument.extractPageText`) — the reference runs
  * its bidi transform in getTextContent and never in the SVG path, so the
  * golden/tspan surface stays untouched.
  *
  * The transform is a visual→logical flip for RTL-dominant lines that is
  * RUN-aware, not a whole-line character reverse: maximal runs of
  * strongly-LTR characters and European digits keep their internal order
  * (a Latin word or a number embedded in a Hebrew line must not come out
  * letter-reversed — the reference's level-based reorder preserves them too),
  * while everything else reverses with bracket mirroring. Code points are the
  * iteration unit, so surrogate pairs survive intact.
  */
object Bidi {

  private def isRtlChar(c: Char): Boolean =
    (c >= 0x0590 && c <= 0x08ff) || // Hebrew, Arabic, Syriac, …
      (c >= 0xfb1d && c <= 0xfdff) || (c >= 0xfe70 && c <= 0xfeff)

  private val mirrored = Map(
    '(' -> ')', ')' -> '(', '[' -> ']', ']' -> '[',
    '{' -> '}', '}' -> '{', '<' -> '>', '>' -> '<')

  /** RTL fraction over strong-direction characters. */
  def rtlRatio(s: String): Double = {
    var rtl = 0
    var strong = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isRtlChar(c)) { rtl += 1; strong += 1 }
      else if (Character.isLetter(c)) strong += 1
      i += 1
    }
    if (strong == 0) 0.0 else rtl.toDouble / strong
  }

  /** Strongly-LTR or European-digit code point — keeps internal run order. */
  private def keepsOrder(cp: Int): Boolean = {
    val d = Character.getDirectionality(cp)
    d == Character.DIRECTIONALITY_LEFT_TO_RIGHT ||
      d == Character.DIRECTIONALITY_EUROPEAN_NUMBER
  }

  /** Run-aware visual→logical flip when the 30% heuristic fires (the
    * reference's threshold); otherwise identity. */
  def reverseIfRtl(s: String, threshold: Double = 0.3): String =
    if (rtlRatio(s) < threshold) s
    else {
      // atoms: an LTR/digit run stays one atom (internal order kept); every
      // other code point is its own atom (mirror-mapped). Atom ORDER reverses.
      val atoms = scala.collection.mutable.ArrayBuffer.empty[String]
      val n = s.length
      var i = 0
      while (i < n) {
        val cp = s.codePointAt(i)
        if (keepsOrder(cp)) {
          var j = i
          while (j < n && keepsOrder(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
          atoms += s.substring(i, j)
          i = j
        } else {
          val cc = Character.charCount(cp)
          val piece = s.substring(i, i + cc)
          atoms += (if (cc == 1) mirrored.get(piece.charAt(0)).map(_.toString).getOrElse(piece)
                    else piece)
          i += cc
        }
      }
      val sb = new StringBuilder(n)
      var k = atoms.length - 1
      while (k >= 0) { sb.append(atoms(k)); k -= 1 }
      sb.toString
    }
}
