package graft.extract

/** Flag-gated bidi-lite (reference `bidi`, pdf.combined.js:1788-1990: UAX#9-lite
  * with a 30% RTL-character heuristic). The golden corpus is pure LTR, so this
  * stays OFF by default (`Extractor` does not call it); it exists for RTL
  * payload deployments and is exercised by unit tests only.
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

  /** Reverse with bracket mirroring when the 30% heuristic fires (the
    * reference's threshold); otherwise identity. */
  def reverseIfRtl(s: String, threshold: Double = 0.3): String =
    if (rtlRatio(s) < threshold) s
    else {
      val sb = new StringBuilder(s.length)
      var i = s.length - 1
      while (i >= 0) {
        val c = s.charAt(i)
        sb.append(mirrored.getOrElse(c, c))
        i -= 1
      }
      sb.toString
    }
}
