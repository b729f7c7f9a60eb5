package graft

/** Minimal recursive-descent JSON parser for fixture files (test scope only
  * — the build carries no JSON dependency). Handles the full JSON grammar
  * including \uXXXX escapes; objects preserve insertion order. */
object JsonMini {
  sealed trait J
  case object JNull extends J
  final case class JBool(v: Boolean) extends J
  final case class JNum(v: Double) extends J
  final case class JStr(v: String) extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JObj(fields: Vector[(String, J)]) extends J {
    def apply(key: String): J = fields.find(_._1 == key).map(_._2).getOrElse(JNull)
  }

  def parse(s: String): J = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.i == s.length, s"trailing content at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      require(i < s.length && s.charAt(i) == c, s"expected $c at $i")
      i += 1
    }
    def value(): J = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val b = Vector.newBuilder[(String, J)]
          if (s.charAt(i) == '}') { i += 1 }
          else {
            var go = true
            while (go) {
              ws()
              val k = str()
              ws(); expect(':')
              b += k -> value()
              ws()
              if (s.charAt(i) == ',') i += 1 else { expect('}'); go = false }
            }
          }
          JObj(b.result())
        case '[' =>
          i += 1; ws()
          val b = Vector.newBuilder[J]
          if (s.charAt(i) == ']') { i += 1 }
          else {
            var go = true
            while (go) {
              b += value()
              ws()
              if (s.charAt(i) == ',') i += 1 else { expect(']'); go = false }
            }
          }
          JArr(b.result())
        case '"' => JStr(str())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ =>
          val start = i
          while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
          JNum(s.substring(start, i).toDouble)
      }
    }
    def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case other => sb.append(other) // \" \\ \/
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
  }
}
