package graft.core

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Byte-exact re-implementation of the reference's coordinate/matrix formatting.
  *
  * The reference serializes every coordinate with `pf` (JS `Number.toFixed(10)`
  * with trailing-zero strip, integer passthrough — pdf.combined.js:19948-19962)
  * and every transform with `pm` (identity/scale/rotate/translate short forms —
  * pdf.combined.js:19971-19990). Golden fixtures depend on these strings byte for
  * byte, so both are reproduced exactly, including JS rounding semantics.
  */
object NumFmt {

  /** JS `toFixed(10)`: round the exact decimal expansion of the binary double to
    * 10 fractional digits; on an exact tie pick the larger n (towards +inf). */
  private def toFixed10(v: Double): String = {
    val bd = new JBigDecimal(v) // exact binary expansion
    val up = bd.setScale(10, RoundingMode.HALF_UP)
    val r =
      if (v >= 0) up
      else {
        val down = bd.setScale(10, RoundingMode.HALF_DOWN)
        // tie on a negative value: JS picks the larger n = towards zero
        if (up.compareTo(down) != 0) down else up
      }
    r.toPlainString
  }

  /** Format float exactly like the reference's `pf`. */
  def pf(v: Double): String = {
    // JS `value === (value | 0)` (int32 wrap); the toInt saturation differs only
    // where toFixed prints the same digits anyway.
    val i = v.toInt
    if (i.toDouble == v) return i.toString
    val s = toFixed10(v)
    if (s.charAt(s.length - 1) != '0') return s
    var j = s.length - 1
    while (s.charAt(j) == '0') j -= 1
    s.substring(0, if (s.charAt(j) == '.') j else j + 1)
  }

  /** Format a 6-element affine matrix exactly like the reference's `pm`. */
  def pm(m: Array[Double]): String = {
    if (m(4) == 0 && m(5) == 0) {
      if (m(1) == 0 && m(2) == 0) {
        if (m(0) == 1 && m(3) == 1) return ""
        return s"scale(${pf(m(0))} ${pf(m(3))})"
      }
      if (m(0) == m(3) && m(1) == -m(2)) {
        val a = math.acos(m(0)) * 180 / math.Pi
        return s"rotate(${pf(a)})"
      }
    } else if (m(0) == 1 && m(1) == 0 && m(2) == 0 && m(3) == 1) {
      return s"translate(${pf(m(4))} ${pf(m(5))})"
    }
    s"matrix(${pf(m(0))} ${pf(m(1))} ${pf(m(2))} ${pf(m(3))} ${pf(m(4))} ${pf(m(5))})"
  }

  /** Affine multiply m1·m2 (pdf.combined.js:2896-2905). */
  def mul(m1: Array[Double], m2: Array[Double]): Array[Double] = Array(
    m1(0) * m2(0) + m1(2) * m2(1),
    m1(1) * m2(0) + m1(3) * m2(1),
    m1(0) * m2(2) + m1(2) * m2(3),
    m1(1) * m2(2) + m1(3) * m2(3),
    m1(0) * m2(4) + m1(2) * m2(5) + m1(4),
    m1(1) * m2(4) + m1(3) * m2(5) + m1(5)
  )

  /** Apply affine to point (pdf.combined.js:2908-2912). */
  def apply(m: Array[Double], x: Double, y: Double): (Double, Double) =
    (m(0) * x + m(2) * y + m(4), m(1) * x + m(3) * y + m(5))

  val Identity: Array[Double] = Array(1, 0, 0, 1, 0, 0)
}
