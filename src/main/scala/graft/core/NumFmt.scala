package graft.core

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
    * 10 fractional digits; on an exact tie pick the larger n (towards +inf).
    *
    * r7: computed directly from the double's bits — |v| = m·2^e exactly, so
    * n = round(|v|·10^10) is one BigInteger multiply + (for e < 0) one
    * divideAndRemainder by 2^−e with an explicit half-up / negative-tie-
    * towards-zero rule. Replaces `new BigDecimal(v).setScale(10, …)`, which
    * materializes the full (up to ~1070-digit) exact expansion per call; the
    * semantics are unchanged (NumFmtSpec fuzzes equality with the BigDecimal
    * reference over coordinate-range, tiny, and raw-bits doubles). */
  private val Ten10 = java.math.BigInteger.valueOf(10000000000L)

  private def toFixed10(v: Double): String = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val neg = bits < 0
    val expField = ((bits >>> 52) & 0x7ff).toInt
    val fracField = bits & 0xfffffffffffffL
    // inf/NaN never reach pf (coordinates are finite by construction)
    val (m, e) =
      if (expField == 0) (fracField, -1074) // subnormal
      else (fracField | (1L << 52), expField - 1075)
    val m10 = java.math.BigInteger.valueOf(m).multiply(Ten10)
    val n =
      if (e >= 0) m10.shiftLeft(e)
      else {
        val div = java.math.BigInteger.ONE.shiftLeft(-e)
        val qr = m10.divideAndRemainder(div)
        val cmp = qr(1).shiftLeft(1).compareTo(div)
        // towards +inf on a tie: away from zero for v > 0, towards zero for v < 0
        if (cmp > 0 || (cmp == 0 && !neg)) qr(0).add(java.math.BigInteger.ONE)
        else qr(0)
      }
    val digits = n.toString
    val s =
      if (digits.length <= 10)
        "0." + "0" * (10 - digits.length) + digits
      else
        digits.substring(0, digits.length - 10) + "." + digits.substring(digits.length - 10)
    // BigDecimal.toPlainString drops the sign of a zero result; match it
    if (neg && n.signum != 0) "-" + s else s
  }

  /** Format float exactly like the reference's `pf`. */
  def pf(v: Double): String = {
    // JS `value === (value | 0)` (int32 wrap); the toInt saturation differs only
    // where toFixed prints the same digits anyway.
    val i = v.toInt
    if (i.toDouble == v) return i.toString
    // Fast path (the extraction/encode hot loop calls pf once per glyph): the
    // JDK's shortest-repr Double.toString, accepted only when provably equal
    // to toFixed(10)+strip. Double.toString prints a decimal D that uniquely
    // identifies v, so |D − v_exact| ≤ ulp(v)/2; for |v| < 2^19 that bound is
    // < 0.5e-10, hence when D carries ≤ 10 fractional digits it is strictly
    // the nearest multiple of 1e-10 to v's exact binary expansion — exactly
    // the digits toFixed(10) rounds to (no tie can occur, so HALF_UP vs the
    // JS negative-tie rule never engages). Trailing zeros never appear in a
    // non-integral shortest repr, so the strip is a no-op. Anything outside
    // the proof (scientific notation, > 10 fraction digits, |v| ≥ 2^19)
    // falls through to the exact BigDecimal path. NumFmtSpec fuzzes this
    // equivalence against the BigDecimal reference across the coordinate
    // range and beyond.
    if (v > -524288.0 && v < 524288.0) {
      val s = java.lang.Double.toString(v)
      val dot = s.indexOf('.')
      if (dot >= 0 && s.length - dot - 1 <= 10 && s.indexOf('E') < 0) return s
    }
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
