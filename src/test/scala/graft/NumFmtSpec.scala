package graft

import graft.core.NumFmt._
import org.scalatest.funsuite.AnyFunSuite

class NumFmtSpec extends AnyFunSuite {

  test("pf integers pass through") {
    assert(pf(0.0) == "0")
    assert(pf(-0.0) == "0")
    assert(pf(612.0) == "612")
    assert(pf(-13.0) == "-13")
  }

  test("pf fixed-10 with trailing-zero strip (reference sample coordinates)") {
    // values straight from docs/svg-syntax.md / FIXTURES.md §2
    assert(pf(4.5573950472) == "4.5573950472")
    assert(pf(11.0377449208) == "11.0377449208")
    assert(pf(11.9552) == "11.9552")
    assert(pf(0.5) == "0.5")
    assert(pf(-13.55) == "-13.55")
  }

  test("pf rounds like JS toFixed(10)") {
    assert(pf(1.0 / 3.0) == "0.3333333333")
    assert(pf(2.0 / 3.0) == "0.6666666667")
    assert(pf(1e-11) == "0") // rounds to 0.0000000000 → "0"
    assert(pf(0.00048828125) == "0.0004882813") // exact binary tie → larger n
    assert(pf(-0.00048828125) == "-0.0004882812") // negative tie → towards zero
  }

  test("pf fast path is byte-identical to the BigDecimal reference (fuzz)") {
    // the r7 shortest-repr fast path must never change a byte: compare against
    // a local copy of the original exact-BigDecimal formulation
    def refToFixed10(v: Double): String = {
      import java.math.{BigDecimal => JBD, RoundingMode}
      val bd = new JBD(v)
      val up = bd.setScale(10, RoundingMode.HALF_UP)
      val r =
        if (v >= 0) up
        else {
          val down = bd.setScale(10, RoundingMode.HALF_DOWN)
          if (up.compareTo(down) != 0) down else up
        }
      r.toPlainString
    }
    def refPf(v: Double): String = {
      val i = v.toInt
      if (i.toDouble == v) return i.toString
      val s = refToFixed10(v)
      if (s.charAt(s.length - 1) != '0') return s
      var j = s.length - 1
      while (s.charAt(j) == '0') j -= 1
      s.substring(0, if (s.charAt(j) == '.') j else j + 1)
    }
    val rng = new java.util.Random(20260822L)
    def check(v: Double): Unit =
      assert(pf(v) == refPf(v), s"pf($v): fast='${pf(v)}' ref='${refPf(v)}'")
    // coordinate-scale values crossing the 2^19 fast-path boundary
    (0 until 400000).foreach(_ => check((rng.nextDouble() - 0.5) * 2e6))
    // glyph-advance-shaped values (sums of width*size/1000 increments)
    var x = 91.92
    (0 until 200000).foreach { _ =>
      check(x)
      x += (200 + rng.nextInt(600)) * 11.9552 / 1000.0
      if (x > 5e5) x = rng.nextDouble()
    }
    // tiny magnitudes (scientific-notation shapes must take the slow path)
    (0 until 200000).foreach(_ => check((rng.nextDouble() - 0.5) * 2e-3))
    // full-range doubles from raw bits (NaN/Inf excluded — pf is never fed those)
    (0 until 200000).foreach { _ =>
      val v = java.lang.Double.longBitsToDouble(rng.nextLong())
      if (!v.isNaN && !v.isInfinite) check(v)
    }
    Seq(0.1, -0.1, 1e-11, -1e-11, 0.00048828125, -0.00048828125, 524287.9999999999,
      524288.5, -524288.5, 1048576.3, 4.5573950472, 710.04, -13.55, 1e300, -1e300,
      java.lang.Double.MIN_VALUE, math.ulp(524288.0) * 3).foreach(check)
  }

  test("pm short forms") {
    assert(pm(Array(1, 0, 0, 1, 0, 0)) == "")
    assert(pm(Array(2, 0, 0, 3, 0, 0)) == "scale(2 3)")
    assert(pm(Array(1, 0, 0, 1, 91.92, 710.04)) == "translate(91.92 710.04)")
    assert(pm(Array(1, 0, 0, -1, 0, 792)) == "matrix(1 0 0 -1 0 792)")
    assert(pm(Array(0, 1, -1, 0, 0, 0)) == "rotate(90)")
  }
}
