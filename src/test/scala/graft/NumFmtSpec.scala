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

  test("pm short forms") {
    assert(pm(Array(1, 0, 0, 1, 0, 0)) == "")
    assert(pm(Array(2, 0, 0, 3, 0, 0)) == "scale(2 3)")
    assert(pm(Array(1, 0, 0, 1, 91.92, 710.04)) == "translate(91.92 710.04)")
    assert(pm(Array(1, 0, 0, -1, 0, 792)) == "matrix(1 0 0 -1 0 792)")
    assert(pm(Array(0, 1, -1, 0, 0, 0)) == "rotate(90)")
  }
}
