package graft

import graft.eval.{ContentEvaluator, PageResources}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1

/** QueueOptimizer text-block fusion (reference pdf.combined.js:47757-47825):
  * ≥3 same-font (BT, Tf, Tm, Tj, ET) quintets collapse to one
  * (BT, Tf, (Tm, Tj)+, ET). Per the vendored SVG backend every setTextMatrix
  * still opens a fresh tspan (20268-20283), so the emitted runs are the same —
  * the observable is the op stream: no BT/ET/Tf executes between the fused
  * shows (asserted via the evaluator's boundary-trace op counters).
  */
class FusionSpec extends AnyFunSuite {

  private def quintets(n: Int, font: String = "/F1", size: String = "12"): String =
    (0 until n).map { i =>
      s"BT $font $size Tf 1 0 0 1 ${72 + i * 40} 700 Tm (w$i) Tj ET"
    }.mkString(" ")

  private def runsAndTrace(content: String): (Vector[String], Vector[Array[String]]) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    ContentEvaluator.EvalTrace.sink = buf
    try {
      val r = ContentEvaluator.evaluatePage(
        content.getBytes(ISO_8859_1), PageResources.empty, fakeSpaces = true)
      (r.runs.map(_.text), buf.toVector.map(_.split("\t")))
    } finally ContentEvaluator.EvalTrace.sink = null
  }

  test("3+ same-font quintets fuse: no BT/ET/Tf between shows, output unchanged") {
    val (texts, trace) = runsAndTrace(quintets(4))
    assert(texts == Vector("w0", "w1", "w2", "w3"))
    // trace row fields: flushed, sameFrame, cBT, cET, cTf, cTm, cTd, cTc, ...
    // rows fire for show 2..4 (lastCtm set); fused => only a Tm between shows
    assert(trace.length == 3)
    trace.foreach { row =>
      assert(row(2) == "0", s"BT executed between fused shows: ${row.mkString(",")}")
      assert(row(3) == "0", "ET executed between fused shows")
      assert(row(4) == "0", "Tf executed between fused shows")
      assert(row(5) == "1", "exactly one Tm between fused shows")
    }
  }

  test("2 quintets stay unfused (below MIN=3)") {
    val (texts, trace) = runsAndTrace(quintets(2))
    assert(texts == Vector("w0", "w1"))
    assert(trace.length == 1)
    assert(trace.head(2) == "1") // the BT between the two blocks executed
  }

  test("font change breaks the fusion group") {
    val content = quintets(3) + " " + quintets(3, font = "/F2")
    val (texts, trace) = runsAndTrace(content)
    assert(texts == Vector("w0", "w1", "w2", "w0", "w1", "w2"))
    // 5 boundaries; the one crossing the font change must have executed BT
    assert(trace.count(_(2) != "0") == 1)
  }

  test("fusion is transparent to run content with mixed surrounding ops") {
    val content = "BT /F1 10 Tf 10 10 Td (pre) Tj ET " + quintets(5) +
      " BT /F1 10 Tf 10 40 Td (post) Tj ET"
    val (texts, _) = runsAndTrace(content)
    assert(texts == Vector("pre", "w0", "w1", "w2", "w3", "w4", "post"))
  }
}
