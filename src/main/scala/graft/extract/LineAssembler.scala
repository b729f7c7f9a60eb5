package graft.extract

import graft.core.{GlyphRun, Span}

import scala.collection.mutable.ArrayBuffer

/** Reassembles reading-order lines from positioned glyph runs.
  *
  * Generalizes the reference's reading-order text path (getTextContent,
  * pdf.combined.js:45900-46406): runs are grouped into lines by quantized
  * page-space baseline y, ordered top-to-bottom then left-to-right, and
  * word gaps between runs on a line are inferred geometrically with the
  * reference's fake-space factors — gap ≥ 0.3×spaceWidth → one space,
  * ≥ 1.5×spaceWidth → round(gap/spaceWidth) spaces (constants at
  * pdf.combined.js:45930-45932, addFakeSpaces 46138-46150).
  */
object LineAssembler {

  final case class Assembled(text: String, spans: Seq[Span], lines: Int)

  private val SpaceFactor = 0.3
  private val MultiSpaceFactor = 1.5
  private val MultiSpaceFactorMax = 4.0

  private final case class Placed(run: GlyphRun, x0: Double, x1: Double, y: Double)

  def assemble(runs: Seq[GlyphRun], lineSep: String = "\n"): Assembled = {
    if (runs.isEmpty) return Assembled("", Nil, 0)

    val placed = runs.map { r =>
      val x0 = if (r.xs.nonEmpty) r.xs(0) else 0.0
      // right edge: last glyph x + its metric advance (exact for payloads built
      // with our metrics-only fonts; close enough elsewhere — the thresholds
      // below have 0.3×spaceWidth slack, as the reference's do)
      val lastAdvance =
        if (r.text.nonEmpty) widthOf(r.fontFamily, r.text.last) * r.fontSize / 1000.0
        else 0.0
      val x1 = (if (r.xs.nonEmpty) r.xs.last else 0.0) + lastAdvance
      val (px0, _) = pagePoint(r, x0)
      val (px1, py) = pagePoint(r, x1)
      Placed(r, px0, px1, py)
    }

    // cluster lines on quantized baseline y (tolerance: 40% of median font size)
    val sizes = runs.map(r => r.fontSize * r.scale).sorted
    val tol = math.max(0.1, sizes(sizes.length / 2) * 0.4)

    // stable grouping: sort by y, start a new line when the gap exceeds tol
    val byY = placed.sortBy(p => (p.run.page, p.y))
    val lines = ArrayBuffer.empty[ArrayBuffer[Placed]]
    var curY = Double.NaN
    var curPage = -1
    byY.foreach { p =>
      if (lines.isEmpty || p.run.page != curPage || math.abs(p.y - curY) > tol) {
        curPage = p.run.page
        lines += ArrayBuffer(p)
        curY = p.y
      } else {
        lines.last += p
        // drift the cluster center slowly toward new members
        curY = (curY * (lines.last.length - 1) + p.y) / lines.last.length
      }
    }

    // reading order: page index ascending, then page y descending = top of page
    // first for y-up coordinates (the SVG page shell flips y; runs carry
    // text-space matrices where larger y is higher on the page), then x
    // ascending within the line.
    val ordered = lines.sortBy(l => (l.head.run.page, -l.map(_.y).max))

    val out = new StringBuilder
    val spans = ArrayBuffer.empty[Span]
    var lineCount = 0
    ordered.foreach { line =>
      if (out.nonEmpty) out.append(lineSep)
      lineCount += 1
      val sortedLine = line.sortBy(_.x0)
      val lineStart = out.length
      var prevEnd = Double.NaN
      sortedLine.foreach { p =>
        if (!prevEnd.isNaN) {
          val gap = p.x0 - prevEnd
          val spaceWidth = widthOf(p.run.fontFamily, ' ') * p.run.fontSize * p.run.scale / 1000.0
          if (spaceWidth > 0 && gap >= SpaceFactor * spaceWidth) {
            // R1/R5 (reference 46008-46014, 46276-46299): a gap above
            // 4×spaceWidth on a non-monospace font is a text-RUN BREAK (a
            // separate item), not a stretch of fake spaces — and the
            // reference's own flat-text rendering joins items with one space
            // (getinfo.js:55). Monospace fonts "fake as much space as
            // needed" (textRunBreakAllowed = !isMonospace).
            val mono = isMonospace(p.run.fontFamily)
            val k =
              if (gap < MultiSpaceFactor * spaceWidth) 1
              else if (!mono && gap > MultiSpaceFactorMax * spaceWidth) 1 // item break
              else math.max(1, math.round(gap / spaceWidth).toInt)
            out.append(" " * k)
          }
        }
        val start = out.length
        out.append(p.run.text)
        spans += Span(start, out.length, "run")
        prevEnd = p.x1
      }
      val _ = lineStart
    }
    Assembled(out.toString, spans.toSeq, lineCount)
  }

  /** Glyph advance in 1/1000 em: Courier-family fonts are monospaced 600; all
    * others use the Helvetica core-metrics table (metrics-only model, §2.5 F2). */
  private def widthOf(family: String, c: Char): Double =
    if (isMonospace(family)) 600.0
    else graft.eval.FontMetrics.Helvetica.widths(c.toInt)

  private def isMonospace(family: String): Boolean =
    family.contains("Courier") || family.contains("Mono")

  private def pagePoint(r: GlyphRun, x: Double): (Double, Double) = {
    val m = r.matrix
    val ty = -r.y // text-space y of the baseline
    (m(0) * x + m(2) * ty + m(4), m(1) * x + m(3) * ty + m(5))
  }
}
