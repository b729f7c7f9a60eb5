package graft.extract

import graft.core.{ExtractedTurn, Span, Turn, TurnMetrics}
import graft.eval.ContentEvaluator
import graft.html.Boilerplate
import graft.svg.GlyphRunParser

import java.nio.charset.StandardCharsets

/** Per-turn main-content extraction: payload sniff → dialect-specific parse →
  * reading-order text + character-offset spans + metrics.
  *
  * Dialects (FIXTURES.md §2-4):
  *   A: reference-dialect SVG positioned glyph runs → parse tspans → line reassembly
  *   B: HTML-wrapped turns → DOM heuristics boilerplate strip
  *   C: raw PDF content-stream fragment → tokenizer/evaluator → glyph runs → lines
  *   fallback: plain text passes through unchanged.
  *
  * Never throws: corrupt payloads degrade to the fallback with an error-marking
  * span (the reference's recovery discipline — XRef.indexObjects, EvaluatorPreprocessor
  * warn-and-continue).
  */
object Extractor {

  final case class Result(text: String, spans: Seq[Span], metrics: TurnMetrics)

  sealed trait Dialect
  object Dialect {
    case object Svg extends Dialect
    case object Html extends Dialect
    case object Pdf extends Dialect
    case object Plain extends Dialect
  }

  def sniff(payload: String): Dialect = {
    val t = payload.dropWhile(_.isWhitespace)
    if (t.startsWith("<svg:svg") || t.startsWith("<svg ") || t.contains("<svg:tspan")) Dialect.Svg
    else if (t.startsWith("<!") || t.startsWith("<html") || t.startsWith("<HTML") ||
             (t.startsWith("<") && t.length > 1 && (t.charAt(1).isLetter))) Dialect.Html
    else if (t.startsWith("BT") || t.startsWith("q ") || t.startsWith("/") ||
             hasContentStreamShape(t)) Dialect.Pdf
    else Dialect.Plain
  }

  /** Content-stream shape: a BT…ET block with at least one text-showing op. */
  private def hasContentStreamShape(t: String): Boolean = {
    val bt = t.indexOf("BT")
    bt >= 0 && t.indexOf("ET", bt) > bt &&
      (t.contains("Tj") || t.contains("TJ") || t.contains("Tf"))
  }

  def extract(payload: String): Result =
    try {
      sniff(payload) match {
        case Dialect.Svg =>
          val parsed = GlyphRunParser.parse(payload)
          val asm = LineAssembler.assemble(parsed.runs)
          Result(asm.text, asm.spans,
            TurnMetrics(parsed.runs.length, asm.text.length, parsed.errors))
        case Dialect.Html =>
          val ex = Boilerplate.extract(payload)
          Result(ex.text, ex.spans, TurnMetrics(ex.spans.length, ex.text.length, ex.droppedNodes))
        case Dialect.Pdf =>
          val res = ContentEvaluator.evaluate(payload.getBytes(StandardCharsets.ISO_8859_1))
          val asm = LineAssembler.assemble(res.runs)
          Result(asm.text, asm.spans, TurnMetrics(res.runs.length, asm.text.length, res.errors))
        case Dialect.Plain =>
          Result(payload, Seq(Span(0, payload.length, "text")), TurnMetrics(0, payload.length, 0))
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        // quarantine path: never fail the row (SURVEY.md §2.1 S6)
        Result(payload, Seq(Span(0, payload.length, "error")), TurnMetrics(0, payload.length, 1))
    }

  def extractTurn(t: Turn): ExtractedTurn = {
    val r = extract(t.text)
    ExtractedTurn(t.conv_id, t.turn_idx, r.text, r.spans, r.metrics)
  }
}
