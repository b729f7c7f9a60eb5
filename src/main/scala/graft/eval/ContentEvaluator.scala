package graft.eval

import graft.core.{GlyphRun, NumFmt}
import graft.lex.{ContentLexer, Tok}

import scala.collection.mutable.ArrayBuffer

/** Rectangle painted by `re` — layout feature for rule/boilerplate heuristics
  * (the reference's 1×1 image-mask → solid-rule case, pdf.combined.js:47464-47483). */
final case class PageBox(x: Double, y: Double, w: Double, h: Double)

final case class EvalResult(runs: Vector[GlyphRun], boxes: Vector[PageBox], errors: Int)

/** Content-stream → positioned glyph runs.
  *
  * Fuses the reference's decode + render stages into one pass per row:
  * EvaluatorPreprocessor.read (arg collection, arity tolerance, unknown-command
  * skip — pdf.combined.js:47366-47434) feeding the SVGGraphics text state machine
  * (beginText/setTextMatrix/moveText/showText — pdf.combined.js:20256-20431).
  * Run-break semantics match the reference exactly: `Tm`/`Td`/`TD`/`T*`/`'`/`"`/
  * `Tf`/fill-color changes each start a new tspan; consecutive `Tj` extend one.
  *
  * Purely sequential per row — designed to run inside `mapPartitions` over a
  * typed Dataset with zero allocation beyond the output runs.
  */
object ContentEvaluator {

  private val FontMatrix0 = 0.001 // FONT_IDENTITY_MATRIX[0]

  private final class State {
    var ctm: Array[Double] = NumFmt.Identity
    var textMatrix: Array[Double] = NumFmt.Identity
    var lineMatrix: Array[Double] = NumFmt.Identity
    var x, y, lineX, lineY = 0.0
    var charSpacing, wordSpacing = 0.0
    var textHScale = 1.0
    var leading = 0.0 // stored negated, as the SVG backend does (setLeading 20597)
    var textRise = 0.0
    var fontSize = 0.0
    var fontDirection = 1.0
    var font: FontSpec = FontMetrics.Helvetica
    var fillColor = "rgb(0,0,0)"
    /** Full clone — the reference save/restore clones the entire extra state
      * (SVGGraphics save/restore, pdf.combined.js:20015-20029), including text
      * position, matrices, fontDirection and rise. */
    def snapshot: State = {
      val c = new State
      c.ctm = ctm; c.textMatrix = textMatrix; c.lineMatrix = lineMatrix
      c.x = x; c.y = y; c.lineX = lineX; c.lineY = lineY
      c.charSpacing = charSpacing; c.wordSpacing = wordSpacing
      c.textHScale = textHScale; c.leading = leading; c.textRise = textRise
      c.fontSize = fontSize; c.fontDirection = fontDirection; c.font = font
      c.fillColor = fillColor
      c
    }
    def restoreFrom(c: State): Unit = {
      ctm = c.ctm; textMatrix = c.textMatrix; lineMatrix = c.lineMatrix
      x = c.x; y = c.y; lineX = c.lineX; lineY = c.lineY
      charSpacing = c.charSpacing; wordSpacing = c.wordSpacing
      textHScale = c.textHScale; leading = c.leading; textRise = c.textRise
      fontSize = c.fontSize; fontDirection = c.fontDirection; font = c.font
      fillColor = c.fillColor
    }
  }

  def evaluate(content: Array[Byte], resources: Map[String, FontSpec] = Map.empty): EvalResult = {
    val lexer = new ContentLexer(content, OpTable.knownCommands)
    val st = new State
    val stack = ArrayBuffer.empty[State]
    val runs = Vector.newBuilder[GlyphRun]
    val boxes = Vector.newBuilder[PageBox]
    var errors = 0

    // current tspan accumulation
    val sb = new StringBuilder
    val xcoords = ArrayBuffer.empty[Double]
    var tspanY = 0.0
    var tspanMatrix: Array[Double] = NumFmt.Identity
    var tspanFont: FontSpec = st.font
    var tspanSize = 0.0
    var tspanFill = st.fillColor

    def flush(): Unit = {
      if (sb.nonEmpty) {
        runs += GlyphRun(
          sb.toString, xcoords.toArray, tspanY,
          tspanFont.family, tspanSize,
          if (tspanFont.italic) "italic" else "normal",
          if (tspanFont.bold) "bold" else "normal",
          tspanFill, tspanMatrix)
      }
      sb.setLength(0)
      xcoords.clear()
    }

    def moveText(tx: Double, ty: Double): Unit = {
      st.lineX += tx; st.x = st.lineX
      st.lineY += ty; st.y = st.lineY
      flush()
    }

    // one show op = a Tj string or a TJ item sequence; `x` (the intra-op
    // advance accumulator, reference showText local) threads through the items.
    // Glyph iteration is allocation-free: widths looked up per char, no glyph
    // objects (the metrics-only model makes GlyphM redundant on this path).
    var showX = 0.0
    def showBegin(): Unit = showX = 0.0
    def showString(str: String): Unit = {
      if (st.fontSize == 0) return // early skip (pdf.combined.js:20315-20317)
      val textHScale = st.textHScale * st.fontDirection
      val widthAdvanceScale = st.fontSize * FontMatrix0
      val widths = st.font.widths
      var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        xcoords += st.x + showX * textHScale
        // word spacing applies to space glyphs (charcode 0x20, 1-byte encoding) —
        // `(glyph.isSpace ? wordSpacing : 0) + charSpacing`, pdf.combined.js:29772
        val spacing = st.charSpacing + (if (c == ' ') st.wordSpacing else 0.0)
        showX += widths(c.toInt) * widthAdvanceScale + spacing * st.fontDirection
        sb.append(c)
        i += 1
      }
    }
    def showKern(n: Double): Unit =
      if (st.fontSize != 0) showX += -n * st.fontSize * 0.001
    def showEnd(): Unit = {
      if (st.fontSize == 0) return
      st.x += showX * (st.textHScale * st.fontDirection)
      // tspan attrs are (re)set at every showText; record state of last one
      tspanY = -st.y
      tspanMatrix = NumFmt.mul(st.ctm, st.textMatrix)
      tspanFont = st.font
      tspanSize = st.fontSize
      tspanFill = st.fillColor
    }
    def showText(strs: String*): Unit = { showBegin(); strs.foreach(showString); showEnd() }

    def setFont(name: String, size: Double): Unit = {
      flush()
      st.font = FontMetrics.resolve(name, resources)
      if (size < 0) { st.fontSize = -size; st.fontDirection = -1 }
      else { st.fontSize = size; st.fontDirection = 1 }
    }

    def rgb(r: Double, g: Double, b: Double): String =
      s"rgb(${(r * 255).round},${(g * 255).round},${(b * 255).round})"

    val args = ArrayBuffer.empty[Tok]
    def numArg(i: Int): Double = args(i) match {
      case Tok.Num(v) => v
      case _ => errors += 1; 0.0
    }
    var tok = lexer.getObj()
    while (tok != Tok.EOF) {
      tok match {
        case Tok.Cmd(cmd) =>
          OpTable.ops.get(cmd) match {
            case None =>
              cmd match {
                case "[" | "]" | "<<" | ">>" | "{" | "}" =>
                  // structure tokens inside arg lists are kept as args (TJ arrays
                  // handled below); dict args (BDC/DP/gs payloads) are dropped
                  args += tok
                case _ =>
                  errors += 1; args.clear() // unknown command: skip (47374-47377)
              }
            case Some(spec) =>
              // tolerate excess args: use the last numArgs (47383-47408 rebalancing)
              // — except for array-valued args (TJ/dict payloads), where the token
              // buffer legitimately holds the whole array
              val hasStructure = args.exists {
                case Tok.Cmd("[") | Tok.Cmd("<<") => true
                case _ => false
              }
              if (!hasStructure && !spec.variableArgs && args.length > spec.numArgs && spec.numArgs > 0)
                args.remove(0, args.length - spec.numArgs)
              if (!spec.variableArgs && args.length < spec.numArgs) {
                errors += 1 // too few args: skip op
              } else cmd match {
                case "q" => stack += st.snapshot
                case "Q" =>
                  if (stack.nonEmpty) {
                    flush() // restore may change fill/font/position: close the tspan
                    st.restoreFrom(stack.remove(stack.length - 1))
                  } else errors += 1 // unbalanced restore tolerated (45891-45895)
                case "cm" =>
                  st.ctm = NumFmt.mul(st.ctm,
                    Array(numArg(0), numArg(1), numArg(2), numArg(3), numArg(4), numArg(5)))
                case "BT" =>
                  st.x = 0; st.y = 0; st.lineX = 0; st.lineY = 0
                  st.textMatrix = NumFmt.Identity; st.lineMatrix = NumFmt.Identity
                  flush()
                case "ET" => flush()
                case "Tf" =>
                  (args(0), args(1)) match {
                    case (Tok.Name(n), Tok.Num(sz)) => setFont(n, sz)
                    case _ => errors += 1
                  }
                case "Td" => moveText(numArg(0), numArg(1))
                case "TD" => st.leading = numArg(1); moveText(numArg(0), numArg(1))
                case "Tm" =>
                  st.textMatrix = Array(numArg(0), numArg(1), numArg(2), numArg(3), numArg(4), numArg(5))
                  st.lineMatrix = st.textMatrix
                  st.x = 0; st.y = 0; st.lineX = 0; st.lineY = 0
                  flush()
                case "T*" => moveText(0, st.leading)
                case "TL" => st.leading = -numArg(0)
                case "Tc" => st.charSpacing = numArg(0)
                case "Tw" => st.wordSpacing = numArg(0)
                case "Tz" => st.textHScale = numArg(0) / 100
                case "Ts" => st.textRise = numArg(0)
                case "Tr" => () // render mode: no effect on extraction
                case "Tj" =>
                  args(0) match {
                    case Tok.Str(s) => showText(s)
                    case _ => errors += 1
                  }
                case "'" =>
                  moveText(0, st.leading)
                  args(0) match {
                    case Tok.Str(s) => showText(s)
                    case _ => errors += 1
                  }
                case "\"" =>
                  st.wordSpacing = numArg(0); st.charSpacing = numArg(1)
                  moveText(0, st.leading)
                  args(2) match {
                    case Tok.Str(s) => showText(s)
                    case _ => errors += 1
                  }
                case "TJ" =>
                  // args hold "[" item* "]": strings shown, numbers kern —
                  // one show op (PartialEvaluator TJ flattening, 45710-45726)
                  showBegin()
                  args.foreach {
                    case Tok.Str(s) => showString(s)
                    case Tok.Num(n) => showKern(n)
                    case _ => ()
                  }
                  showEnd()
                case "rg" => flush(); st.fillColor = rgb(numArg(0), numArg(1), numArg(2))
                case "g" => flush(); val v = numArg(0); st.fillColor = rgb(v, v, v)
                case "k" =>
                  flush()
                  val (c, m, yy, kk) = (numArg(0), numArg(1), numArg(2), numArg(3))
                  st.fillColor = rgb((1 - c) * (1 - kk), (1 - m) * (1 - kk), (1 - yy) * (1 - kk))
                case "re" =>
                  val (rx, ry) = NumFmt.apply(st.ctm, numArg(0), numArg(1))
                  boxes += PageBox(rx, ry, numArg(2), numArg(3))
                case "ID" => lexer.seekAfterEI()
                case _ => () // consumed: stroke colors, paths, gs, Do, marked content…
              }
              args.clear()
          }
        case Tok.EOF => ()
        case t => args += t
      }
      tok = lexer.getObj()
    }
    flush()
    EvalResult(runs.result(), boxes.result(), errors)
  }
}
