package graft.eval

import graft.core.{GlyphRun, NumFmt}
import graft.lex.{ContentLexer, Tok}

import scala.collection.mutable.ArrayBuffer

/** Rectangle painted by `re` — layout feature for rule/boilerplate heuristics
  * (the reference's 1×1 image-mask → solid-rule case, pdf.combined.js:47464-47483). */
final case class PageBox(x: Double, y: Double, w: Double, h: Double)

final case class EvalResult(runs: Vector[GlyphRun], boxes: Vector[PageBox], errors: Int)

/** Resource context for a content stream: font lookups and Form XObjects
  * (SURVEY.md §2.2 E8/R7 — the reference's resources dict + buildFormXObject,
  * pdf.combined.js:45075-45121). */
trait PageResources {
  def font(name: String): FontSpec
  def form(name: String): Option[FormXObject] = None
  /** True when the XObject is a raster image — painted as a layout box
    * (SURVEY.md §2.2 E9: image markers feed the boilerplate heuristics,
    * pixels are never decoded). */
  def isImage(name: String): Boolean = false
  /** ExtGState /Font entry: (font, size) when the graphics-state dict sets one
    * (SURVEY.md §2.2 E6 — gs expansion, pdf.combined.js:45123-45180). */
  def gsFont(name: String): Option[(FontSpec, Double)] = None
  /** Named color space from the resource dict's /ColorSpace entry
    * (SURVEY.md §2.2 E5 — ColorSpace.parse, pdf.combined.js:40554+). */
  def colorSpace(name: String): Option[ColorSpaceModel] = None
}

/** A Form XObject ready to execute: decoded content, its own resource context,
  * the /Matrix to compose onto the CTM, and a stable identity key for the
  * recursion guard (the reference memoizes XObjects the same way, 46318-46370). */
final case class FormXObject(
    content: Array[Byte], resources: PageResources, matrix: Array[Double], key: String)

object PageResources {
  def fromMap(m: Map[String, FontSpec]): PageResources = new PageResources {
    def font(name: String): FontSpec = FontMetrics.resolve(name, m)
  }
  val empty: PageResources = fromMap(Map.empty)
}

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

  /** Streaming replica of the reference QueueOptimizer's text-block fusion
    * (pdf.combined.js:47757-47825): ≥3 (max 1000) consecutive
    * `(BT, Tf, Tm, Tj, ET)` quintets with the same font collapse to
    * `(BT, Tf, (Tm, Tj)+, ET)`. The vendored SVG backend creates a fresh
    * tspan AND text element on every setTextMatrix (pdf.combined.js:
    * 20268-20283), so for the tspan-texts surface the fusion is
    * output-neutral — it is replicated here for op-stream parity with the
    * reference pipeline, and because dropping the per-quintet BT/ET/Tf
    * removes two state resets and a font re-resolve per stamp from the hot
    * loop. Lookahead fills stop at the first non-matching token, so a `BI`
    * inline image is never tokenized past (its binary payload stays
    * untouched for seekAfterEI).
    */
  private final class FusingTokens(lexer: graft.lex.ContentLexer) {
    private val buf = scala.collection.mutable.ArrayDeque.empty[Tok]
    private var sawEof = false
    private def fill(n: Int): Boolean = {
      while (buf.size <= n && !sawEof) {
        val t = lexer.getObj()
        if (t == Tok.EOF) sawEof = true else buf.append(t)
      }
      buf.size > n
    }
    private def at(i: Int): Tok = if (fill(i)) buf(i) else Tok.EOF

    def seekAfterEI(): Unit = { buf.clear(); sawEof = false; lexer.seekAfterEI() }

    // quintet body once its BT is consumed:
    // [Name, Num, Tf, n1..n6, Tm, Str, Tj, ET] = 13 tokens
    private def quintetFont(base: Int): (String, Double) =
      (at(base), at(base + 1), at(base + 2)) match {
        case (Tok.Name(f), Tok.Num(s), Tok.Cmd("Tf")) =>
          var i = base + 3
          var nums = true
          while (i < base + 9) { if (!at(i).isInstanceOf[Tok.Num]) { nums = false; i = base + 9 } else i += 1 }
          if (nums && at(base + 9) == Tok.Cmd("Tm") && at(base + 10).isInstanceOf[Tok.Str] &&
            at(base + 11) == Tok.Cmd("Tj") && at(base + 12) == Tok.Cmd("ET")) (f, s)
          else null
        case _ => null
      }

    /** Called after a BT was consumed; rewrites the buffered quintets. */
    private def tryFuse(): Unit = {
      val key = quintetFont(0)
      if (key == null) return
      var count = 1
      // MIN 3 / MAX 1000 quintets — reference thresholds (47763-47764)
      while (count < 1000 && at(13 + 14 * (count - 1)) == Tok.Cmd("BT") &&
        quintetFont(14 * count) == key) count += 1
      if (count < 3) return
      val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
      out += buf(0) += buf(1) += buf(2) // Name Num Tf, once
      var q = 0
      while (q < count) {
        val b = if (q == 0) 0 else 14 * q
        var i = b + 3
        while (i <= b + 11) { out += buf(i); i += 1 } // n1..n6 Tm Str Tj
        q += 1
      }
      out += Tok.Cmd("ET")
      val consumed = 14 * (count - 1) + 13
      val rest = buf.drop(consumed)
      buf.clear()
      buf ++= out
      buf ++= rest
    }

    def next(): Tok = {
      if (!fill(0)) return Tok.EOF
      val t = buf.removeHead()
      if (t == Tok.Cmd("BT")) tryFuse()
      t
    }
  }

  /** Test-only boundary trace: when `sink` is non-null the evaluator appends
    * one TSV row per tspan boundary with the geometric features the fake-space
    * decision sees. Used to fit the golden generator's rule empirically. */
  private[graft] object EvalTrace {
    var sink: scala.collection.mutable.ArrayBuffer[String] = null
  }

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
    var fillCS: ColorSpaceModel = null // null = component-count heuristic
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
      c.fillColor = fillColor; c.fillCS = fillCS
      c
    }
    def restoreFrom(c: State): Unit = {
      ctm = c.ctm; textMatrix = c.textMatrix; lineMatrix = c.lineMatrix
      x = c.x; y = c.y; lineX = c.lineX; lineY = c.lineY
      charSpacing = c.charSpacing; wordSpacing = c.wordSpacing
      textHScale = c.textHScale; leading = c.leading; textRise = c.textRise
      fontSize = c.fontSize; fontDirection = c.fontDirection; font = c.font
      fillColor = c.fillColor; fillCS = c.fillCS
    }
  }

  def evaluate(content: Array[Byte], resources: Map[String, FontSpec] = Map.empty): EvalResult =
    evaluatePage(content, PageResources.fromMap(resources))

  /** `fakeSpaces = true` reconstructs inter-word spaces the way the reference
    * CLI's golden output does (SURVEY.md §2.9 R3/R5): a single leading space on
    * a new tspan whose same-line gap from the previous show is ≥ 0.3×spaceWidth,
    * and 1/round(gap/spaceWidth) spaces at TJ kern gaps ≥ 0.3×/1.5×spaceWidth
    * (SPACE_FACTOR/MULTI_SPACE_FACTOR, pdf.combined.js:45930-45932 + the
    * addFakeSpaces discipline at 46138-46150). Off by default: the synthetic
    * dialect payloads carry real space glyphs, and the line assembler derives
    * spacing from x-coordinates instead. */
  def evaluatePage(content: Array[Byte], pageResources: PageResources,
      fakeSpaces: Boolean = false,
      initialCtm: Array[Double] = NumFmt.Identity): EvalResult = {
    val st = new State
    st.ctm = initialCtm
    val stack = ArrayBuffer.empty[State]
    val runs = Vector.newBuilder[GlyphRun]
    val boxes = Vector.newBuilder[PageBox]

    // current tspan accumulation
    var flushedCount = 0
    val sb = new StringBuilder
    val xcoords = ArrayBuffer.empty[Double]
    var tspanY = 0.0
    var tspanMatrix: Array[Double] = NumFmt.Identity
    var tspanFont: FontSpec = st.font
    var tspanSize = 0.0
    var tspanFill = st.fillColor

    def flush(): Unit = {
      if (sb.nonEmpty) {
        flushedCount += 1
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

    // fake-space state: text-space pen position after the previous show, valid
    // only within an unchanged (ctm, textMatrix) frame
    var lastEndX, lastEndY = 0.0
    var lastCtm: Array[Double] = null
    var lastTm: Array[Double] = null
    var lastGlyphStartX = 0.0
    var glyphStartTmp = 0.0
    var prevSw = 0.0
    var cBT, cET, cTf, cTm, cTd, cTc, cOther = 0 // ops seen since the previous show (trace)
    def spaceWidthUnits: Double = {
      val est = st.font.spaceWidthEst
      (if (est.isNaN) st.font.widths(' '.toInt) else est) * 0.001 * st.fontSize
    }
    def appendSpaces(n: Int, atX: Double): Unit = {
      var k = 0
      while (k < n) { xcoords += atX; sb.append(' '); k += 1 }
    }

    def showString(str: String): Unit = {
      if (st.fontSize == 0) return // early skip (pdf.combined.js:20315-20317)
      val textHScale = st.textHScale * st.fontDirection
      val widthAdvanceScale = st.fontSize * st.font.fontMatrix0
      val widths = st.font.widths
      val glyphText = st.font.glyphText
      // fake spaces are a horizontal-writing reconstruction (the golden
      // generator's rule); vertical runs never receive them
      if (fakeSpaces && !st.font.vertical && sb.isEmpty && str.nonEmpty && lastCtm != null) {
        val sameFrame = java.util.Arrays.equals(lastCtm, st.ctm) &&
          java.util.Arrays.equals(lastTm, st.textMatrix)
        val curX = st.x + showX * textHScale
        val sw = spaceWidthUnits
        if (EvalTrace.sink != null) {
          def dev(ctm: Array[Double], tm: Array[Double], x: Double, y: Double): (Double, Double) = {
            val m = NumFmt.mul(ctm, tm)
            (m(0) * x + m(2) * y + m(4), m(1) * x + m(3) * y + m(5))
          }
          val (pdx, pdy) = dev(lastCtm, lastTm, lastEndX, lastEndY)
          val (pgx, _) = dev(lastCtm, lastTm, lastGlyphStartX, lastEndY)
          val (cdx, cdy) = dev(st.ctm, st.textMatrix, curX, st.y)
          val pScale = { val m = NumFmt.mul(lastCtm, lastTm); math.hypot(m(0), m(1)) }
          val cScale = { val m = NumFmt.mul(st.ctm, st.textMatrix); math.hypot(m(0), m(1)) }
          EvalTrace.sink += Seq(
            flushedCount,
            if (sameFrame) 1 else 0, cBT, cET, cTf, cTm, cTd, cTc,
            f"$pdx%.3f", f"$pdy%.3f", f"$pgx%.3f", f"$cdx%.3f", f"$cdy%.3f",
            f"${prevSw * pScale}%.4f", f"${sw * cScale}%.4f",
            f"${lastEndX}%.3f", f"$curX%.3f", f"${st.fontSize * cScale}%.3f").mkString("\t")
        }
        // single leading space on a new tspan after a positive x-gap within the
        // same (ctm, textMatrix) frame — the golden corpus shows the generator
        // compared x only (column jumps with Δy also get exactly one space).
        // Fonts with no estimable space width (symbol subsets) fall back to the
        // previous show's space width, same baseline only.
        val swEff = if (sw > 0) sw else if (st.y == lastEndY) prevSw else 0.0
        if (sameFrame && swEff > 0 && (curX - lastEndX) >= 0.3 * swEff) appendSpaces(1, lastEndX)
      }
      if (glyphText eq FontSpec.IdentityChar) {
        // identity hot path (synthetic dialect payloads): char-level appends,
        // zero per-glyph allocation — this loop dominates extraction throughput
        var i = 0
        while (i < str.length) {
          val c = str.charAt(i)
          val gx = st.x + showX * textHScale
          glyphStartTmp = gx
          xcoords += gx
          // `(glyph.isSpace ? wordSpacing : 0) + charSpacing`, pdf.combined.js:29772
          val spacing = st.charSpacing + (if (c == ' ') st.wordSpacing else 0.0)
          showX += widths(c.toInt) * widthAdvanceScale + spacing * st.fontDirection
          sb.append(c)
          i += 1
        }
      } else {
        // mapped fonts: composite fonts consume 2 bytes per charcode (Identity
        // CMaps); word spacing only ever applies to the 1-byte 0x20 charcode
        // (charsToGlyphs, pdf.combined.js:36697-36714)
        val wide = st.font.wideChars
        val step = if (wide) 2 else 1
        var i = 0
        while (i < str.length) {
          val c: Int =
            if (wide) {
              val hi = str.charAt(i).toInt & 0xff
              val lo = if (i + 1 < str.length) str.charAt(i + 1).toInt & 0xff else 0
              (hi << 8) | lo
            } else str.charAt(i).toInt
          // glyph text may expand to several chars (ligature /ToUnicode targets);
          // keep one xcoord per emitted char so xs.length == text.length holds
          val g = glyphText(c)
          val gx = st.x + showX * textHScale
          glyphStartTmp = gx
          var k = 0
          while (k < g.length) { xcoords += gx; k += 1 }
          val spacing = st.charSpacing + (if (!wide && c == ' ') st.wordSpacing else 0.0)
          showX += widths(c) * widthAdvanceScale + spacing * st.fontDirection
          sb.append(g)
          i += step
        }
      }
    }
    def showKern(n: Double): Unit =
      if (st.fontSize != 0) {
        val adv = -n * st.fontSize * 0.001
        showX += adv
        if (fakeSpaces && !st.font.vertical && sb.nonEmpty && sb.charAt(sb.length - 1) != ' ' && adv > 0) {
          val sw = spaceWidthUnits
          if (sw > 0 && adv >= 0.3 * sw)
            appendSpaces(1, st.x + showX * (st.textHScale * st.fontDirection))
        }
      }
    def showEnd(): Unit = {
      if (st.fontSize == 0) return
      // vertical writing advances the pen in y, horizontal in x — the SVG
      // backend exactly (pdf.combined.js:20347-20351): the per-glyph loop is
      // identical (glyph widths, advancing xcoords, same TJ sign), only the
      // end-of-show pen update differs, and the tspan y attribute is set
      // AFTER the update (20355). The /W2 vmetric override is a canvas/
      // text-content-path behavior the tspan surface never sees.
      val adv = showX * (st.textHScale * st.fontDirection)
      if (st.font.vertical) st.y -= adv else st.x += adv
      if (fakeSpaces) {
        lastEndX = st.x; lastEndY = st.y
        lastCtm = st.ctm; lastTm = st.textMatrix
        lastGlyphStartX = glyphStartTmp
        prevSw = spaceWidthUnits
        cBT = 0; cET = 0; cTf = 0; cTm = 0; cTd = 0; cTc = 0; cOther = 0
      }
      // tspan attrs are (re)set at every showText; record state of last one
      tspanY = -st.y
      tspanMatrix = NumFmt.mul(st.ctm, st.textMatrix)
      tspanFont = st.font
      tspanSize = st.fontSize
      tspanFill = st.fillColor
    }
    def showText(strs: String*): Unit = { showBegin(); strs.foreach(showString); showEnd() }

    def setFont(name: String, size: Double, res: PageResources): Unit = {
      flush()
      st.font = res.font(name)
      if (size < 0) { st.fontSize = -size; st.fontDirection = -1 }
      else { st.fontSize = size; st.fontDirection = 1 }
    }

    def rgb(r: Double, g: Double, b: Double): String =
      s"rgb(${(r * 255).round},${(g * 255).round},${(b * 255).round})"

    /** Execute one content stream in the shared graphics/text state. Form
      * XObjects recurse here with their own resources; `active` keys guard
      * against reference cycles and `depth` bounds pathological nesting. */
    def exec(bytes: Array[Byte], res: PageResources, depth: Int, active: Set[String]): Int = {
    val lexer = new ContentLexer(bytes, OpTable.knownCommands)
    val toks = new FusingTokens(lexer) // reference QueueOptimizer text-block fusion
    var errors = 0
    val args = ArrayBuffer.empty[Tok]
    def numArg(i: Int): Double = args(i) match {
      case Tok.Num(v) => v
      case _ => errors += 1; 0.0
    }
    var tok = toks.next()
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
                  cBT += 1
                  st.x = 0; st.y = 0; st.lineX = 0; st.lineY = 0
                  st.textMatrix = NumFmt.Identity; st.lineMatrix = NumFmt.Identity
                  flush()
                case "ET" => cET += 1; flush()
                case "Tf" =>
                  cTf += 1
                  (args(0), args(1)) match {
                    case (Tok.Name(n), Tok.Num(sz)) => setFont(n, sz, res)
                    case _ => errors += 1
                  }
                case "Td" => cTd += 1; moveText(numArg(0), numArg(1))
                case "TD" => cTd += 1; st.leading = numArg(1); moveText(numArg(0), numArg(1))
                case "Tm" =>
                  cTm += 1
                  st.textMatrix = Array(numArg(0), numArg(1), numArg(2), numArg(3), numArg(4), numArg(5))
                  st.lineMatrix = st.textMatrix
                  st.x = 0; st.y = 0; st.lineX = 0; st.lineY = 0
                  flush()
                case "T*" => cTd += 1; moveText(0, st.leading)
                case "TL" => st.leading = -numArg(0)
                case "Tc" => cTc += 1; st.charSpacing = numArg(0)
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
                // rg/g/k also SELECT the device space (the reference sets
                // fillColorSpace on these ops, pdf.combined.js:45762-45785) —
                // without the reset a stale resolved /Indexed or /Separation
                // from an earlier cs would misread later sc operands
                case "rg" =>
                  flush(); st.fillCS = ColorSpaceModel.RGB
                  st.fillColor = rgb(numArg(0), numArg(1), numArg(2))
                case "g" =>
                  flush(); st.fillCS = ColorSpaceModel.Gray
                  val v = numArg(0); st.fillColor = rgb(v, v, v)
                case "k" =>
                  flush(); st.fillCS = ColorSpaceModel.CMYK
                  val (c, m, yy, kk) = (numArg(0), numArg(1), numArg(2), numArg(3))
                  st.fillColor = rgb((1 - c) * (1 - kk), (1 - m) * (1 - kk), (1 - yy) * (1 - kk))
                case "cs" =>
                  // select the fill color space: device names inline, anything
                  // else resolved from the resource dict (E5; the reference
                  // keeps a ColorSpace object on the graphics state)
                  args(0) match {
                    case Tok.Name(n) =>
                      st.fillCS =
                        if (n == "Pattern") null
                        else ColorSpaceModel.fromName(n).orElse(res.colorSpace(n)).orNull
                    case _ => errors += 1
                  }
                case "sc" | "scn" =>
                  // resolved color space when cs named one; otherwise the
                  // component-count heuristic (SURVEY.md §2.2 E5): 1 → gray,
                  // 3 → RGB, 4 → CMYK; name operands (pattern fills) leave the
                  // color unchanged
                  val nums = args.collect { case Tok.Num(v) => v }
                  if (nums.length == args.length && nums.nonEmpty) {
                    if (st.fillCS != null) {
                      ColorSpaceModel.toRgb(st.fillCS, nums.toArray).foreach { case (r, g, b) =>
                        flush(); st.fillColor = rgb(r, g, b)
                      }
                    } else nums.length match {
                      case 1 => flush(); st.fillColor = rgb(nums(0), nums(0), nums(0))
                      case 3 => flush(); st.fillColor = rgb(nums(0), nums(1), nums(2))
                      case 4 =>
                        flush()
                        st.fillColor = rgb((1 - nums(0)) * (1 - nums(3)),
                          (1 - nums(1)) * (1 - nums(3)), (1 - nums(2)) * (1 - nums(3)))
                      case _ => ()
                    }
                  }
                case "re" =>
                  val (rx, ry) = NumFmt.apply(st.ctm, numArg(0), numArg(1))
                  boxes += PageBox(rx, ry, numArg(2), numArg(3))
                case "gs" =>
                  args(0) match {
                    case Tok.Name(n) =>
                      res.gsFont(n).foreach { case (f, size) =>
                        flush()
                        st.font = f
                        if (size < 0) { st.fontSize = -size; st.fontDirection = -1 }
                        else { st.fontSize = size; st.fontDirection = 1 }
                      }
                    case _ => ()
                  }
                case "BI" =>
                  // inline image: record the CTM unit square as a layout box
                  // (the reference's 1x1 image-mask solid-rule case feeds the
                  // same heuristics, pdf.combined.js:47464-47483)
                  boxes += PageBox(st.ctm(4), st.ctm(5), st.ctm(0), st.ctm(3))
                case "ID" => toks.seekAfterEI()
                case "Do" =>
                  args(0) match {
                    case Tok.Name(n) =>
                      res.form(n) match {
                        case Some(fx) if depth < 12 && !active.contains(fx.key) =>
                          // buildFormXObject: save → transform(/Matrix) → run →
                          // restore (pdf.combined.js:45075-45121); the stack is
                          // truncated afterwards so an unbalanced q/Q inside the
                          // form cannot leak outer state away
                          flush()
                          val snapshot = st.snapshot
                          val stackDepth = stack.length
                          st.ctm = NumFmt.mul(st.ctm, fx.matrix)
                          errors += exec(fx.content, fx.resources, depth + 1, active + fx.key)
                          flush()
                          if (stack.length > stackDepth) stack.remove(stackDepth, stack.length - stackDepth)
                          st.restoreFrom(snapshot)
                        case _ =>
                          // image XObject: the CTM maps the unit square to the
                          // painted area — record it as a layout box (E9)
                          if (res.isImage(n))
                            boxes += PageBox(st.ctm(4), st.ctm(5), st.ctm(0), st.ctm(3))
                      }
                    case _ => errors += 1
                  }
                case _ => () // consumed: stroke colors, paths, gs, marked content…
              }
              args.clear()
          }
        case Tok.EOF => ()
        case t => args += t
      }
      tok = toks.next()
    }
    errors
    }

    val errors = exec(content, pageResources, 0, Set.empty)
    flush()
    EvalResult(runs.result(), boxes.result(), errors)
  }
}
