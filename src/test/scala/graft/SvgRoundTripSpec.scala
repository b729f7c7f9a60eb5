package graft

import graft.core.GlyphRun
import graft.extract.LineAssembler
import graft.svg.{GlyphRunParser, SvgEmitter}
import graft.testgen.Synth
import org.scalatest.funsuite.AnyFunSuite

class SvgRoundTripSpec extends AnyFunSuite {

  test("emit → parse preserves runs (text, attrs, coordinates at pf precision)") {
    val runs = Vector(
      GlyphRun("supported by a grant", Array(0, 4.5573950472, 11.0377449208, 17.5180826002),
        0.0, "g_font_2", 11.9552, "normal", "normal", "rgb(0,0,0)",
        Array(1, 0, 0, 1, 91.92, 710.04)),
      GlyphRun("emphasis", Array(0, 5, 10), 13.55, "g_font_3", 9.9626,
        "italic", "bold", "rgb(255,0,0)", Array(2, 0, 0, 2, 10, 20)))
    val svg = SvgEmitter.page(runs)
    val parsed = GlyphRunParser.parse(svg)
    assert(parsed.errors == 0)
    assert(parsed.runs.length == 2)
    parsed.runs.zip(runs).foreach { case (p, r) =>
      assert(p.text == r.text)
      assert(p.fontFamily == r.fontFamily)
      assert(p.fontSize == r.fontSize)
      assert(p.fontStyle == r.fontStyle)
      assert(p.fontWeight == r.fontWeight)
      assert(p.fill == r.fill)
      assert(p.y == r.y)
      assert(p.xs.length == r.xs.length)
      p.xs.zip(r.xs).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      p.matrix.zip(r.matrix).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("multi-page document stitch round-trips page indices (C2)") {
    def run(t: String) = GlyphRun(t, Array.tabulate(t.length)(_.toDouble), 0.0,
      "f", 10, "normal", "normal", "rgb(0,0,0)", Array(1, 0, 0, 1, 0, 0))
    val doc = SvgEmitter.document(Seq(Seq(run("page one")), Seq(run("page two"), run("more"))))
    val parsed = GlyphRunParser.parse(doc)
    assert(parsed.errors == 0)
    assert(parsed.runs.map(r => (r.text, r.page)) ==
      Vector(("page one", 0), ("page two", 1), ("more", 1)))
  }

  test("xml escaping round-trips the reference's exact encode set") {
    val text = "a&b <tag> \"q\" \n\r\t '>' stays"
    val run = GlyphRun(text, Array.tabulate(text.length)(_.toDouble), 0,
      "f", 10, "normal", "normal", "rgb(0,0,0)", Array(1, 0, 0, 1, 0, 0))
    val svg = SvgEmitter.page(Seq(run))
    assert(svg.contains("&amp;") && svg.contains("&lt;") && svg.contains("&quot;"))
    assert(svg.contains("'>' stays") || svg.contains("&#x27;")) // ' and > not escaped
    val parsed = GlyphRunParser.parse(svg)
    assert(parsed.runs.head.text == text)
  }

  test("ligatures / combining marks / leading spaces survive") {
    for (text <- Seq("Identiﬁcation", "Wo", "̈", "hlert,", "  leading spaces")) {
      val run = GlyphRun(text, Array.tabulate(text.length)(_ * 5.0), 0,
        "f", 10, "normal", "normal", "rgb(0,0,0)", Array(1, 0, 0, 1, 0, 0))
      val parsed = GlyphRunParser.parse(SvgEmitter.page(Seq(run)))
      assert(parsed.runs.head.text == text)
    }
  }

  test("encodeSvg → extract reproduces text lines (Synth contract)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running far away",
      "one two",
      "single",
      "spark scala data query table row column join filter group sort merge window")
    texts.foreach { t =>
      val parsed = GlyphRunParser.parse(Synth.encodeSvg(t))
      assert(parsed.errors == 0)
      val asm = LineAssembler.assemble(parsed.runs)
      assert(asm.text == Synth.expectedLines(t), s"for input: $t")
    }
  }

  test("line assembler infers word gaps geometrically (fake spaces)") {
    // two runs on one baseline with a gap of one space width (no space char)
    val fs = 10.0
    val spaceW = 278.0 * fs / 1000.0
    def runAt(x0: Double, text: String): GlyphRun = {
      val xs = new Array[Double](text.length)
      var x = x0
      text.indices.foreach { i =>
        xs(i) = x; x += graft.eval.FontMetrics.Helvetica.widths(text(i).toInt) * fs / 1000.0
      }
      GlyphRun(text, xs, 0, "g_font_1", fs, "normal", "normal", "rgb(0,0,0)",
        Array(1, 0, 0, 1, 0, 500))
    }
    val r1 = runAt(0, "hello")
    val r1End = r1.xs.last + graft.eval.FontMetrics.Helvetica.widths('o') * fs / 1000.0
    val r2 = runAt(r1End + spaceW, "world")
    val asm = LineAssembler.assemble(Vector(r1, r2))
    assert(asm.text == "hello world")
    // and a run exactly adjacent: no space
    val r3 = runAt(r1End, "world")
    assert(LineAssembler.assemble(Vector(r1, r3)).text == "helloworld")
  }

  test("R1/R5: >4x space gap breaks the run (one join-space); monospace fakes spaces") {
    val fs = 10.0
    def mk(x0: Double, text: String, family: String) = {
      def w(c: Char) = if (family.contains("Courier")) 600.0
        else graft.eval.FontMetrics.Helvetica.widths(c.toInt)
      val xs = new Array[Double](text.length)
      var x = x0
      text.indices.foreach { i => xs(i) = x; x += w(text(i)) * fs / 1000.0 }
      GlyphRun(text, xs, 0, family, fs, "normal", "normal", "rgb(0,0,0)",
        Array(1, 0, 0, 1, 0, 500))
    }
    val helv = "g_font_1"
    val swH = graft.eval.FontMetrics.Helvetica.widths(' ') * fs / 1000.0
    val a = mk(0, "left", helv)
    val aEnd = a.xs.last + graft.eval.FontMetrics.Helvetica.widths('t') * fs / 1000.0
    // 2x spaceWidth: multi-space zone, round(2) = 2 spaces
    assert(LineAssembler.assemble(Vector(a, mk(aEnd + 2 * swH, "right", helv))).text
      == "left  right")
    // 10x spaceWidth on a proportional font: run break -> ONE join space
    // (the reference flushes the item; its CLI joins items with ' ')
    assert(LineAssembler.assemble(Vector(a, mk(aEnd + 10 * swH, "right", helv))).text
      == "left right")
    // same 10x gap on Courier: monospace fakes as much space as needed
    val cour = "g_Courier"
    val swC = 600.0 * fs / 1000.0
    val c1 = mk(0, "left", cour)
    val c1End = c1.xs.last + swC
    val asmC = LineAssembler.assemble(Vector(c1, mk(c1End + 10 * swC, "right", cour)))
    assert(asmC.text == "left" + (" " * 10) + "right", asmC.text)
  }

  test("multi-page payload keeps page order, restarts y per page") {
    def pageOf(texts: Seq[String]): Seq[GlyphRun] =
      texts.zipWithIndex.map { case (t, i) =>
        GlyphRun(t, Array.tabulate(t.length)(_ * 6.0), 0, "f", 10,
          "normal", "normal", "rgb(0,0,0)", Array(1, 0, 0, 1, 0, 700 - i * 20.0))
      }
    val p1 = SvgEmitter.page(pageOf(Seq("page one line a", "page one line b")))
    val p2 = SvgEmitter.page(pageOf(Seq("page two line a", "page two line b")))
    val parsed = GlyphRunParser.parse(p1 + p2)
    assert(parsed.runs.map(_.page).distinct == Vector(0, 1))
    val asm = LineAssembler.assemble(parsed.runs)
    assert(asm.text ==
      "page one line a\npage one line b\npage two line a\npage two line b")
  }

  test("genuine y-mirror transform survives; only trailing flip dropped (review regression)") {
    val m = GlyphRunParser.parseTransform("matrix(1 0 0 -1 0 792) scale(1, -1)")
    assert(m.toSeq == Seq(1.0, 0, 0, -1.0, 0, 792)) // interior flip preserved
    val id = GlyphRunParser.parseTransform("translate(5 7) scale(1, -1)")
    assert(id.toSeq == Seq(1.0, 0, 0, 1.0, 5, 7))
  }

  test("out-of-order runs are re-ordered into reading order") {
    def lineRun(y: Double, text: String): GlyphRun =
      GlyphRun(text, Array.tabulate(text.length)(_ * 6.0), 0, "f", 10,
        "normal", "normal", "rgb(0,0,0)", Array(1, 0, 0, 1, 0, y))
    val runs = Vector(lineRun(100, "bottom"), lineRun(700, "top"), lineRun(400, "middle"))
    assert(LineAssembler.assemble(runs).text == "top\nmiddle\nbottom")
  }
}
