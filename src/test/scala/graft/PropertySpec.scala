package graft

import graft.core.NumFmt
import graft.eval.OpTable
import graft.extract.Extractor
import graft.lex.{ContentLexer, Tok}
import graft.svg.{GlyphRunParser, SvgEmitter}
import graft.testgen.Synth
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets

class PropertySpec extends AnyFunSuite {

  /** Run a scalacheck property and fail the ScalaTest test on falsification
    * (no scalatestplus bridge in the offline cache — drive scalacheck directly).
    *
    * r7 (r6 VERDICT "wrong #2"): the run's initial seed is pinned and printed
    * on failure, so a flake is replayable — re-run with
    * GRAFT_SCALACHECK_SEED=<seed> to reproduce the exact generator stream. */
  private def check(p: Prop): Unit = {
    val seed = sys.env.get("GRAFT_SCALACHECK_SEED").map(_.toLong)
      .getOrElse(System.nanoTime())
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(org.scalacheck.rng.Seed(seed))
    val res = SCTest.check(params, p)
    assert(res.passed,
      s"${res.status} — replay with GRAFT_SCALACHECK_SEED=$seed")
  }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  private val sentence: Gen[String] =
    Gen.nonEmptyListOf(word).map(_.mkString(" "))

  test("pf is stable: parse(pf(x)) rounds back within 5e-11") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { (x: Double) =>
      val s = NumFmt.pf(x)
      // toFixed(10) rounding error (≤5e-11) plus re-parse rounding (≤1 ulp)
      math.abs(java.lang.Double.parseDouble(s) - x) <= 5.000001e-11 + Math.ulp(x)
    })
  }

  test("pf of pf output is a fixed point") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { (x: Double) =>
      val once = NumFmt.pf(x)
      NumFmt.pf(java.lang.Double.parseDouble(once)) == once
    })
  }

  test("lexer: PDF string escape round-trip") {
    val anyText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('(', ')', '\\', ' ', '\n', '\t'))).map(_.mkString)
    check(Prop.forAll(anyText) { (s: String) =>
      val payload = "(" + Synth.escapePdfString(s) + ")"
      val toks = new ContentLexer(
        payload.getBytes(StandardCharsets.ISO_8859_1), OpTable.knownCommands).tokens()
      toks == Vector(Tok.Str(s))
    })
  }

  test("xml encode/decode round-trip for arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.oneOf("\n", "\t", "&", "<", "\"", ">")) {
      (s: String, special: String) =>
        val text = s + special + s
        GlyphRunParser.xmlDecode(SvgEmitter.xmlEncode(text)) == text
    })
  }

  test("svg dialect round-trip: encode → extract = expected lines") {
    check(Prop.forAll(sentence) { (text: String) =>
      Extractor.extract(Synth.encodeSvg(text)).text == Synth.expectedLines(text)
    })
  }

  test("html dialect round-trip is identity") {
    check(Prop.forAll(sentence) { (text: String) =>
      Extractor.extract(Synth.encodeHtml(text)).text == text
    })
  }

  test("pdf dialect round-trip = expected lines") {
    check(Prop.forAll(sentence) { (text: String) =>
      Extractor.extract(Synth.encodePdf(text)).text == Synth.expectedLines(text)
    })
  }

  test("markdown dialect round-trip is identity (incl. markdown specials in content)") {
    import graft.extract.Extractor
    import graft.testgen.Synth
    for (txt <- Seq(
      "plain words with no markup at all in them",
      "stars *like this* and **this** plus _under_ and `ticks`",
      "brackets [x](y) and #hash - dash . dot ! bang > quote",
      "backslash \\ and `mixed` *everything* [together](now)",
      "a",
      "")) {
      val md = Synth.encodeMarkdown(txt)
      assert(Extractor.sniff(md) == Extractor.Dialect.Markdown, md.take(20))
      val got = Extractor.extract(md).text
      assert(got == txt, s"md round trip failed:\n in: [$txt]\nout: [$got]")
    }
    // scalacheck-style sweep over printable-ish strings
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val txt = (0 until rnd.nextInt(60)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
        .replace("\u007f", " ")
      val got = Extractor.extract(Synth.encodeMarkdown(txt)).text
      assert(got == txt, s"[$txt] -> [$got]")
    }
  }

  test("markdown stripper handles real-world constructs") {
    import graft.extract.MarkdownLite
    val md =
      """---
        |title: t
        |---
        |
        |# Heading One
        |
        |Intro paragraph with [a link](https://x.y) and **bold** text.
        |
        |> quoted line
        |
        |- item one
        |- item two
        |
        |```
        |code *stays* [verbatim](x)
        |```
        |tail""".stripMargin
    val ex = MarkdownLite.strip(md)
    // interior blank lines are content (consecutive newlines round-trip);
    // only front matter, its separator, and fence markers drop
    assert(ex.text ==
      """Heading One
        |
        |Intro paragraph with a link and bold text.
        |
        |quoted line
        |
        |item one
        |item two
        |
        |code *stays* [verbatim](x)
        |tail""".stripMargin, ex.text)
    assert(ex.droppedLines > 0)
    // plain text that merely starts with --- degrades gracefully
    assert(MarkdownLite.strip("--- not front matter\nrest").text == "--- not front matter\nrest")
  }

  test("extractor never throws on arbitrary input") {
    check(Prop.forAll(Gen.asciiStr) { (junk: String) =>
      Extractor.extract(junk) != null
    })
  }

  test("extractor never throws on markup soup") {
    val fragment: Gen[String] = Gen.oneOf(
      Gen.oneOf("<svg:tspan ", "</svg:tspan>", "<svg:text transform=\"", "<div class=\"",
        "BT ", "ET ", "(unclosed ", ") Tj ", "<p>", "</p>", "&amp;", "&#x", "x=\"1 2 3",
        "<script>", "<!--", "q ", "Q ", "<html><body>", "scale(1, -1)", "\\", "\""),
      Gen.alphaNumStr, Gen.asciiPrintableStr)
    val soup: Gen[String] = Gen.listOf(fragment).map(_.mkString)
    check(Prop.forAll(soup) { (payload: String) =>
      val r = Extractor.extract(payload)
      r != null && r.text != null
    })
  }
}
