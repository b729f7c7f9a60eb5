package graft

import graft.html.Boilerplate
import graft.testgen.Synth
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("encodeHtml → extract is identity (Synth contract)") {
    for (t <- Seq(
      "plain words only",
      "with & ampersand < angle > and \"quotes\"",
      "the fast key order sort table scan merge part window")) {
      val ex = Boilerplate.extract(Synth.encodeHtml(t))
      assert(ex.text == t)
      assert(ex.spans.map(s => (s.start, s.end)) == Seq((0, t.length)))
      assert(ex.droppedNodes >= 3) // nav, sidebar, footer (+head)
    }
  }

  test("FIXTURES §3 shape: boilerplate dropped, main kept in order") {
    val html =
      """<html><head><title>t</title></head><body>
        |<nav class="menu"><a href="/a">Home</a><a href="/b">About</a></nav>
        |<div id="main"><p>MAIN ONE.</p><p>MAIN TWO.</p></div>
        |<div class="sidebar"><ul><li><a href="/x">x</a></li></ul></div>
        |<footer>© 2026</footer>
        |</body></html>""".stripMargin
    val ex = Boilerplate.extract(html)
    assert(ex.text == "MAIN ONE.\nMAIN TWO.")
    assert(ex.spans.length == 2)
    assert(ex.spans(0).label.endsWith("p"))
  }

  test("link-dense block dropped even without boilerplate tag/class") {
    val html =
      """<body><div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>
        |<div><p>real content sentence here</p></div></body>""".stripMargin
    assert(Boilerplate.extract(html).text == "real content sentence here")
  }

  test("entities, br, nested inline tags") {
    val html = "<body><p>a &amp; b<br>c <b>bold</b> &#x41;&#66;</p></body>"
    assert(Boilerplate.extract(html).text == "a & b\nc bold AB")
  }

  test("script/style raw text never leaks") {
    val html = "<body><script>var x = '<p>fake</p>';</script><p>real</p></body>"
    assert(Boilerplate.extract(html).text == "real")
  }

  test("unclosed tags tolerated") {
    val html = "<body><div><p>first<p>second</div>"
    assert(Boilerplate.extract(html).text == "first\nsecond")
  }

  test("tables, captions, nested sections keep reading order") {
    val html =
      """<body><article><section><h2>Title</h2>
        |<p>Intro para.</p>
        |<table><tr><th>H1</th><th>H2</th></tr><tr><td>a1</td><td>a2</td></tr></table>
        |<figure><img src="x.png"><figcaption>Figure one.</figcaption></figure>
        |</section></article></body>""".stripMargin
    val ex = Boilerplate.extract(html)
    assert(ex.text == "Title\nIntro para.\nH1\nH2\na1\na2\nFigure one.")
    assert(ex.spans.exists(_.label.endsWith("figcaption")))
    assert(ex.spans.exists(_.label.contains("article>section")))
  }

  test("definition lists and blockquotes") {
    val html = "<body><dl><dt>Term</dt><dd>Meaning</dd></dl><blockquote>Quoted words</blockquote></body>"
    assert(Boilerplate.extract(html).text == "Term\nMeaning\nQuoted words")
  }

  test("whitespace normalization collapses runs, keeps br newlines") {
    val html = "<body><p>a   b\n\t c</p></body>"
    assert(Boilerplate.extract(html).text == "a b c")
  }
}
