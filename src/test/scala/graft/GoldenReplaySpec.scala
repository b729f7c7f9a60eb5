package graft

import graft.core.GlyphRun
import graft.extract.{Extractor, LineAssembler}
import graft.svg.{GlyphRunParser, SvgEmitter}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Golden replay (FIXTURES.md §5): the reference's expected tspan texts are
  * re-hosted as dialect-A payloads — one run per golden entry on its own
  * baseline — and extraction must return the entries verbatim, in order.
  * This pins text fidelity end-to-end: ligatures (U+FB01), standalone combining
  * marks, leading spaces, xml-escaped characters.
  *
  * Goldens are read from the read-only reference checkout; the suite skips
  * cleanly if it is absent.
  */
class GoldenReplaySpec extends AnyFunSuite {

  private val goldenDir = Paths.get("/root/reference/src/test/resources/output")

  private def goldenEntries(name: String): Option[Vector[String]] = {
    val p = goldenDir.resolve(s"$name.pdf.expected/tspan-texts.txt")
    if (!Files.exists(p)) None
    else {
      val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      // format: entries joined with "\n\n" + trailing "\n"
      Some(raw.stripSuffix("\n").split("\n\n", -1).toVector)
    }
  }

  private def hostAsRuns(entries: Vector[String]): Vector[GlyphRun] =
    entries.zipWithIndex.map { case (text, i) =>
      val xs = new Array[Double](text.length)
      var x = 0.0
      text.indices.foreach { j =>
        xs(j) = x
        x += graft.eval.FontMetrics.Helvetica.widths(text.charAt(j).toInt) * 11.9552 / 1000.0
      }
      // each entry its own baseline, far apart → one line each, stable order
      GlyphRun(text, xs, 0.0, "g_font_2", 11.9552, "normal", "normal",
        "rgb(0,0,0)", Array(1, 0, 0, 1, 50.0, 1000000.0 - i * 20.0))
    }

  private val papers = Seq("1301.4293", "C04-1204", "test24", "test25")

  papers.foreach { paper =>
    test(s"golden replay: $paper") {
      goldenEntries(paper) match {
        case None => cancel(s"reference goldens not present for $paper")
        case Some(entries) =>
          assert(entries.nonEmpty)
          val runs = hostAsRuns(entries)
          // direct assembly path
          val asm = LineAssembler.assemble(runs)
          val expected = entries.mkString("\n")
          assert(asm.text == expected, s"direct assembly mismatch for $paper")
          // full dialect-A round trip through the SVG emitter + extractor
          val payload = SvgEmitter.page(runs, 612, 792)
          val res = Extractor.extract(payload)
          assert(res.text == expected, s"svg round-trip mismatch for $paper")
          // one span per golden run, offsets consistent with the joined text
          assert(res.spans.length == entries.length)
          res.spans.zip(entries).foreach { case (sp, e) =>
            assert(res.text.substring(sp.start, sp.end) == e)
          }
      }
    }
  }

  test("golden entry counts match the survey (569/5603/3543/1313)") {
    val expected = Map("1301.4293" -> 569, "C04-1204" -> 5603,
      "test24" -> 3543, "test25" -> 1313)
    expected.foreach { case (paper, n) =>
      goldenEntries(paper).foreach(e => assert(e.length == n, paper))
    }
  }
}
