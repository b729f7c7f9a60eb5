package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Bidi split parity with the reference: the reading-order surface
  * (extractPageText, the getTextContent analogue) applies the RTL heuristic
  * per line, while the tspan/SVG surface never does — the reference runs
  * runBidiTransform only in getTextContent (pdf.combined.js:46033-46045).
  */
class BidiPdfSpec extends AnyFunSuite {

  // bytes A0-A3 mapped to Hebrew alef..dalet via /ToUnicode (high bytes: no
  // collision with the ASCII text in the fixture), so a latin-1 content
  // stream produces an RTL extraction
  private def pdf(content: String): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |1 begincodespacerange <00> <ff> endcodespacerange
        |4 beginbfchar
        |<A0> <05D0>
        |<A1> <05D1>
        |<A2> <05D2>
        |<A3> <05D3>
        |endbfchar
        |endcmap""".stripMargin
    (s"""%PDF-1.4
       |1 0 obj
       |<< /Type /Catalog /Pages 2 0 R >>
       |endobj
       |2 0 obj
       |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
       |endobj
       |3 0 obj
       |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
       |   /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
       |endobj
       |4 0 obj
       |<< /Length ${content.length} >>
       |stream
       |$content
       |endstream
       |endobj
       |5 0 obj
       |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /ToUnicode 6 0 R >>
       |endobj
       |6 0 obj
       |<< /Length ${cmap.length} >>
       |stream
       |$cmap
       |endstream
       |endobj
       |trailer
       |<< /Size 7 /Root 1 0 R >>
       |startxref
       |0
       |%%EOF
       |""").stripMargin.getBytes(ISO_8859_1)
  }

  test("RTL line reverses on the reading-order surface, not on the tspan surface") {
    val content = "BT /F1 12 Tf 100 700 Td (\u00a0\u00a1\u00a2\u00a3) Tj 0 -20 Td (hello world) Tj ET"
    val doc = PdfDocument.open(pdf(content))
    val logical = "אבגד" // alef bet gimel dalet
    // reading order: the RTL line comes out REVERSED (visual → logical flip
    // per the reference's 30%-RTL heuristic), the LTR line untouched
    assert(doc.extractPageText(0).linesIterator.map(_.trim).toSeq ==
      Seq(logical.reverse, "hello world"))
    // golden/tspan surface: byte-identical to the evaluator output — no bidi
    assert(doc.tspanTexts.map(_.trim) == Vector(logical, "hello world"))
  }

  test("pure-LTR documents are byte-identical with bidi enabled") {
    val content = "BT /F1 12 Tf 100 700 Td (hello) Tj 0 -20 Td (world (x)) Tj ET"
    val doc = PdfDocument.open(pdf(content))
    assert(doc.extractPageText(0).linesIterator.map(_.trim).toSeq == Seq("hello", "world (x)"))
  }

  test("text-content items carry rtl direction and reordered strings") {
    val content = "BT /F1 12 Tf 100 700 Td (\u00a0\u00a1\u00a2\u00a3) Tj 0 -20 Td (hello) Tj ET"
    val doc = PdfDocument.open(pdf(content))
    val items = doc.textContentItems(0)
    assert(items.length == 2)
    // the RTL item flips visual -> logical and reports dir = "rtl", the LTR
    // item passes through with "ltr" (runBidiTransform parity)
    assert(items(0).dir == "rtl" && items(0).str == "אבגד".reverse)
    assert(items(1).dir == "ltr" && items(1).str == "hello")
  }
}
