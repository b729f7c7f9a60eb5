package graft

import graft.pdf.PdfDocument
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Composite (Type0/Identity-H) font path: two-byte charcodes, CID widths from
  * /DW + /W, text from a 2-byte-keyed /ToUnicode CMap (SURVEY.md §2.5 F3/F4
  * multi-byte path; charsToGlyphs pdf.combined.js:36697-36714). The synthetic
  * PDF deliberately ships a broken startxref so the document also exercises
  * the S6 recovery scan (XRef.indexObjects discipline).
  */
class CompositeFontSpec extends AnyFunSuite {

  private def obj(num: Int, body: String): String = s"$num 0 obj\n$body\nendobj\n"

  private def stream(num: Int, data: String): String = {
    s"$num 0 obj\n<< /Length ${data.length} >>\nstream\n$data\nendstream\nendobj\n"
  }

  private val toUnicodeCMap =
    """/CIDInit /ProcSet findresource begin
      |begincmap
      |2 beginbfchar
      |<0001> <4F60>
      |<0002> <597D>
      |endbfchar
      |1 beginbfrange
      |<000A> <000C> <0041>
      |endbfrange
      |endcmap
      |end""".stripMargin

  private val content =
    "BT /F1 12 Tf 72 720 Td <000100020001> Tj 0 -20 Td <000A000B000C> Tj ET"

  private def pdfBytes: Array[Byte] = {
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append(obj(1, "<< /Type /Catalog /Pages 2 0 R >>"))
    sb.append(obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    sb.append(obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 8 0 R >>"))
    sb.append(obj(4, "<< /Type /Font /Subtype /Type0 /BaseFont /TestCID " +
      "/Encoding /Identity-H /DescendantFonts [5 0 R] /ToUnicode 7 0 R >>"))
    sb.append(obj(5, "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
      "/FontDescriptor 6 0 R /DW 1000 /W [1 [500 600] 10 12 750] >>"))
    sb.append(obj(6, "<< /Type /FontDescriptor /FontName /TestCID /Flags 4 " +
      "/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 /Descent -200 " +
      "/CapHeight 700 /StemV 80 >>"))
    sb.append(stream(7, toUnicodeCMap))
    sb.append(stream(8, content))
    // broken xref on purpose: the recovery scan must index the objects
    sb.append("trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  test("Identity-H composite font: 2-byte charcodes, CID widths, ToUnicode text") {
    val doc = PdfDocument.open(pdfBytes)
    assert(doc.pages.length == 1)
    val runs = doc.evalPage(0).runs
    assert(runs.map(_.text) == Vector("你好你", "ABC"))
    // x-advances from /W: cid 1 -> 500, cid 2 -> 600, at 12pt
    val r0 = runs(0)
    assert(r0.xs.length == 3)
    assert(math.abs(r0.xs(1) - (r0.xs(0) + 500 * 12 / 1000.0)) < 1e-9)
    assert(math.abs(r0.xs(2) - (r0.xs(1) + 600 * 12 / 1000.0)) < 1e-9)
    // bfrange run: cids 10..12 -> A..C at the /W range width 750
    val r1 = runs(1)
    assert(math.abs(r1.xs(1) - (r1.xs(0) + 750 * 12 / 1000.0)) < 1e-9)
  }

  test("default width /DW applies to unlisted CIDs") {
    // show cid 0x0005 (not in /W) — advance must be DW=1000
    val alt = new String(pdfBytes, ISO_8859_1)
      .replace("<000100020001>", "<00050005>")
    val doc = PdfDocument.open(alt.getBytes(ISO_8859_1))
    val r = doc.evalPage(0).runs.head
    assert(math.abs(r.xs(1) - (r.xs(0) + 12.0)) < 1e-9) // 1000 * 12 / 1000
  }

  test("Identity-V vertical writing: /W2 vmetrics advance the pen in y") {
    // same document, but the CMap is vertical and the descendant carries
    // /DW2 [880 -1000] (default) + /W2 [1 [-800 250 880]]:
    //   cid 1 -> w1=-800 (advance), vx=250 (x shift), vy=880
    //   cid 2 -> no /W2 entry -> default w1=-1000, vx = width/2 = 300
    val vert = new String(pdfBytes, ISO_8859_1)
      .replace("/Encoding /Identity-H", "/Encoding /Identity-V")
      .replace("/DW 1000 /W [1 [500 600] 10 12 750] >>",
        "/DW 1000 /W [1 [500 600] 10 12 750] /DW2 [880 -1000] /W2 [1 [-800 250 880]] >>")
      .replace("<000A000B000C> Tj ET", "<000A000B000C> Tj 0.5 g <0001> Tj ET")
    val doc = PdfDocument.open(vert.getBytes(ISO_8859_1))
    val runs = doc.evalPage(0).runs
    assert(runs.map(_.text) == Vector("你好你", "ABC", "你"))
    val r0 = runs(0)
    // glyph x = pen x − vx·scale: cid1 at 72 − 250·0.012, cid2 at 72 − (600/2)·0.012
    assert(math.abs(r0.xs(0) - (72 - 250 * 12 / 1000.0)) < 1e-9, r0.xs.toSeq)
    assert(math.abs(r0.xs(1) - (72 - 600 * 0.5 * 12 / 1000.0)) < 1e-9, r0.xs.toSeq)
    assert(math.abs(r0.xs(2) - (72 - 250 * 12 / 1000.0)) < 1e-9) // cid1 again
    // run y attribute is the show's START baseline: -720 in tspan space
    assert(math.abs(r0.y - -720.0) < 1e-9)
    // Td is relative to the LINE matrix (translateTextMatrix's intra-line
    // advance is discarded by moveText, reference semantics): 720-20 = 700
    val r1 = runs(1)
    assert(math.abs(r1.y - -700.0) < 1e-9, s"r1.y=${r1.y}")
    // a show with NO intervening Td continues from the advanced pen (the
    // fill change only breaks the tspan): ABC are cids 10..12 without /W2 →
    // default w1 = −1000 each → 3·12pt = 36 down
    val r2 = runs(2)
    assert(math.abs(r2.y - -(700 - 36)) < 1e-9, s"r2.y=${r2.y}")
  }
}
