package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

/** Cross-document font dedupe (reference preEvaluateFont content hashing,
  * pdf.combined.js:46716-46793): identical font content loaded from two
  * separate documents must come back as the same FontSpec instance; any
  * content difference must miss the cache.
  */
class FontCacheSpec extends AnyFunSuite {

  private def miniPdf(fontWidths: String): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    val content = "BT /F1 10 Tf 10 700 Td (hi) Tj ET"
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Courier " +
      s"/FirstChar 32 /LastChar 33 /Widths [$fontWidths] /FontDescriptor 6 0 R >>\nendobj\n")
    w("6 0 obj\n<< /Type /FontDescriptor /FontName /Courier /Flags 33 " +
      "/MissingWidth 600 >>\nendobj\n")
    w("trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    sb.toByteArray
  }

  test("identical font content across documents shares one FontSpec instance") {
    val a = new PdfFile(miniPdf("600 600"))
    val b = new PdfFile(miniPdf("600 600"))
    val da = a.resolve(PObj.PRef(5, 0)).asInstanceOf[PObj.PDict]
    val db = b.resolve(PObj.PRef(5, 0)).asInstanceOf[PObj.PDict]
    val fa = FontLoader.load(da, a)
    val fb = FontLoader.load(db, b)
    assert(fa eq fb, "expected the cross-document cache to return the same instance")
  }

  test("content difference (widths) misses the cache") {
    val a = new PdfFile(miniPdf("600 600"))
    val c = new PdfFile(miniPdf("600 700"))
    val da = a.resolve(PObj.PRef(5, 0)).asInstanceOf[PObj.PDict]
    val dc = c.resolve(PObj.PRef(5, 0)).asInstanceOf[PObj.PDict]
    val fa = FontLoader.load(da, a)
    val fc = FontLoader.load(dc, c)
    assert(!(fa eq fc))
    assert(fa.widths(33) == 600.0 && fc.widths(33) == 700.0)
  }

  test("reference corpus: second open re-uses every font (skips when absent)") {
    val p = Paths.get("/root/reference/src/test/resources/input/test24.pdf")
    if (!Files.exists(p)) cancel("reference inputs not present")
    val bytes = Files.readAllBytes(p)
    // prime, then re-open: golden content must be identical through the cache
    val runs1 = PdfDocument.open(bytes).tspanTexts
    val runs2 = PdfDocument.open(bytes).tspanTexts
    assert(runs1 == runs2)
  }
}
