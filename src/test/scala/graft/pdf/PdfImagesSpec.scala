package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Image XObject enumeration + decode (S13 raster lane): corpus invariants
  * over the reference PDFs, plus synthetic fixtures for the JPEG, raw-sample,
  * Indexed, and form-nested paths. The q61 oracle pins the exact corpus
  * values; this spec pins the structural invariants that make those values
  * trustworthy (decoded dims ≡ dict dims, full-corpus decode coverage).
  */
class PdfImagesSpec extends AnyFunSuite {

  private def load(path: String): Vector[PdfImages.PdfImage] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    PdfImages.list(PdfDocument.open(bytes))
  }

  test("corpus: every image decodes and decoded dims equal dict dims") {
    val papers = Map(
      "/root/reference/src/test/resources/input/test24.pdf" -> 15,
      "/root/reference/src/test/resources/input/test25.pdf" -> 11,
      "/root/reference/test-papers/2839.pdf" -> 10)
    papers.foreach { case (path, expected) =>
      val imgs = load(path)
      assert(imgs.length == expected, s"$path count")
      imgs.foreach { i =>
        assert(i.decodedW == i.width && i.decodedH == i.height,
          s"$path ${i.name}: dict ${i.width}x${i.height} vs decoded ${i.decodedW}x${i.decodedH}")
        assert(i.grayMean >= 0 && i.grayMean <= 255, s"$path ${i.name} gray ${i.grayMean}")
      }
    }
    assert(load("/root/reference/src/test/resources/input/1301.4293.pdf").isEmpty)
  }

  test("corpus: CCITT G4 scans decode white-dominant (photometric mapping)") {
    // a scanned text page is mostly background; an inverted photometric
    // mapping would flip these to ~0-50
    val ccitt = load("/root/reference/test-papers/2839.pdf")
      .filter(_.filter == "CCITTFaxDecode")
    assert(ccitt.length == 7)
    assert(ccitt.forall(_.grayMean > 128), ccitt.map(_.grayMean).mkString(","))
  }

  private def pdfWithImage(imgDict: String, imgBytes: Array[Byte],
      content: String = "q 100 0 0 100 0 0 cm /Im1 Do Q"): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Type /XObject /Subtype /Image $imgDict /Length ${imgBytes.length} >>\nstream\n")
    sb.write(imgBytes)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    sb.toByteArray
  }

  test("synthetic: embedded JPEG round-trips through DCTDecode") {
    val jpeg = graft.ops.Multimodal.encodeTestJpeg(40, 30, seed = 7)
    val pdf = pdfWithImage(
      "/Width 40 /Height 30 /BitsPerComponent 8 /ColorSpace /DeviceRGB /Filter /DCTDecode",
      jpeg)
    val imgs = PdfImages.list(PdfDocument.open(pdf))
    assert(imgs.length == 1)
    val i = imgs.head
    assert(i.decodedW == 40 && i.decodedH == 30 && i.decodedBands == 3)
    // same bytes through the generic image decoder must agree on the mean
    val direct = graft.ops.Multimodal.decodeImage(jpeg).get
    val expectedGray = math.round(
      (299 * direct.mean(0) + 587 * direct.mean(1) + 114 * direct.mean(2)) / 1000 * 255).toInt
    assert(math.abs(i.grayMean - expectedGray) <= 1, s"${i.grayMean} vs $expectedGray")
  }

  test("synthetic: raw gray samples, no filter") {
    // 4x2 gradient, bpc 8, one component
    val samples = Array.tabulate[Byte](8)(i => (i * 32).toByte)
    val pdf = pdfWithImage(
      "/Width 4 /Height 2 /BitsPerComponent 8 /ColorSpace /DeviceGray", samples)
    val i = PdfImages.list(PdfDocument.open(pdf)).head
    assert(i.decodedW == 4 && i.decodedH == 2)
    assert(i.grayMean == math.round(samples.map(_ & 0xff).sum / 8.0).toInt)
  }

  test("synthetic: Indexed palette maps indices through base space") {
    // 2x1, bpc 8, indices 0,1 → palette black / pure red
    val pdf = pdfWithImage(
      "/Width 2 /Height 1 /BitsPerComponent 8 " +
        "/ColorSpace [/Indexed /DeviceRGB 1 <000000FF0000>]",
      Array[Byte](0, 1))
    val i = PdfImages.list(PdfDocument.open(pdf)).head
    assert(i.decodedW == 2 && i.decodedH == 1)
    // mean luma = (0 + 0.299*255)/2 ≈ 38
    assert(math.abs(i.grayMean - 38) <= 1, i.grayMean.toString)
  }

  test("synthetic: 1-bit image mask (no /ColorSpace) decodes") {
    // 8x1: 0xF0 → four white-ish then four black taps under mask semantics
    val pdf = pdfWithImage(
      "/Width 8 /Height 1 /BitsPerComponent 1 /ImageMask true", Array[Byte](0xF0.toByte))
    val i = PdfImages.list(PdfDocument.open(pdf)).head
    assert(i.decodedW == 8 && i.decodedH == 1 && i.bpc == 1)
    assert(i.grayMean == 128) // half 255, half 0
  }

  test("images nested in form XObjects list with path-qualified names") {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes(ISO_8859_1))
    val jpeg = graft.ops.Multimodal.encodeTestJpeg(16, 16, seed = 3)
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /XObject << /Fm1 4 0 R >> >> /Contents 6 0 R >>\nendobj\n")
    val form = "/Im1 Do"
    w(s"4 0 obj\n<< /Type /XObject /Subtype /Form " +
      s"/Resources << /XObject << /Im1 5 0 R >> >> /Length ${form.length} >>\nstream\n$form\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 16 /Height 16 " +
      s"/BitsPerComponent 8 /ColorSpace /DeviceRGB /Filter /DCTDecode /Length ${jpeg.length} >>\nstream\n")
    sb.write(jpeg)
    w("\nendstream\nendobj\n")
    val content = "/Fm1 Do"
    w(s"6 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n0\n%%EOF\n")
    val imgs = PdfImages.list(PdfDocument.open(sb.toByteArray))
    assert(imgs.map(_.name) == Vector("Fm1/Im1"))
    assert(imgs.head.decodedW == 16)
  }

  test("ccitt TIFF wrap: header structure is a valid little-endian TIFF") {
    val tiff = PdfImages.wrapCcittAsTiff(Array[Byte](1, 2, 3), 100, 50,
      k = -1, blackIs1 = false, byteAlign = false)
    assert(tiff(0) == 'I' && tiff(1) == 'I' && tiff(2) == 42)
    val buf = java.nio.ByteBuffer.wrap(tiff).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(4)
    val ifd = buf.getInt
    buf.position(ifd)
    val n = buf.getShort
    val tags = (0 until n).map { _ =>
      val id = buf.getShort & 0xffff; buf.getShort; buf.getInt; buf.getInt; id
    }
    assert(tags == tags.sorted, "IFD tags must be ascending")
    assert(tags.contains(259) && tags.contains(293)) // Compression + T6Options
    // payload lands at the strip offset
    assert(tiff.takeRight(3).toSeq == Seq[Byte](1, 2, 3))
  }
}
