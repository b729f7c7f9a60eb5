package graft

import graft.pdf.PdfDocument
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Never-fail discipline under corruption (SURVEY.md §2.1 S6): random byte
  * mutations, truncations and garbage prefixes of a real PDF must parse to
  * SOMETHING (possibly zero pages) without throwing — at 10^12 rows a single
  * malformed file must not kill the job.
  */
class PdfFuzzSpec extends AnyFunSuite {

  private val pdfPath = Paths.get("/root/reference/src/test/resources/input/1301.4293.pdf")

  test("mutated / truncated / garbage-prefixed PDFs never throw") {
    if (!Files.exists(pdfPath)) cancel("reference inputs not present")
    val base = Files.readAllBytes(pdfPath)
    val rnd = new scala.util.Random(42)

    def openSafely(bytes: Array[Byte], what: String): Unit = {
      val doc = PdfDocument.open(bytes)
      val n = doc.tspanTexts.length // forces full parse + evaluation
      assert(n >= 0, what)
    }

    // point mutations
    (0 until 120).foreach { k =>
      val b = base.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      openSafely(b, s"mutation $k")
    }
    // truncations (incl. mid-xref and mid-stream)
    Seq(10, 100, 1024, base.length / 3, base.length / 2, base.length - 20).foreach { len =>
      openSafely(java.util.Arrays.copyOf(base, len), s"truncate $len")
    }
    // garbage prefix (common in mail-extracted PDFs) and pure garbage
    openSafely("GARBAGE HEADER\n".getBytes ++ base, "prefix")
    openSafely(Array.fill(4096)(rnd.nextInt(256).toByte), "pure garbage")
    openSafely(Array.emptyByteArray, "empty")
  }

  test("round-3 surfaces under mutation: colorspace, vertical W2, metadata, XMP") {
    // a synthetic doc exercising every round-3 dict parser, then mutated —
    // corrupt /W2 triples, Indexed lookups, /Info and /Metadata must all
    // degrade, never throw
    import java.nio.charset.StandardCharsets.ISO_8859_1
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String) = sb.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Metadata 9 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> /ColorSpace << /CS0 [/Indexed /DeviceRGB 1 <FF000000FF00>] " +
      "/CS1 [/Separation /Spot /DeviceCMYK 10 0 R] >> >> /Contents 8 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /V /Encoding /Identity-V " +
      "/DescendantFonts [5 0 R] >>\nendobj\n")
    w("5 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /V /FontDescriptor 6 0 R " +
      "/DW 1000 /W [1 [500]] /DW2 [880 -1000] /W2 [1 [-800 250 880] 5 9 -900 300 880] >>\nendobj\n")
    w("6 0 obj\n<< /Type /FontDescriptor /FontName /V /Flags 4 >>\nendobj\n")
    w("7 0 obj\n<< /Title (t) /Author (\\376\\377\\000A) /Trapped /False >>\nendobj\n")
    val content = "BT /F1 12 Tf /CS0 cs 1 scn 72 720 Td <00010005> Tj /CS1 cs 0.5 scn (x) Tj ET"
    w(s"8 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val xml = "<?xpacket?><x:xmpmeta></x:xmpmeta>"
    w(s"9 0 obj\n<< /Type /Metadata /Subtype /XML /Length ${xml.length} >>\nstream\n$xml\nendstream\nendobj\n")
    w("10 0 obj\n<< /FunctionType 2 >>\nendobj\n")
    w("trailer\n<< /Size 11 /Root 1 0 R /Info 7 0 R >>\nstartxref\n0\n%%EOF\n")
    val base = sb.toByteArray

    def openSafely(bytes: Array[Byte], what: String): Unit = {
      val doc = PdfDocument.open(bytes)
      val _ = (doc.tspanTexts.length, doc.info.size, doc.xmp.map(_.length))
      assert(true, what)
    }
    openSafely(base, "clean") // sanity: the unmutated doc parses
    val rnd = new scala.util.Random(7)
    (0 until 80).foreach { k =>
      val b = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      openSafely(b, s"mutation $k")
    }
    Seq(30, base.length / 2, base.length - 10).foreach { len =>
      openSafely(java.util.Arrays.copyOf(base, len), s"truncate $len")
    }
  }
}
