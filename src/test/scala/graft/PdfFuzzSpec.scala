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
}
