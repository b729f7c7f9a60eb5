package graft

import graft.JsonMini._
import graft.pdf.PdfDocument
import graft.testgen.Synth
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** getAttachments / getJavaScript parity: the committed fixtures
  * (src/test/resources/reference-synth-*.json) are the VENDORED ENGINE'S
  * own output over the deterministic synthetic PDFs (regenerate with
  * `Test/runMain graft.DumpAttach` + /tmp/getattach.js) — covering the
  * FileSpec platform-name pick (UF > F > ...), the reference's exact
  * backslash normalization, UTF-16BE tree keys and /UF names, Flate and
  * raw /EF content, EF-less specs (null content), /S /JavaScript actions
  * with string and stream /JS, non-JS actions skipped, the de-facto named
  * Print OpenAction, and an /OpenAction JavaScript dict. The corpus PDFs
  * carry neither surface (both engines agree they are empty). */
class AttachmentsSpec extends AnyFunSuite {

  private def fixture(name: String): JObj =
    parse(new String(Files.readAllBytes(
      Paths.get(s"src/test/resources/reference-synth-$name.json")),
      StandardCharsets.UTF_8)).asInstanceOf[JObj]

  private def md5(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("attachments: filenames, keys, contents match the vendored engine") {
    val fx = fixture("attach")
    val doc = PdfDocument.open(Synth.pdfWithAttachments())
    val exp = fx("attachments").asInstanceOf[JObj].fields
    assert(doc.attachments.size == exp.length)
    exp.foreach { case (k, vj) =>
      val v = vj.asInstanceOf[JObj]
      val got = doc.attachments.get(k)
      assert(got.isDefined, s"missing $k")
      val (fn, content) = got.get
      assert(fn == v("filename").asInstanceOf[JStr].v, s"$k filename")
      (v("len"), content) match {
        case (JNull, None) => ()
        case (JNum(n), Some(c)) =>
          assert(c.length == n.toInt, s"$k len")
          assert(md5(c) == v("md5").asInstanceOf[JStr].v, s"$k md5")
        case (n, c) => fail(s"$k content: $n vs ${c.map(_.length)}")
      }
    }
    assert(doc.javaScript.isEmpty)
  }

  test("document JavaScript: tree + OpenAction variants match the vendored engine") {
    for (name <- Seq("js", "jsopen")) {
      val fx = fixture(name)
      val doc = PdfDocument.open(
        Synth.pdfWithJavaScript(openActionJs = name == "jsopen"))
      val exp = fx("javaScript").asInstanceOf[JArr].items.map(_.asInstanceOf[JStr].v)
      assert(doc.javaScript == exp, name)
      assert(doc.attachments.isEmpty, name)
    }
  }

  test("fingerprints match the vendored engine (trailer /ID and md5-of-head paths)") {
    // literals from /tmp/getfp.js over the vendored build: all five corpus
    // PDFs take the trailer-/ID path; the synthetic (no /ID, 596 bytes)
    // takes md5-of-first-1024 INCLUDING the reference's zero-pad quirk
    // (calculateMD5 is always called with length 1024)
    val expected = Seq(
      "/root/reference/src/test/resources/input/1301.4293.pdf" -> "9605231df768918a8dc5a1b770bff72e",
      "/root/reference/src/test/resources/input/C04-1204.pdf" -> "e2ad24e5cb021ebfbc52ffa6449933bb",
      "/root/reference/src/test/resources/input/test24.pdf" -> "c37dbdcbecd3bbbef8e50f83bd0d4ef7",
      "/root/reference/src/test/resources/input/test25.pdf" -> "eb7e9f8123febb91b7c47bffa44269b5",
      "/root/reference/test-papers/2839.pdf" -> "3b70f2b8de5cb59e6a3462073141096f")
    expected.foreach { case (p, fp) =>
      val pp = Paths.get(p)
      if (Files.exists(pp))
        assert(PdfDocument.open(Files.readAllBytes(pp)).fingerprint == fp, p)
    }
    assert(PdfDocument.open(Synth.pdfWithJavaScript()).fingerprint ==
      "f0d116bb202f6a4030a3930fda64778a")
  }

  test("the corpus carries neither surface; malformed trees degrade empty") {
    Seq("/root/reference/src/test/resources/input/test24.pdf",
      "/root/reference/test-papers/2839.pdf").foreach { p =>
      val pp = Paths.get(p)
      if (Files.exists(pp)) {
        val doc = PdfDocument.open(Files.readAllBytes(pp))
        assert(doc.attachments.isEmpty && doc.javaScript.isEmpty, p)
      }
    }
    // duplicate tree kid: the getAll assert abandons the surface
    val cyc = Synth.pdfWithCatalogExtra(1,
      "/Names << /EmbeddedFiles << /Kids [4 0 R 4 0 R] >> >>",
      Seq("<< /Names [(x) << /Type /Filespec /F (x) >>] >>"))
    assert(PdfDocument.open(cyc).attachments.isEmpty)
  }
}
