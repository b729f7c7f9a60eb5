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
