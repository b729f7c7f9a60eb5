package graft

/** Scratch dump: write the synthetic attachment/JavaScript PDFs to /tmp for
  * the out-of-band node cross-validation (/tmp/getattach.js), and print our
  * surfaces for fixture comparison. */
object DumpAttach {
  def main(args: Array[String]): Unit = {
    val cases = Seq(
      "attach" -> graft.testgen.Synth.pdfWithAttachments(),
      "js" -> graft.testgen.Synth.pdfWithJavaScript(),
      "jsopen" -> graft.testgen.Synth.pdfWithJavaScript(openActionJs = true))
    cases.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/synth_$name.pdf"), bytes)
      val doc = graft.pdf.PdfDocument.open(bytes)
      val atts = doc.attachments.toSeq.map { case (k, (fn, content)) =>
        val md5 = content.map(c => java.security.MessageDigest.getInstance("MD5")
          .digest(c).map("%02x".format(_)).mkString).getOrElse("null")
        s"$k -> filename=$fn len=${content.map(_.length).getOrElse(-1)} md5=$md5"
      }
      println(s"== $name: attachments=${atts.mkString(" | ")} js=${doc.javaScript.mkString(" ; ")}")
    }
  }
}

/** Scratch dump: our fingerprints over the corpus + a synthetic (md5 path). */
object DumpFingerprint {
  def main(args: Array[String]): Unit = {
    val paths = Seq(
      "/root/reference/src/test/resources/input/1301.4293.pdf",
      "/root/reference/src/test/resources/input/C04-1204.pdf",
      "/root/reference/src/test/resources/input/test24.pdf",
      "/root/reference/src/test/resources/input/test25.pdf",
      "/root/reference/test-papers/2839.pdf")
    paths.foreach { p =>
      val doc = graft.pdf.PdfDocument.open(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      println(s"${p.split('/').last}: ${doc.fingerprint}")
    }
    println("synth_js: " + graft.pdf.PdfDocument.open(
      graft.testgen.Synth.pdfWithJavaScript()).fingerprint)
  }
}
