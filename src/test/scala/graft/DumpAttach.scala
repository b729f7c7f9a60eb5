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

/** Scratch dump: q70 oracle VALUES rows (per corpus page: annotation count
  * + md5 of the canonical record dump). */
object DumpAnnots {
  def canon(a: graft.pdf.AnnotData): String = {
    def fmt(d: Double): String = {
      val s0 = new java.math.BigDecimal(d)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
      if (s0.isEmpty) "0" else s0
    }
    val color = a.color.map { case (r, g, b) => s"$r,$g,$b" }.getOrElse("-")
    Seq(a.id, a.subtype, a.annotationType.map(_.toString).getOrElse("-"),
      a.rect.map(fmt).mkString(","), a.flags.toString,
      a.hasAppearance.toString, color, a.url.getOrElse("-"),
      a.dest.getOrElse("-"), a.action.getOrElse("-")).mkString("|")
  }
  def main(args: Array[String]): Unit = {
    val paths = Seq(
      "/root/reference/src/test/resources/input/1301.4293.pdf",
      "/root/reference/src/test/resources/input/C04-1204.pdf",
      "/root/reference/src/test/resources/input/test24.pdf",
      "/root/reference/src/test/resources/input/test25.pdf",
      "/root/reference/test-papers/2839.pdf")
    paths.foreach { p =>
      val paper = p.split('/').last.stripSuffix(".pdf")
      val doc = graft.pdf.PdfDocument.open(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
      var any = false
      (0 until doc.pages.length).foreach { i =>
        val as = doc.annotations(i)
        if (as.nonEmpty) {
          any = true
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(as.map(canon).mkString("\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          println(s" ('$paper', ${i + 1}, ${as.length}, '$md5'),")
        }
      }
      if (!any) println(s" ('$paper', -1, 0, ''),")
    }
  }
}

/** Scratch dump: the whitespace-normalization synthetic PDF + our items. */
object DumpWs {
  def main(args: Array[String]): Unit = {
    val bytes = graft.testgen.Synth.pdfWithWhitespaceText()
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/synth_ws.pdf"), bytes)
    val doc = graft.pdf.PdfDocument.open(bytes)
    for (nw <- Seq(false, true)) {
      val items = doc.textContentItems(0, normalizeWhitespace = nw)
      println(s"nw=$nw: " + items.map(i =>
        i.str.map(c => if (c >= 0x20 && c < 0x7f) c.toString else f"\\u${c.toInt}%04x").mkString)
        .mkString(" || "))
    }
  }
}
