package graft.tools

/** One-off corpus dump used while pinning the q64 oracle literals. */
object DumpPageLabels {
  def main(args: Array[String]): Unit = {
    for (d <- Seq("/root/reference/src/test/resources/input", "/root/reference/test-papers")) {
      val dir = new java.io.File(d)
      if (dir.isDirectory) dir.listFiles().filter(_.getName.endsWith(".pdf")).sortBy(_.getName).foreach { f =>
        val doc = graft.pdf.PdfDocument.open(java.nio.file.Files.readAllBytes(f.toPath))
        println(s"PLABELS ${f.getName} pages=${doc.pages.length} ${doc.pageLabels}")
      }
    }
  }
}
