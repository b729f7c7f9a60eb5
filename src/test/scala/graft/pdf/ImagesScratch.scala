package graft.pdf

/** Scratch: enumerate images in the reference corpus (dev tool, not a spec). */
object ImagesScratch {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      "/root/reference/src/test/resources/input",
      "/root/reference/test-papers")
    dirs.foreach { dir =>
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".pdf")).sortBy(_.getName)
      files.foreach { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val doc = PdfDocument.open(bytes)
        val imgs = PdfImages.list(doc)
        println(s"== ${f.getName}: ${imgs.length} images")
        imgs.foreach(i => println(
          f"  p${i.page}%2d ${i.name}%-14s ${i.width}x${i.height} bpc=${i.bpc} cs=${i.colorSpace} " +
          f"f=${i.filter} dec=${i.decodedW}x${i.decodedH} bands=${i.decodedBands} gray=${i.grayMean}"))
        val paper = f.getName.stripSuffix(".pdf")
        imgs.foreach(i => println(
          s"    ('$paper', ${i.page}, '${i.name}', ${i.width}, ${i.height}, ${i.bpc}, " +
          s"'${i.colorSpace}', '${i.filter}', ${i.decodedW}, ${i.decodedH}, " +
          s"${i.decodedBands}, ${i.grayMean}),"))
      }
    }
  }
}
