package graft.tools

/** One-off dump used while pinning q61 oracle literals. */
object DumpJbig2Means {
  def main(args: Array[String]): Unit = {
    for ((name, pdf) <- Seq(
      ("jbig2htmmr", graft.testgen.Jbig2Synth.pdfWithJbig2(48, 32, seed = 0, halftoneMmr = true)),
      ("jbig2huffref", graft.testgen.Jbig2Synth.pdfWithJbig2(40, 24, seed = 0, huffRefine = true)))) {
      val imgs = graft.pdf.PdfImages.list(graft.pdf.PdfDocument.open(pdf))
      imgs.foreach(i => println(s"MEAN $name ${i.decodedW}x${i.decodedH} bands=${i.decodedBands} mean=${i.grayMean}"))
    }
  }
}
