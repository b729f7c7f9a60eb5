package graft

/** Scratch dump: per-page fontNames + styles as JSON for fixture diffing. */
object DumpStyles {
  def main(args: Array[String]): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    val doc = graft.pdf.PdfDocument.open(bytes)
    def jnum(d: Double): String =
      if (d.isNaN) "null"
      else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val sb = new StringBuilder("[")
    (0 until doc.pages.length).foreach { i =>
      if (i > 0) sb.append(',')
      val (items, styles) = doc.textContentItemsWithStyles(i)
      sb.append("{\"page\":").append(i + 1).append(",\"fontNames\":[")
      sb.append(items.map(it => jstr(it.fontName)).mkString(","))
      sb.append("],\"styles\":{")
      sb.append(styles.map { case (k, st) =>
        val vert = st.vertical.map(v => ",\"vertical\":" + v).getOrElse("")
        jstr(k) + ":{\"fontFamily\":" + jstr(st.fontFamily) +
          ",\"ascent\":" + jnum(st.ascent) + ",\"descent\":" + jnum(st.descent) + vert + "}"
      }.mkString(","))
      sb.append("}}")
    }
    sb.append(']')
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
