package graft

import graft.pdf._

/** Scratch diagnostic main (test scope only): dump content-stream snippets and
  * font mappings while bringing up real-PDF ingestion. */
object DebugPdf {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "1301.4293"
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/root/reference/src/test/resources/input/$name.pdf"))
    val doc = PdfDocument.open(bytes)
    println("pages: " + doc.pages.length)
    val pageIdx = if (args.length > 2) args(2).toInt else 0
    val content = doc.pages(pageIdx).content
    val s = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val needle = if (args.length > 1) args(1) else "Latent"
    doc.pages.indices.foreach { pi =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/content-$name-$pi.txt"),
        doc.pages(pi).content)
    }
    val i = s.indexOf(needle)
    println("--- content around needle ---")
    if (i >= 0) println(s.substring(math.max(0, i - 600), math.min(s.length, i + 200)))
    else println("needle not found; first 800 bytes:\n" + s.take(800))
    println("--- first runs ---")
    doc.evalPage(pageIdx).runs.take(10).foreach(r =>
      println(s"[${r.fontFamily} sz=${r.fontSize} y=${r.y} x0=${if (r.xs.nonEmpty) r.xs(0) else -1}] '${r.text}'"))
    if (args.length > 3 && args(3) == "dump") {
      val traceOut = new StringBuilder
      val allRuns = doc.pages.indices.flatMap { pi =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        graft.eval.ContentEvaluator.EvalTrace.sink = buf
        val rs = doc.evalPage(pi).runs
        graft.eval.ContentEvaluator.EvalTrace.sink = null
        buf.foreach(l => traceOut.append(pi).append('\t').append(l).append('\n'))
        rs
      }.toVector
      val all = allRuns.filter(_.text.nonEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/trace-$name.tsv"),
        traceOut.toString.getBytes("UTF-8"))
      val sb = new StringBuilder
      all.foreach { r =>
        val x0 = if (r.xs.nonEmpty) r.xs(0) else 0.0
        val xe = if (r.xs.nonEmpty) r.xs.last else 0.0
        sb.append(s"${r.page}\t${r.fontFamily}\t${r.fontSize}\t${r.y}\t$x0\t$xe\t")
          .append(r.matrix.mkString(","))
          .append('\t')
          .append(r.text.map(c => if (c < 0x20) f"\\u${c.toInt}%04x" else c.toString).mkString)
          .append('\n')
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/entries-$name.tsv"),
        sb.toString.getBytes("UTF-8"))
      println(s"dumped ${all.length} entries")
    }
    if (args.length > 4 && args(3) == "entries") {
      val lo = args(4).toInt
      val hi = if (args.length > 5) args(5).toInt else lo + 10
      val all = doc.allRuns.filter(_.text.nonEmpty)
      (lo until math.min(hi, all.length)).foreach { i =>
        val r = all(i)
        println(s"#$i p${r.page} [${r.fontFamily} sz=${r.fontSize}] '${r.text}'")
      }
    }
  }
}
