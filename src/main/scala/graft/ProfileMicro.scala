package graft

import graft.extract.Extractor
import graft.testgen.Synth

/** Plain-JVM microbenchmarks for the per-row hot kernels the headline queries
  * spend their time in (guide §1.2 step 2: per-task work). No Spark session —
  * this isolates kernel cost from scheduling/shuffle overhead so the
  * OPTIMIZATION_r07.md numbers attribute time to the right layer.
  *
  * sbt "runMain graft.ProfileMicro"
  */
object ProfileMicro {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val rng = new Synth.Rng(42)
    val vocab = "the of and a to in is for on with spark scala data query table row".split(" ")
    val docs = Array.tabulate(2000) { _ =>
      Array.fill(5 + rng.nextInt(60))(vocab(rng.nextInt(vocab.length))).mkString(" ")
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    // warm + measure each lane: encode alone, encode+extract
    def lane(name: String, enc: String => String): Unit = {
      var sink = 0L
      (0 until 2).foreach(_ => docs.foreach(d => sink += enc(d).length))
      val tEnc = time(docs.foreach(d => sink += enc(d).length))
      val payloads = docs.map(enc)
      (0 until 2).foreach(_ => payloads.foreach(p => sink += Extractor.extract(p).text.length))
      val tExt = time(payloads.foreach(p => sink += Extractor.extract(p).text.length))
      println(s"$name: encode=${f3(tEnc)}s extract=${f3(tExt)}s per 2000 docs (sink=$sink)")
    }
    lane("svg", Synth.encodeSvg)
    lane("html", Synth.encodeHtml)
    lane("pdf", Synth.encodePdf)
    lane("md", Synth.encodeMarkdown)

    // pf in isolation: coordinate-shaped doubles
    val xs = Array.tabulate(200000)(i => 91.92 + i * 6.5732001953125e-3)
    var acc = 0L
    (0 until 2).foreach(_ => xs.foreach(x => acc += graft.core.NumFmt.pf(x).length))
    val tPf = time(xs.foreach(x => acc += graft.core.NumFmt.pf(x).length))
    println(s"pf: ${f3(tPf)}s per 200k calls (acc=$acc)")
  }
}
