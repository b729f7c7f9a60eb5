package graft

import graft.extract.Extractor
import graft.testgen.Synth

/** Ad-hoc per-dialect kernel timing (Test/runMain graft.KernelProfile). */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val texts = (0 until 2000).map { i =>
      val rng = new Synth.Rng(i * 7919L + 3)
      (0 until (30 + rng.nextInt(40))).map(_ => "word" + rng.nextInt(50)).mkString(" ")
    }
    val svg = texts.map(Synth.encodeSvg)
    val html = texts.map(Synth.encodeHtml)
    val pdf = texts.map(Synth.encodePdf)

    // warm everything before any timing (C2 tiering order bias)
    (0 until 3).foreach { _ =>
      svg.foreach(Extractor.extract); html.foreach(Extractor.extract); pdf.foreach(Extractor.extract)
    }

    def bench(name: String, payloads: Seq[String]): Unit = {
      payloads.foreach(Extractor.extract) // warm
      var best = Double.MaxValue
      (0 until 5).foreach { _ =>
        val t0 = System.nanoTime()
        var chars = 0
        payloads.foreach(p => chars += Extractor.extract(p).text.length)
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) best = sec
      }
      println(f"[kernel] $name%-5s ${payloads.length / best}%8.0f payloads/s  (${payloads.map(_.length.toLong).sum / best / 1e6}%6.1f MB/s in)")
    }
    bench("svg", svg)
    bench("html", html)
    bench("pdf", pdf)

    // component split for svg
    val parsed = svg.map(graft.svg.GlyphRunParser.parse)
    var best = Double.MaxValue
    (0 until 5).foreach { _ =>
      val t0 = System.nanoTime()
      svg.foreach(graft.svg.GlyphRunParser.parse)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    println(f"[kernel] svg-parse-only ${svg.length / best}%8.0f payloads/s")
    var best2 = Double.MaxValue
    (0 until 5).foreach { _ =>
      val t0 = System.nanoTime()
      parsed.foreach(p => graft.extract.LineAssembler.assemble(p.runs))
      best2 = math.min(best2, (System.nanoTime() - t0) / 1e9)
    }
    println(f"[kernel] svg-assemble-only ${svg.length / best2}%8.0f payloads/s")
  }
}
