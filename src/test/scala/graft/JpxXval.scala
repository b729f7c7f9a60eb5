package graft

import graft.pdf.Jpx
import graft.testgen.JpxSynth

/** Scratch cross-validation main (test scope): emit JpxSynth codestreams for
  * the multi-layer non-LRCP progression classes plus our decoder's output
  * (interleaved, DC-shifted/clamped 0-255 — the vendored tile-item format)
  * so /tmp/jpx_harness.js can be diffed against them out-of-band. */
object JpxXval {
  def main(args: Array[String]): Unit = {
    val (w, h) = (48, 40)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val gray = Array(JpxSynth.testGray(w, h, 7))
    val cases: Seq[(String, Array[Byte], Int)] = Seq(
      ("rlcp_l2", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 2, prog = 1), 3),
      ("rlcp_l3", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 3, prog = 1), 3),
      ("rpcl_l3", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 3, prog = 2), 3),
      ("pcrl_l2", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 2, prog = 3), 3),
      ("cprl_l3", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 3, prog = 4), 3),
      ("rpcl_gray_l3_97", JpxSynth.encode(gray, w, h, 8, 2, reversible = false, layers = 3, prog = 2), 1),
      ("cprl_sopeph_l2", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 2, prog = 4, sop = true, eph = true), 3),
      // custom precinct partitions (round 6): 48×40 levels 2, PPx/PPy
      // 4/4, 4/4, 5/5 → grids 1×1 / 2×2 / 2×2, code-blocks clamped to 8 at
      // r1 — across progressions, layers, RGB and 9/7
      ("prec_lrcp", JpxSynth.encode(gray, w, h, 8, 2, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55)), 1),
      ("prec_rlcp_l2", JpxSynth.encode(gray, w, h, 8, 2, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), prog = 1, layers = 2), 1),
      ("prec_rpcl_l3", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), prog = 2, layers = 3), 3),
      ("prec_pcrl", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), prog = 3), 3),
      ("prec_cprl_l2", JpxSynth.encode(planes, w, h, 8, 2, mct = 1, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), prog = 4, layers = 2), 3),
      ("prec_97_rpcl", JpxSynth.encode(gray, w, h, 8, 2, reversible = false, cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), prog = 2), 1),
      ("prec_tiny_lrcp", JpxSynth.encode(gray, w, h, 8, 2, cbExp = 5, precSizes = Seq(0x33, 0x33, 0x44), layers = 2), 1),
      // reference-grid offsets (round 6): image [16,64)×[8,48) on a 64×48
      // extent — visible 48×40; offsets are multiples of 2^levels so the
      // vendored transform's fixed-parity interleave stays correct and the
      // comparison is meaningful (it mis-decodes odd origins)
      ("off_gray", JpxSynth.encode(gray, w + 16, h + 8, 8, 2, xOff = 16, yOff = 8), 1),
      ("off_rgb_rct", JpxSynth.encode(planes, w + 16, h + 8, 8, 2, mct = 1, xOff = 16, yOff = 8), 3),
      ("off_97", JpxSynth.encode(gray, w + 16, h + 8, 8, 2, reversible = false, xOff = 16, yOff = 8), 1),
      ("off_tileorigin", JpxSynth.encode(gray, w + 16, h + 8, 8, 2, xOff = 16, yOff = 8, xtOff = 8, ytOff = 4), 1),
      // offsets + custom precincts, band origins PRECINCT-ALIGNED at every
      // level (xOff 64 → band origins 16/32 vs subband precinct sizes
      // 16/8/16): the only offsets+precincts class the vendored decoder can
      // arbitrate — its codeblock→precinct mapping anchors at the BAND
      // origin (pdf.combined.js:11209-11212) where T.800 B.6's partition is
      // absolute, so unaligned band origins desync it (1873/1920 samples
      // when tried); the unaligned class is pinned by JpxSpec round-trips
      ("off_prec", JpxSynth.encode(gray, w + 64, h + 64, 8, 2, cbExp = 4,
        precSizes = Seq(0x44, 0x44, 0x55), xOff = 64, yOff = 64), 1))
    for ((name, cs, comps) <- cases) {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xval_$name.j2k"), cs)
      val d = Jpx.decode(cs).getOrElse(sys.error(s"our decoder rejected $name"))
      require(d.planes.length == comps)
      val items = new Array[Int](w * h * comps)
      var i = 0
      var px = 0
      while (px < w * h) {
        var c = 0
        while (c < comps) {
          items(i) = math.max(0, math.min(255, d.planes(c)(px)))
          i += 1; c += 1
        }
        px += 1
      }
      val sb = new StringBuilder
      sb.append(s"""{"w":$w,"h":$h,"comps":$comps,"items":[""")
      sb.append(items.mkString(","))
      sb.append("]}")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xval_$name.ours.json"),
        sb.toString.getBytes("UTF-8"))
      println(s"wrote $name (${cs.length} bytes)")
    }

    // per-tile coding overrides (round 6, /tmp/xval_cmp_tiles.js — the
    // vendored decoder composites per-tile items with left/top origins):
    // classes stay inside ITS subset (no bypass/reset/termall style bits)
    val (tw, th) = (80, 64)
    val tgray = Array(JpxSynth.testGray(tw, th, 31))
    val trgb = Array(JpxSynth.testGray(tw, th, 1), JpxSynth.testGray(tw, th, 4),
      JpxSynth.testGray(tw, th, 9))
    val contrast = Array(Array.tabulate(tw * th) { i =>
      val x = i % tw
      if (x < 48) (if (((i / tw) + x) % 2 == 0) 255 else 0) else 128 + (x % 3)
    })
    // outside the vendored subset (round-trip-gated in JpxSpec instead):
    // COC-bearing classes (it throws 'COC not implemented' everywhere) and
    // tile-COD SOP/EPH (its parseTilePackets reads the flags from the MAIN
    // COD only — pdf.combined.js:11754-11755 — so a tile-signalled SOP
    // desyncs it with 'Out of packets')
    val tileCases: Seq[(String, Array[Byte], Int, Int, Int)] = Seq(
      ("tcod_mix", JpxSynth.encode(tgray, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileH = 40, tileCoding = Map(
          1 -> JpxSynth.TileCoding(prog = Some(1)),
          2 -> JpxSynth.TileCoding(layers = Some(3)),
          3 -> JpxSynth.TileCoding(levels = Some(1), cbExp = Some(3),
            ownQcd = true))), 1, tw, th),
      ("tqcd_own", JpxSynth.encode(contrast, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileCoding = Map(1 -> JpxSynth.TileCoding(ownQcd = true))),
        1, tw, th),
      ("twavelet", JpxSynth.encode(tgray, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileCoding = Map(
          1 -> JpxSynth.TileCoding(reversible = Some(false), ownQcd = true))),
        1, tw, th),
      ("tcod_rlcp", JpxSynth.encode(tgray, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileH = 40, tileCoding = Map(
          1 -> JpxSynth.TileCoding(prog = Some(1)))), 1, tw, th),
      ("tcod_rgb_rct", JpxSynth.encode(trgb, tw, th, 8, levels = 2, cbExp = 4,
        mct = 1, tileW = 48, tileCoding = Map(
          1 -> JpxSynth.TileCoding(prog = Some(4), layers = Some(2)))),
        3, tw, th),
      ("tcod_layers", JpxSynth.encode(tgray, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileH = 40, tileCoding = Map(
          2 -> JpxSynth.TileCoding(layers = Some(3)))), 1, tw, th),
      ("tcod_levels", JpxSynth.encode(tgray, tw, th, 8, levels = 2, cbExp = 4,
        tileW = 48, tileH = 40, tileCoding = Map(
          3 -> JpxSynth.TileCoding(levels = Some(1), cbExp = Some(3),
            ownQcd = true))), 1, tw, th),
      // tile-COD custom precincts: 128-wide so every band origin stays
      // precinct-aligned (the vendored anchoring is band-relative — its
      // 3rd bug — so only aligned configurations arbitrate)
      ("tcod_prec", JpxSynth.encode(Array(JpxSynth.testGray(128, 64, 29)),
        128, 64, 8, levels = 2, cbExp = 4, tileW = 64, tileCoding = Map(
          1 -> JpxSynth.TileCoding(precSizes = Seq(0x44, 0x44, 0x55)))),
        1, 128, 64))
    for ((name, cs, comps, cw, ch) <- tileCases) {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xvt_$name.j2k"), cs)
      val d = Jpx.decode(cs).getOrElse(sys.error(s"our decoder rejected $name"))
      require(d.planes.length == comps && d.w == cw && d.h == ch)
      val items = new Array[Int](cw * ch * comps)
      var i = 0
      var px = 0
      while (px < cw * ch) {
        var c = 0
        while (c < comps) {
          items(i) = math.max(0, math.min(255, d.planes(c)(px)))
          i += 1; c += 1
        }
        px += 1
      }
      val sb = new StringBuilder
      sb.append(s"""{"w":$cw,"h":$ch,"comps":$comps,"items":[""")
      sb.append(items.mkString(","))
      sb.append("]}")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/xvt_$name.ours.json"),
        sb.toString.getBytes("UTF-8"))
      println(s"wrote tile-class $name (${cs.length} bytes)")
    }
  }
}
