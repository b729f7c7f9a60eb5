package graft.pdf

import graft.testgen.Jbig2Synth
import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 pattern dictionaries + halftone regions (T.88 6.6/6.7) — the last
  * region category, which the vendored reference decoder has no branch for
  * (processSegment errors on types 16/20/22/23). Pattern dictionaries
  * decode their collective bitmap with the spec's AT1 = (−HDPW, 0);
  * halftone grayscale images decode as Gray-coded bitplanes over one
  * shared context (C.5); patterns stamp at the rotated grid
  * x = (HGX + mg·HRY + ng·HRX) >> 8, y = (HGY + mg·HRX − ng·HRY) >> 8
  * (6.6.5.1). MMR-coded grayscale (one continuous G4 stream across all
  * bitplanes) and HENABLESKIP (6.6.5.1 out-of-region cells skipped per
  * 6.2.5.7) decode since round 6 — no halftone cuts remain. */
class Jbig2HalftoneSpec extends AnyFunSuite {

  // four 6×6 density patterns (growing dot)
  private def pats: Seq[Jbig2.Bitmap] = Seq(
    Jbig2Synth.glyph(Seq("......", "......", "......", "......", "......", "......")),
    Jbig2Synth.glyph(Seq("......", "......", "..##..", "..##..", "......", "......")),
    Jbig2Synth.glyph(Seq("......", ".####.", ".####.", ".####.", ".####.", "......")),
    Jbig2Synth.glyph(Seq("######", "######", "######", "######", "######", "######")))

  test("pattern dictionary round-trips (arithmetic templates + MMR)") {
    for (template <- 0 to 3) {
      val data = Jbig2Synth.encodePatternDictData(pats, template)
      val out = Jbig2.decodePatternDict(data, 0, data.length)
      assert(out.isDefined, s"template $template")
      assert(out.get.length == 4)
      out.get.zip(pats).zipWithIndex.foreach { case ((got, want), k) =>
        assert(got.w == want.w && got.h == want.h)
        assert(got.bits.toSeq == want.bits.toSeq, s"template $template pattern $k")
      }
    }
    val mmr = Jbig2Synth.encodePatternDictData(pats, mmr = true)
    val out = Jbig2.decodePatternDict(mmr, 0, mmr.length)
    assert(out.isDefined)
    out.get.zip(pats).foreach { case (got, want) =>
      assert(got.bits.toSeq == want.bits.toSeq)
    }
  }

  private def expectedPage(w: Int, h: Int, gray: Array[Int], hgw: Int, hgh: Int,
      hgx: Int, hgy: Int, hrx: Int, hry: Int): Array[Byte] = {
    val page = new Array[Byte](w * h)
    for (mg <- 0 until hgh; ng <- 0 until hgw) {
      val pat = pats(gray(mg * hgw + ng))
      val x = (hgx + mg * hry + ng * hrx) >> 8
      val y = (hgy + mg * hrx - ng * hry) >> 8
      for (yy <- 0 until pat.h; xx <- 0 until pat.w) {
        val px = x + xx
        val py = y + yy
        if (px >= 0 && px < w && py >= 0 && py < h && pat.bits(yy * pat.w + xx) != 0)
          page(py * w + px) = 1
      }
    }
    page
  }

  test("halftone region: axis-aligned grid decodes the full pipeline") {
    val (w, h) = (36, 30)
    val (hgw, hgh) = (6, 5)
    // deterministic gray values over all 4 levels (2 bitplanes)
    val gray = Array.tabulate(hgw * hgh)(i => (i * 7 + i / hgw) % 4)
    for (template <- Seq(0, 2)) {
      val stream = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, hgw, hgh,
        template = template)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"template $template")
      // axis-aligned: HRX defaults to patW<<8 → x = 6·ng, y = 6·mg
      val expected = expectedPage(w, h, gray, hgw, hgh, 0, 0, 6 << 8, 0)
      assert(out.get.toSeq == expected.toSeq, s"template $template")
    }
  }

  test("halftone region: rotated grid and 3-bitplane gray levels") {
    val (w, h) = (48, 40)
    val (hgw, hgh) = (5, 4)
    // rotated: HRX = 6<<8, HRY = 1<<8 → x = mg + 6·ng + 2, y = 6·mg − ng + 8
    // (ng grid vector (6, −1), mg vector (1, 6) — hand-check: cell (mg=1,
    // ng=2) lands at x = (512 + 1·256 + 2·1536)>>8 = 15, y = (2048 + 1536 −
    // 512)>>8 = 12)
    val gray = Array.tabulate(hgw * hgh)(i => i % 4)
    val stream = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, hgw, hgh,
      hgx = 2 << 8, hgy = 8 << 8, hrx = 6 << 8, hry = 1 << 8)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = expectedPage(w, h, gray, hgw, hgh, 2 << 8, 8 << 8, 6 << 8, 1 << 8)
    assert(out.get.toSeq == expected.toSeq)
    assert(((2 << 8) + 1 * (1 << 8) + 2 * (6 << 8)) >> 8 == 15)
    assert(((8 << 8) + 1 * (6 << 8) - 2 * (1 << 8)) >> 8 == 12)
    // five gray levels → 3 bitplanes
    val pats5 = pats :+ Jbig2Synth.glyph(Seq("#.#.#.", ".#.#.#", "#.#.#.",
      ".#.#.#", "#.#.#.", ".#.#.#"))
    val gray5 = Array.tabulate(hgw * hgh)(i => i % 5)
    val s5 = Jbig2Synth.embeddedHalftoneStream(w, h, pats5, gray5, hgw, hgh)
    val o5 = Jbig2.decodeEmbedded(s5, w, h)
    assert(o5.isDefined)
    var black = 0
    o5.get.foreach(b => black += b)
    assert(black > 0)
  }

  test("MMR grayscale: all bitplanes from one continuous G4 stream") {
    val (w, h) = (36, 30)
    val (hgw, hgh) = (6, 5)
    val gray = Array.tabulate(hgw * hgh)(i => (i * 7 + i / hgw) % 4)
    val stream = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, hgw, hgh,
      mmrGray = true)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = expectedPage(w, h, gray, hgw, hgh, 0, 0, 6 << 8, 0)
    assert(out.get.toSeq == expected.toSeq)
    // 3-bitplane (5-level) MMR grayscale — the plane boundary rows chain
    // through the G4 2D references, pinning the continuous-stream reading
    val pats5 = pats :+ Jbig2Synth.glyph(Seq("#.#.#.", ".#.#.#", "#.#.#.",
      ".#.#.#", "#.#.#.", ".#.#.#"))
    val gray5 = Array.tabulate(hgw * hgh)(i => i % 5)
    val s5 = Jbig2Synth.embeddedHalftoneStream(w, h, pats5, gray5, hgw, hgh,
      mmrGray = true)
    val o5 = Jbig2.decodeEmbedded(s5, w, h)
    assert(o5.isDefined)
    val arith5 = Jbig2.decodeEmbedded(Jbig2Synth.embeddedHalftoneStream(
      w, h, pats5, gray5, hgw, hgh), w, h)
    assert(o5.get.toSeq == arith5.get.toSeq, "MMR and arithmetic lanes agree")
  }

  test("HENABLESKIP: out-of-region grid cells decode nothing") {
    // a 7×6 grid over a 36×30 region with the grid origin pulled up-left:
    // the first row/column of cells lands wholly outside → skipped
    val (w, h) = (36, 30)
    val (hgw, hgh) = (7, 6)
    val (hgx, hgy) = (-6 << 8, -6 << 8)
    val gray = Array.tabulate(hgw * hgh) { i =>
      val (mg, ng) = (i / hgw, i % hgw)
      val x = (hgx + mg * 0 + ng * (6 << 8)) >> 8
      val y = (hgy + mg * (6 << 8) - ng * 0) >> 8
      if (x + 6 <= 0 || x >= w || y + 6 <= 0 || y >= h) 0 else (i * 5 + 1) % 4
    }
    val stream = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, hgw, hgh,
      hgx = hgx, hgy = hgy, enableSkip = true)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = expectedPage(w, h, gray, hgw, hgh, hgx, hgy, 6 << 8, 0)
    assert(out.get.toSeq == expected.toSeq)
    // the skip-encoded stream must be shorter than the plain encoding of
    // the same grid — proof pixels were actually skipped, not just zeroed
    val plain = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, hgw, hgh,
      hgx = hgx, hgy = hgy)
    assert(stream.length < plain.length, "skip must save coded decisions")
    assert(Jbig2.decodeEmbedded(plain, w, h).get.toSeq == expected.toSeq)
  }

  test("single-pattern grids carry zero bitplanes on both lanes") {
    // one pattern → ceil(log2(1)) = 0 planes: nothing to decode, the grid
    // stamps pattern 0 everywhere (both the arithmetic and MMR flag paths)
    val (w, h) = (24, 12)
    val one = Seq(pats(2))
    val gray = Array.fill(6 * 3)(0)
    // expectedPage resolves ids against the 4-entry spec fixture, where
    // index 2 is the same bitmap as one(0)
    val expected = expectedPage(w, h, Array.fill(6 * 3)(2), 6, 3, 0, 0, 6 << 8, 0)
    for (mmr <- Seq(false, true)) {
      val stream = Jbig2Synth.embeddedHalftoneStream(w, h, one, gray, 6, 3,
        mmrGray = mmr)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"mmr=$mmr")
      assert(out.get.toSeq == expected.toSeq, s"mmr=$mmr")
    }
  }

  test("degrades, never throws: truncation, mutation") {
    val (w, h) = (36, 30)
    val gray = Array.tabulate(30)(_ % 4)
    val good = Jbig2Synth.embeddedHalftoneStream(w, h, pats, gray, 6, 5)
    assert(Jbig2.decodeEmbedded(good, w, h).isDefined)
    for (cut <- Seq(0, 15, good.length / 2, good.length - 2)) {
      val r = Jbig2.decodeEmbedded(good.take(cut), w, h)
      assert(r.isEmpty || r.get.length == w * h)
    }
    val rnd = new scala.util.Random(11)
    (0 until 60).foreach { k =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jbig2.decodeEmbedded(b, w, h)
      assert(r.isEmpty || r.get.length == w * h, s"mutation $k")
    }
  }
}
