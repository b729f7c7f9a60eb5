package graft.pdf

import graft.testgen.Jbig2Synth
import org.scalatest.funsuite.AnyFunSuite

/** Refinement coding (T.88 6.3): REFAGG symbol dictionaries (single-instance
  * refinement of input/new symbols) and per-instance text-region refinement.
  * Offsets follow the spec sign (reference pixel at x−dx, y−dy); zero-offset
  * streams coincide with the vendored decoder's convention and are the node
  * cross-validation vehicle. */
class Jbig2RefineSpec extends AnyFunSuite {

  private val gA = Jbig2Synth.glyph(Seq(".##.", "#..#", "####", "#..#", "#..#"))
  private val gB = Jbig2Synth.glyph(Seq("###.", "#..#", "###.", "#..#", "###."))
  private def flip(g: Jbig2.Bitmap, x: Int, y: Int): Jbig2.Bitmap = {
    val b = g.bits.clone()
    b(y * g.w + x) = (1 - b(y * g.w + x)).toByte
    Jbig2.Bitmap(g.w, g.h, b)
  }

  /** Cross-validation artifacts are written only when explicitly requested
    * (out-of-band node runs), never as a permanent test side effect. */
  private def dump(tag: String, stream: Array[Byte], bmp: Array[Byte]): Unit =
    if (sys.env.contains("GRAFT_DUMP_JBIG2")) {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/jb_$tag.bin"), stream)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/jb_${tag}bmp.bin"), bmp)
    }

  private def pageSeg(w: Int, h: Int): Array[Byte] =
    Jbig2Synth.segment(0, 48, Nil,
      java.nio.ByteBuffer.allocate(19).putInt(w).putInt(h).putInt(0).putInt(0)
        .put(0.toByte).putShort(0.toShort).array())

  test("REFAGG dictionary: new symbols refine dictionary inputs, round-trip") {
    val (w, h) = (32, 16)
    val aP = flip(gA, 1, 1)
    val bP = flip(gB, 2, 3)
    val dict1 = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA, gB)))
    val dict2 = Jbig2Synth.segment(2, 0, Seq(1),
      Jbig2Synth.encodeRefAggDictData(Seq(gA, gB), Seq((aP, 0, 0, 0), (bP, 1, 0, 0))))
    // text region sees dict1 ++ dict2 exports: A, B, A', B'
    val instances = Seq((0, 1, 2), (1, 7, 2), (2, 13, 2), (3, 19, 2))
    val text = Jbig2Synth.segment(3, 6, Seq(1, 2),
      Jbig2Synth.encodeTextRegionData(w, h, Seq(gA, gB, aP, bP), instances))
    val stream = pageSeg(w, h) ++ dict1 ++ dict2 ++ text
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    val glyphs = Seq(gA, gB, aP, bP)
    instances.foreach { case (id, x, y) =>
      val g = glyphs(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0) expected((y + yy) * w + (x + xx)) = 1
    }
    assert(out.get.toSeq == expected.toSeq)
    dump("refagg", stream, out.get)
  }

  test("REFAGG with nonzero displacement round-trips (spec sign convention)") {
    // refine gA against itself displaced by (rdx=1, rdy=-1): the reference
    // pixel for (x, y) is (x-1, y+1) per the spec sign — encoder and decoder
    // share it, so the round-trip pins the convention end-to-end
    val (w, h) = (16, 10)
    val target = flip(gA, 3, 4)
    val dict1 = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA)))
    val dict2 = Jbig2Synth.segment(2, 0, Seq(1),
      Jbig2Synth.encodeRefAggDictData(Seq(gA), Seq((target, 0, 1, -1))))
    // text sees gA (dict1) then target (dict2): draw the refined one
    val text = Jbig2Synth.segment(3, 6, Seq(1, 2),
      Jbig2Synth.encodeTextRegionData(w, h, Seq(gA, target), Seq((1, 2, 2))))
    val out = Jbig2.decodeEmbedded(pageSeg(w, h) ++ dict1 ++ dict2 ++ text, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    for (yy <- 0 until target.h; xx <- 0 until target.w)
      if (target.bits(yy * target.w + xx) != 0) expected((2 + yy) * w + (2 + xx)) = 1
    assert(out.get.toSeq == expected.toSeq)
  }

  test("text region per-instance refinement round-trips") {
    val (w, h) = (24, 10)
    val aP = flip(gA, 2, 2)
    val dict = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA)))
    val text = Jbig2Synth.segment(2, 6, Seq(1),
      Jbig2Synth.encodeTextRegionRefineData(w, h, Seq(gA),
        Seq((0, 1, 2, None), (0, 8, 2, Some(aP)), (0, 15, 2, None))))
    val stream = pageSeg(w, h) ++ dict ++ text
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    Seq((gA, 1, 2), (aP, 8, 2), (gA, 15, 2)).foreach { case (g, x, y) =>
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0) expected((y + yy) * w + (x + xx)) = 1
    }
    assert(out.get.toSeq == expected.toSeq)
    dump("refine", stream, out.get)
  }

  test("refinement template 1 round-trips (dictionary and text paths)") {
    // the 10-bit template-1 context and the rAt-absent header layout
    val (w, h) = (20, 10)
    val aP = flip(gA, 1, 3)
    val dict1 = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA)))
    val dict2 = Jbig2Synth.segment(2, 0, Seq(1),
      Jbig2Synth.encodeRefAggDictData(Seq(gA), Seq((aP, 0, 0, 0)), rTemplate = 1))
    val text = Jbig2Synth.segment(3, 6, Seq(1, 2),
      Jbig2Synth.encodeTextRegionData(w, h, Seq(gA, aP), Seq((1, 2, 2))))
    val out = Jbig2.decodeEmbedded(pageSeg(w, h) ++ dict1 ++ dict2 ++ text, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    for (yy <- 0 until aP.h; xx <- 0 until aP.w)
      if (aP.bits(yy * aP.w + xx) != 0) expected((2 + yy) * w + (2 + xx)) = 1
    assert(out.get.toSeq == expected.toSeq)
    // text-path template 1
    val dictT = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gB)))
    val bP = flip(gB, 0, 1)
    val textT = Jbig2Synth.segment(2, 6, Seq(1),
      Jbig2Synth.encodeTextRegionRefineData(w, h, Seq(gB),
        Seq((0, 3, 1, Some(bP))), rTemplate = 1))
    val outT = Jbig2.decodeEmbedded(pageSeg(w, h) ++ dictT ++ textT, w, h)
    assert(outT.isDefined)
    val expT = new Array[Byte](w * h)
    for (yy <- 0 until bP.h; xx <- 0 until bP.w)
      if (bP.bits(yy * bP.w + xx) != 0) expT((1 + yy) * w + (3 + xx)) = 1
    assert(outT.get.toSeq == expT.toSeq)
  }

  test("multi-instance aggregate symbol (IAAI > 1) round-trips") {
    // composite symbol "AB" built from two instances of the input glyphs,
    // decoded as an inner text region of the dictionary stream (6.5.8.2.1)
    val (aggW, aggH) = (10, 5)
    val aggInstances = Seq((0, 0, 0), (1, 5, 0))
    val dict1 = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA, gB)))
    val dict2 = Jbig2Synth.segment(2, 0, Seq(1),
      Jbig2Synth.encodeAggDictData(Seq(gA, gB), aggW, aggH, aggInstances))
    // expected composite
    val comp = new Array[Byte](aggW * aggH)
    aggInstances.foreach { case (id, x, y) =>
      val g = Seq(gA, gB)(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0) comp((y + yy) * aggW + (x + xx)) = 1
    }
    // text region draws the composite (id 2 after dict1's A, B)
    val (w, h) = (20, 9)
    val text = Jbig2Synth.segment(3, 6, Seq(1, 2),
      Jbig2Synth.encodeTextRegionData(w, h,
        Seq(gA, gB, Jbig2.Bitmap(aggW, aggH, comp)), Seq((2, 3, 2))))
    val stream = pageSeg(w, h) ++ dict1 ++ dict2 ++ text
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    for (yy <- 0 until aggH; xx <- 0 until aggW)
      if (comp(yy * aggW + xx) != 0) expected((2 + yy) * w + (3 + xx)) = 1
    assert(out.get.toSeq == expected.toSeq)
    dump("agg", stream, out.get)
  }

  test("MIXED dictionary: refinement then aggregation share adaptive contexts") {
    // one dictionary whose first new symbol is a single-instance refinement
    // and whose second is a multi-instance aggregate — the two paths MUST
    // share IAID/IARDX/IARDY/GR statistics (T.88 6.5.8; a split context set
    // desynchronizes exactly here)
    val aP = flip(gA, 1, 1)
    val (aggW, aggH) = (10, 5)
    val aggInstances = Seq((0, 0, 0), (1, 5, 0))
    val dict1 = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA, gB)))
    val dict2 = Jbig2Synth.segment(2, 0, Seq(1),
      Jbig2Synth.encodeMixedDictData(Seq(gA, gB), Seq(
        Jbig2Synth.RefineOne(aP, 0, 0, 0),
        Jbig2Synth.AggSym(aggW, aggH, aggInstances))))
    val comp = new Array[Byte](aggW * aggH)
    aggInstances.foreach { case (id, x, y) =>
      val g = Seq(gA, gB)(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0) comp((y + yy) * aggW + (x + xx)) = 1
    }
    // exports: aP (id 2 after dict1's A, B), composite (id 3)
    val (w, h) = (24, 14)
    val text = Jbig2Synth.segment(3, 6, Seq(1, 2),
      Jbig2Synth.encodeTextRegionData(w, h,
        Seq(gA, gB, aP, Jbig2.Bitmap(aggW, aggH, comp)),
        Seq((2, 1, 1), (3, 8, 7))))
    val stream = pageSeg(w, h) ++ dict1 ++ dict2 ++ text
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    Seq((aP, 1, 1), (Jbig2.Bitmap(aggW, aggH, comp), 8, 7)).foreach { case (g, x, y) =>
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0) expected((y + yy) * w + (x + xx)) = 1
    }
    assert(out.get.toSeq == expected.toSeq)
    dump("mixed", stream, out.get)
  }

  test("refinement with size delta (rdw/rdh) round-trips") {
    val (w, h) = (20, 12)
    // refined instance is one column wider than the dictionary glyph
    val wide = Jbig2.Bitmap(gA.w + 1, gA.h,
      Array.tabulate[Byte]((gA.w + 1) * gA.h) { i =>
        val y = i / (gA.w + 1); val x = i % (gA.w + 1)
        if (x < gA.w) gA.bits(y * gA.w + x) else (if (y % 2 == 0) 1 else 0)
      })
    val dict = Jbig2Synth.segment(1, 0, Nil, Jbig2Synth.encodeSymbolDictData(Seq(gA)))
    val text = Jbig2Synth.segment(2, 6, Seq(1),
      Jbig2Synth.encodeTextRegionRefineData(w, h, Seq(gA), Seq((0, 2, 3, Some(wide)))))
    val out = Jbig2.decodeEmbedded(pageSeg(w, h) ++ dict ++ text, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    for (yy <- 0 until wide.h; xx <- 0 until wide.w)
      if (wide.bits(yy * wide.w + xx) != 0) expected((3 + yy) * w + (2 + xx)) = 1
    assert(out.get.toSeq == expected.toSeq)
  }

  test("standalone refinement region segments refine the page (REPLACE), with TPGRON") {
    // base page drawn by a generic region, then a type-42 refinement region
    // flips a handful of pixels — incl. pixels that go black→WHITE, which
    // only REPLACE composition can express. TPGRON rows: most of the
    // refined bitmap equals the base (uniform reference neighborhoods →
    // predicted, skipped by the decoder), so typical prediction is
    // genuinely exercised; the SLTP context is DERIVED from the template
    // point order (refSltpContext), not carried as a constant.
    for ((w, h, seed) <- Seq((40, 28, 3L), (33, 21, 8L)); rT <- Seq(0, 1);
         tpgron <- Seq(false, true)) {
      val base = Jbig2Synth.testBitmap(w, h, seed)
      val refined = base.clone()
      // flip a scattered set both ways
      var k = 0
      while (k < 12) {
        val i = (k * 97 + 13) % (w * h)
        refined(i) = (1 - refined(i)).toByte
        k += 1
      }
      val stream = Jbig2Synth.embeddedRefineStream(base, refined, w, h,
        rTemplate = rT, tpgron = tpgron)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"$w x $h rT=$rT tpgron=$tpgron")
      assert(out.get.toSeq == refined.toSeq, s"$w x $h rT=$rT tpgron=$tpgron")
    }
    // sanity on the derived SLTP contexts: exactly one bit set, at the
    // reference-center position of each template's context layout
    assert(Jbig2.refSltpContext(0) == 0x20)
    assert(Jbig2.refSltpContext(1) == 0x8)
  }
}
