package graft.pdf

import graft.testgen.Jbig2Synth
import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 generic-region lane: MQ coder pair consistency, bitmap round-trips
  * across templates and shapes, embedded segment parsing, corrupt-stream
  * robustness.
  *
  * Interop evidence (run once, out-of-band — node + the reference's vendored
  * decoder): `Jbig2Synth.embeddedStream` output for templates 0-3 and TPGDON,
  * `Jbig2Synth.embeddedTextStream` symbol-coded output at the TOP-LEFT
  * reference corner, and the refinement streams (REFAGG dictionary +
  * per-instance text refinement, zero displacement) from Jbig2RefineSpec,
  * were fed to the reference's OWN independent JBIG2
  * implementation (pdf.combined.js Jbig2Image.parseChunks, lines 9603-10685)
  * — 0 mismatched pixels on every such stream. Bottom/right corners follow
  * T.88 6.4.5 exactly (round 5): the S axis is corner-invariant — right
  * corners pre-advance CURS by W−1 before drawing, so the left edge sits at
  * the incoming CURS — and a bottom corner puts the symbol's bottom row at T
  * (top = T−H+1). The vendored build diverges on BOTH axes for non-top-left
  * corners (offsetT = t−H, offsetS = S−W — known bugs fixed in later
  * upstream pdf.js), so node cross-validation covers top-left only; the
  * other corners are gated by the hand-coded from-spec placement test
  * below. That pins this codec pair's bit
  * conventions (context order, MQ procedures, segment headers) to the
  * interchange behavior of a conformant third-party decoder, not just to
  * internal round-trip consistency. */
class Jbig2Spec extends AnyFunSuite {

  test("MQ coder round-trips arbitrary bit/context sequences") {
    // deterministic pseudo-random bits + contexts: the strongest internal
    // consistency gate for the coder pair (every state transition exercised)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 2000 + trial * 500
      val bits = Array.fill(n)(if (rnd.nextInt(10) < (trial + 1) * 2) 1 else 0)
      val ctxs = Array.fill(n)(rnd.nextInt(512))
      val enc = new Jbig2Synth.MqEncoder
      val cxE = new Array[Int](512)
      var i = 0
      while (i < n) { enc.encode(cxE, ctxs(i), bits(i)); i += 1 }
      val stream = enc.flush()
      val dec = new Jbig2.MqDecoder(stream, 0, stream.length)
      val cxD = new Array[Int](512)
      i = 0
      while (i < n) {
        assert(dec.decode(cxD, ctxs(i)) == bits(i), s"trial $trial bit $i")
        i += 1
      }
    }
  }

  test("generic region round-trips across all four templates") {
    for (template <- 0 to 3) {
      val (w, h) = (61, 37) // non-byte-aligned on purpose
      val bmp = Jbig2Synth.testBitmap(w, h, seed = 7 + template)
      val mq = Jbig2Synth.encodeGenericRegion(bmp, w, h, template)
      val back = Jbig2.decodeGenericRegion(mq, 0, mq.length, w, h, template,
        Jbig2Synth.nominalAt(template), tpgdon = false)
      assert(back.toSeq == bmp.toSeq, s"template $template")
      assert(mq.length < w * h / 4, s"template $template: compression happened (${mq.length})")
    }
  }

  test("degenerate bitmaps: all-white, all-black, single column/row") {
    for ((w, h, fill) <- Seq((64, 64, 0), (64, 64, 1), (1, 40, 1), (40, 1, 0))) {
      val bmp = Array.fill[Byte](w * h)(fill.toByte)
      val mq = Jbig2Synth.encodeGenericRegion(bmp, w, h, 0)
      val back = Jbig2.decodeGenericRegion(mq, 0, mq.length, w, h, 0,
        Jbig2Synth.nominalAt(0), tpgdon = false)
      assert(back.toSeq == bmp.toSeq, s"$w x $h fill=$fill")
    }
  }

  test("TPGDON typical prediction round-trips banded bitmaps") {
    val (w, h) = (40, 30)
    // horizontal bands: most rows equal their predecessor → typical rows
    val bmp = Array.tabulate[Byte](w * h)(i => if ((i / w / 5) % 2 == 0) 1 else 0)
    val plain = Jbig2Synth.encodeGenericRegion(bmp, w, h, 0, tpgdon = false)
    val typ = Jbig2Synth.encodeGenericRegion(bmp, w, h, 0, tpgdon = true)
    val back = Jbig2.decodeGenericRegion(typ, 0, typ.length, w, h, 0,
      Jbig2Synth.nominalAt(0), tpgdon = true)
    assert(back.toSeq == bmp.toSeq)
    assert(typ.length <= plain.length) // typical rows compress better
    // the embedded path carries the TPGDON flag through the segment header
    val stream = Jbig2Synth.embeddedStream(bmp, w, h, 0, tpgdon = true)
    assert(Jbig2.decodeEmbedded(stream, w, h).get.toSeq == bmp.toSeq)
    // mixed content with repeated rows, all templates
    for (template <- 0 to 3) {
      val b2 = Jbig2Synth.testBitmap(w, h, 9).clone()
      var y = 10
      while (y < 20) { // plant a repeated-row band
        System.arraycopy(b2, 9 * w, b2, y * w, w)
        y += 1
      }
      val e = Jbig2Synth.encodeGenericRegion(b2, w, h, template, tpgdon = true)
      val d = Jbig2.decodeGenericRegion(e, 0, e.length, w, h, template,
        Jbig2Synth.nominalAt(template), tpgdon = true)
      assert(d.toSeq == b2.toSeq, s"template $template")
    }
  }

  test("embedded segment stream decodes to the page bitmap") {
    val (w, h) = (48, 32)
    val bmp = Jbig2Synth.testBitmap(w, h, seed = 3)
    val stream = Jbig2Synth.embeddedStream(bmp, w, h)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    assert(out.get.toSeq == bmp.toSeq)
  }

  test("synthetic JBIG2 PDF decodes through the full raster lane") {
    val pdf = Jbig2Synth.pdfWithJbig2(64, 48, seed = 5)
    val doc = PdfDocument.open(pdf)
    val imgs = PdfImages.list(doc)
    assert(imgs.length == 1)
    val i = imgs.head
    assert((i.name, i.width, i.height, i.bpc, i.colorSpace, i.filter) ==
      (("ImJ", 64, 48, 1, "DeviceGray", "JBIG2Decode")))
    assert((i.decodedW, i.decodedH) == ((64, 48)))
    // pin the decoded content: mean gray over the full tap grid must match
    // the source bitmap's white fraction exactly
    val bmp = Jbig2Synth.testBitmap(64, 48, seed = 5)
    val white = bmp.count(_ == 0)
    val expected = math.round(255.0 * white / bmp.length).toInt
    info(s"grayMean=${i.grayMean} expected=$expected")
    assert(i.grayMean == expected)
  }

  test("symbol-coded text region round-trips (dictionary + placement)") {
    val glyphs = Seq(
      Jbig2Synth.glyph(Seq(
        ".##.",
        "#..#",
        "####",
        "#..#",
        "#..#")),
      Jbig2Synth.glyph(Seq(
        "###.",
        "#..#",
        "###.",
        "#..#",
        "###.")),
      Jbig2Synth.glyph(Seq(
        ".####.",
        "#....#",
        "#.....",
        "#.....",
        "#....#",
        ".####.",
        "......")))
    val (w, h) = (40, 24)
    // two "text lines" incl. a repeated glyph and the taller C
    val instances = Seq((0, 2, 3), (1, 8, 3), (0, 14, 3), (2, 20, 2), (1, 4, 12), (2, 12, 11))
    val expected = new Array[Byte](w * h)
    instances.foreach { case (id, x, y) =>
      val g = glyphs(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0 && y + yy < h && x + xx < w)
          expected((y + yy) * w + (x + xx)) = 1
    }
    for (refCorner <- Seq(1, 0, 3)) { // top-left, bottom-left, top-right
      val stream = Jbig2Synth.embeddedTextStream(w, h, glyphs, instances, refCorner)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"corner $refCorner")
      assert(out.get.toSeq == expected.toSeq, s"corner $refCorner")
    }
  }

  test("MMR (T.6) generic region round-trips via the JDK fax codec") {
    // the reference's decoder ERRORS on MMR — this lane exceeds it
    for ((w, h, seed) <- Seq((61, 37, 4L), (64, 48, 9L), (33, 17, 2L))) {
      val bmp = Jbig2Synth.testBitmap(w, h, seed)
      val stream = Jbig2Synth.embeddedMmrStream(bmp, w, h)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"$w x $h seed=$seed")
      assert(out.get.toSeq == bmp.toSeq, s"$w x $h seed=$seed")
    }
    // corrupt MMR payload never throws
    val good = Jbig2Synth.embeddedMmrStream(Jbig2Synth.testBitmap(32, 16, 1), 32, 16)
    val rnd = new scala.util.Random(3)
    (0 until 30).foreach { k =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jbig2.decodeEmbedded(b, 32, 16)
      assert(r.isEmpty || r.get.length == 32 * 16, s"mutation $k")
    }
  }

  test("symbol-coded stream survives truncation/mutation without throwing") {
    val glyphs = Seq(Jbig2Synth.glyph(Seq("##", "##")))
    val stream = Jbig2Synth.embeddedTextStream(16, 8, glyphs, Seq((0, 1, 1), (0, 6, 3)))
    for (cut <- Seq(0, 5, stream.length / 2, stream.length - 2)) {
      val r = Jbig2.decodeEmbedded(stream.take(cut), 16, 8)
      assert(r.isEmpty || r.get.length == 16 * 8)
    }
    val rnd = new scala.util.Random(5)
    (0 until 40).foreach { k =>
      val b = stream.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jbig2.decodeEmbedded(b, 16, 8)
      assert(r.isEmpty || r.get.length == 16 * 8, s"mutation $k")
    }
  }

  test("pdfWithJbig2 is binary-safe for arbitrary seeds and dims (stripMargin regression)") {
    // the PDF wrapper must never route the arithmetic-coded bytes through
    // string templating — a "newline, low bytes, |" sequence in the stream
    // would be eaten by stripMargin, corrupting the stream and the /Length
    for ((w, h, seed) <- Seq((64, 48, 5L), (61, 37, 11L), (80, 40, 123L), (33, 57, 999L))) {
      val doc = PdfDocument.open(Jbig2Synth.pdfWithJbig2(w, h, seed))
      val imgs = PdfImages.list(doc)
      assert(imgs.length == 1, s"seed=$seed")
      assert((imgs.head.decodedW, imgs.head.decodedH) == ((w, h)), s"seed=$seed")
      val bmp = Jbig2Synth.testBitmap(w, h, seed)
      val expected = math.round(255.0 * bmp.count(_ == 0) / bmp.length).toInt
      assert(imgs.head.grayMean == expected, s"seed=$seed") // decoded CONTENT pinned
    }
  }

  test("symbol-coded JBIG2 PDF decodes through the full raster lane") {
    val (w, h) = (40, 24)
    val doc = PdfDocument.open(Jbig2Synth.pdfWithJbig2(w, h, seed = 0, symbolCoded = true))
    val imgs = PdfImages.list(doc)
    assert(imgs.length == 1)
    assert((imgs.head.decodedW, imgs.head.decodedH) == ((w, h)))
    val expected = Jbig2.decodeEmbedded(Jbig2Synth.textStream(w, h), w, h).get
    val white = expected.count(_ == 0)
    val mean = math.round(255.0 * white / expected.length).toInt
    info(s"grayMean=${imgs.head.grayMean} expected=$mean")
    assert(imgs.head.grayMean == mean)
  }

  test("JBIG2Globals split PDF decodes identically through the raster lane") {
    // same page, dictionary moved to a /DecodeParms /JBIG2Globals stream —
    // the full PdfImages path must resolve and pre-walk it
    val (w, h) = (40, 24)
    val doc = PdfDocument.open(Jbig2Synth.pdfWithJbig2(w, h, seed = 0, globalsSplit = true))
    val imgs = PdfImages.list(doc)
    assert(imgs.length == 1)
    assert((imgs.head.decodedW, imgs.head.decodedH) == ((w, h)))
    val expected = Jbig2.decodeEmbedded(Jbig2Synth.textStream(w, h), w, h).get
    val white = expected.count(_ == 0)
    val mean = math.round(255.0 * white / expected.length).toInt
    assert(imgs.head.grayMean == mean)
  }

  test("corrupt / truncated / foreign streams never throw") {
    val (w, h) = (32, 32)
    val good = Jbig2Synth.embeddedStream(Jbig2Synth.testBitmap(w, h, 1), w, h)
    for (cut <- Seq(0, 3, 10, good.length / 2, good.length - 1)) {
      val res = Jbig2.decodeEmbedded(good.take(cut), w, h) // must not throw
      assert(res.isEmpty || res.get.length == w * h)
    }
    val garbage = Array.tabulate[Byte](200)(i => (i * 37).toByte)
    assert(Jbig2.decodeEmbedded(garbage, w, h).isEmpty ||
      Jbig2.decodeEmbedded(garbage, w, h).get.length == w * h)
    // flipped bytes inside the MQ data: decoder still terminates with a
    // full-size (wrong-content) bitmap — never-fail discipline
    val bent = good.clone()
    bent(good.length - 5) = (bent(good.length - 5) ^ 0x55).toByte
    val r = Jbig2.decodeEmbedded(bent, w, h)
    assert(r.isEmpty || r.get.length == w * h)
  }

  test("reference corners place per T.88 6.4.5: the S axis is corner-invariant") {
    // hand-coded integer stream (bypasses the fixture encoder's placement
    // math): one 4x3 glyph at strip T, first S = 5. Per spec steps 3c(viii)/
    // (x)/(xi) right corners pre-advance CURS by W-1 before drawing, so the
    // LEFT edge sits at the incoming CURS for EVERY corner; only the T axis
    // moves (bottom corners put the bottom row at T).
    val g = Jbig2Synth.glyph(Seq("####", "#..#", "####"))
    val symCodeLen = Jbig2.ceilLog2(1)
    // (refCorner, encoded t, expected top row)
    for ((refCorner, t, topRow) <- Seq((1, 2, 2), (3, 2, 2), (0, 4, 2), (2, 4, 2))) {
      val enc = new Jbig2Synth.MqEncoder
      val iadt = new Array[Int](512); val iafs = new Array[Int](512)
      val iads = new Array[Int](512)
      val iaid = new Array[Int](1 << (symCodeLen + 1))
      Jbig2Synth.encodeInt(enc, iadt, Some(0)) // STRIPT init
      Jbig2Synth.encodeInt(enc, iadt, Some(t)) // strip T
      Jbig2Synth.encodeInt(enc, iafs, Some(5)) // first S
      Jbig2Synth.encodeIaid(enc, iaid, symCodeLen, 0)
      Jbig2Synth.encodeInt(enc, iads, None) // OOB ends the strip
      val mq = enc.flush()
      val buf = java.nio.ByteBuffer.allocate(17 + 2 + 4 + mq.length)
      buf.putInt(12).putInt(10).putInt(0).putInt(0).put(0.toByte)
      buf.putShort(((refCorner & 3) << 4).toShort).putInt(1).put(mq)
      val data = buf.array()
      val out = Jbig2.decodeTextRegion(data, 0, data.length, Vector(g))
      assert(out.isDefined, s"corner $refCorner")
      val (rw, _, _, _, bmp) = out.get
      val expected = new Array[Byte](12 * 10)
      for (yy <- 0 until 3; xx <- 0 until 4)
        if (g.bits(yy * 4 + xx) != 0) expected((topRow + yy) * rw + 5 + xx) = 1
      assert(bmp.toSeq == expected.toSeq, s"corner $refCorner")
    }
  }

  test("SBCOMBOP XOR composites overlapping instances by exclusive-or") {
    val box = Jbig2Synth.glyph(Seq("####", "####", "####"))
    val (w, h) = (16, 8)
    // two overlapping instances: the 2-column overlap cancels under XOR
    val instances = Seq((0, 2, 2), (0, 4, 2))
    val stream = Jbig2Synth.embeddedTextStream(w, h, Seq(box), instances, combOp = 2)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    val expected = new Array[Byte](w * h)
    instances.foreach { case (_, x, y) =>
      for (yy <- 0 until 3; xx <- 0 until 4)
        expected((y + yy) * w + (x + xx)) = (expected((y + yy) * w + (x + xx)) ^ 1).toByte
    }
    assert(out.get.toSeq == expected.toSeq)
    // AND / XNOR streams stay unsupported -> nothing composes
    val and = Jbig2Synth.embeddedTextStream(w, h, Seq(box), instances, combOp = 1)
    assert(Jbig2.decodeEmbedded(and, w, h).isEmpty)
  }

  test("JBIG2Globals chunk: dictionaries in globals are visible to the page") {
    val (w, h) = (40, 24)
    val whole = Jbig2.decodeEmbedded(Jbig2Synth.textStream(w, h), w, h)
    val (globals, pageData) = Jbig2Synth.textStreamWithGlobals(w, h)
    val split = Jbig2.decodeEmbedded(pageData, w, h, Some(globals))
    assert(whole.isDefined && split.isDefined)
    assert(split.get.toSeq == whole.get.toSeq)
    // without the globals chunk the text region has no symbols -> no decode
    assert(Jbig2.decodeEmbedded(pageData, w, h).isEmpty)
  }

  test("a positive-dy AT pixel never reads past the bitmap bottom") {
    // a signalled AT offset may point BELOW the current row (legal signed
    // byte); near the bottom rows the fetch must read 0, not throw
    val rnd = new scala.util.Random(7)
    val data = Array.fill(64)(rnd.nextInt(256).toByte)
    for (template <- 0 to 3) {
      val at = Array.fill(Jbig2.atCount(template))((1, 2))
      val bmp = Jbig2.decodeGenericRegion(data, 0, data.length, 16, 12,
        template, at, tpgdon = false)
      assert(bmp.length == 16 * 12)
    }
  }
}
