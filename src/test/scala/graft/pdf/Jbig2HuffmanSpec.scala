package graft.pdf

import graft.testgen.Jbig2Synth
import org.scalatest.funsuite.AnyFunSuite

/** JBIG2 huffman coding (T.88 Annex B + the SDHUFF/SBHUFF paths) — the mode
  * the reference's vendored decoder has no branch for at all.
  *
  * No in-sandbox source carries the Annex B constants, so the standard
  * tables B.1–B.5 are gated STRUCTURALLY: each must be a Kraft-complete
  * prefix code (sum 2^-len == 1 — any transcription slip in a prefix length
  * breaks this), its normal lines must tile a contiguous value range, and
  * its assigned codes must be prefix-free. Decode behavior is then pinned
  * bit-for-bit on hand-computed sequences, and the full huffman
  * symbol-dictionary + text-region pipeline round-trips through the
  * encoder-side fixtures (uncompressed and MMR collective bitmaps, custom
  * FS/DS/DT table segments, the 35-runcode symbol-ID scheme). */
class Jbig2HuffmanSpec extends AnyFunSuite {
  import Jbig2Huffman._

  private val standards = Seq("B1" -> B1, "B2" -> B2, "B3" -> B3, "B4" -> B4, "B5" -> B5)

  test("standard tables B.1-B.5: Kraft-complete, contiguous, prefix-free") {
    standards.foreach { case (name, t) =>
      val kraft = t.lines.filter(_.prefLen > 0)
        .map(l => BigDecimal(1) / BigDecimal(2).pow(l.prefLen)).sum
      assert(kraft == BigDecimal(1), s"$name Kraft sum $kraft")
      // normal lines tile a contiguous range from the lowest value
      val normals = t.lines.filter(l => !l.oob && !l.lower && l.rangeLen < 32)
        .sortBy(_.rangeLow).toSeq
      normals.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.rangeLow + (1L << a.rangeLen) == b.rangeLow,
            s"$name gap after ${a.rangeLow}")
        case _ => ()
      }
      // upper range begins exactly where the normal lines end
      val upper = t.lines.find(l => !l.oob && !l.lower && l.rangeLen == 32).get
      assert(normals.last.rangeLow + (1L << normals.last.rangeLen) == upper.rangeLow, name)
      // lower range (B.3/B.5) begins one below the lowest normal value
      t.lines.find(_.lower).foreach { lo =>
        assert(lo.rangeLow == normals.head.rangeLow - 1, s"$name lower anchor")
      }
      // assigned codes are prefix-free
      val assigned = t.lines.zipWithIndex.collect {
        case (l, i) if l.prefLen > 0 => (l.prefLen, t.codes(i))
      }
      for (Seq((la, ca), (lb, cb)) <- assigned.combinations(2).map(_.toSeq)) {
        val (sl, sc, ll, lc) = if (la <= lb) (la, ca, lb, cb) else (lb, cb, la, ca)
        assert(!(sl == ll && sc == lc), s"$name duplicate code")
        assert((lc >>> (ll - sl)) != sc, s"$name code $sc/$sl prefixes $lc/$ll")
      }
    }
  }

  private def reader(bits: String): Reader = {
    val padded = bits.padTo((bits.length + 7) / 8 * 8, '0')
    val bytes = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    new Reader(bytes, 0, bytes.length)
  }

  test("B.1/B.2/B.4 decode hand-computed bit sequences") {
    // B.1: "0" + 4-bit offset → 0..15; "10" + 8 bits → 16..271
    assert(B1.decode(reader("0" + "0101")) == Value(5))
    assert(B1.decode(reader("10" + "00000011")) == Value(19))
    // B.1 third line: "110" + 16 bits → 272..
    assert(B1.decode(reader("110" + "0000000000000001")) == Value(273))
    // B.2: codes 0,10,110,1110,11110 then 111110 upper, 111111 OOB
    assert(B2.decode(reader("0")) == Value(0))
    assert(B2.decode(reader("110")) == Value(2))
    assert(B2.decode(reader("1110" + "101")) == Value(8))
    assert(B2.decode(reader("11110" + "000001")) == Value(12))
    assert(B2.decode(reader("111111")) == Oob)
    // B.4 mirrors B.2 shifted by one, no OOB
    assert(B4.decode(reader("0")) == Value(1))
    assert(B4.decode(reader("11110" + "000000")) == Value(12))
    // exhausted stream fails rather than spinning
    val r = reader("111111")
    r.bits(8) // consume the whole (padded) byte
    assert(B2.decode(r) == Fail)
  }

  test("custom table segment round-trips (incl. lower/upper/OOB)") {
    val (bytes, t) = Jbig2Synth.encodeTableSegment(-8, 8, Seq((2, 4)),
      lowerPref = 3, upperPref = 3, oobPref = 1)
    // normal line: values -8..7; lower: <= -9; upper: >= 8; OOB code "0"
    val w = new Jbig2Synth.BitWriter
    Seq(Some(-8), Some(0), Some(7), Some(-20), Some(100), None).foreach(v =>
      Jbig2Synth.encodeHuffValue(w, t, v))
    val data = w.result()
    val r = new Reader(data, 0, data.length)
    assert(t.decode(r) == Value(-8))
    assert(t.decode(r) == Value(0))
    assert(t.decode(r) == Value(7))
    assert(t.decode(r) == Value(-20))
    assert(t.decode(r) == Value(100))
    assert(t.decode(r) == Oob)
    // and the segment parses to the same structure a second time
    assert(Jbig2Huffman.parseTableSegment(bytes, 0, bytes.length).get
      .lines.toSeq == t.lines.toSeq)
  }

  test("huffman symbol dictionary + text region round-trip (uncompressed collective)") {
    val w = 28
    val h = 20
    val glyphs = Seq(
      Jbig2Synth.glyph(Seq(".##.", "#..#", "####", "#..#", "#..#")),
      Jbig2Synth.glyph(Seq("###.", "#..#", "###.", "#..#", "###.")),
      Jbig2Synth.glyph(Seq(".####.", "#....#", "#.....", "#....#", ".####.")))
    val instances = Seq((0, 2, 3), (1, 8, 3), (2, 14, 3), (1, 4, 12), (0, 20, 12))
    val expected = new Array[Byte](w * h)
    instances.foreach { case (id, x, y) =>
      val g = glyphs(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0 && y + yy < h && x + xx < w)
          expected((y + yy) * w + (x + xx)) = 1
    }
    for (mmr <- Seq(false, true); refCorner <- Seq(1, 0, 3)) {
      val stream = Jbig2Synth.embeddedHuffTextStream(w, h, glyphs, instances,
        mmr = mmr, refCorner = refCorner)
      val out = Jbig2.decodeEmbedded(stream, w, h)
      assert(out.isDefined, s"mmr=$mmr corner=$refCorner")
      assert(out.get.toSeq == expected.toSeq, s"mmr=$mmr corner=$refCorner")
    }
  }

  test("multi-height-class dictionary with MMR collective bitmaps") {
    val w = 40
    val h = 24
    val glyphs = Seq(
      Jbig2Synth.glyph(Seq("##", "##")),
      Jbig2Synth.glyph(Seq("#.#", ".#.", "#.#")),
      Jbig2Synth.glyph(Seq("####", "#..#", "#..#", "####")),
      Jbig2Synth.glyph(Seq(".#..", "###.", ".#..", ".#..")))
    val instances = Seq((0, 1, 1), (1, 6, 1), (2, 12, 1), (3, 20, 1), (2, 30, 10), (0, 5, 15))
    val expected = new Array[Byte](w * h)
    instances.foreach { case (id, x, y) =>
      val g = glyphs(id)
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0)
          expected((y + yy) * w + (x + xx)) = 1
    }
    val stream = Jbig2Synth.embeddedHuffTextStream(w, h, glyphs, instances, mmr = true)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    assert(out.get.toSeq == expected.toSeq)
  }

  test("huffman + refinement text region (6.4.11 with SBHUFF=1)") {
    val w = 32
    val h = 18
    val glyphs = Seq(
      Jbig2Synth.glyph(Seq("####", "#..#", "#..#", "####")),
      Jbig2Synth.glyph(Seq(".##.", "#..#", "#..#", ".##.")))
    // instance 1 refines to a GROWN 6×6 ring, instance 3 refines to a
    // same-size inversion — RDW/RDH exercise nonzero and zero deltas
    val grown = Jbig2Synth.glyph(Seq("######", "#....#", "#.##.#",
      "#.##.#", "#....#", "######"))
    val flipped = Jbig2Synth.glyph(Seq("...#", ".##.", ".##.", "#..."))
    val instances = Seq((0, 2, 2), (1, 10, 2), (0, 18, 2), (1, 4, 10), (0, 14, 10))
    val refines = Map(1 -> grown, 3 -> flipped)
    val expected = new Array[Byte](w * h)
    instances.zipWithIndex.foreach { case ((id, x, y), i) =>
      val g = refines.getOrElse(i, glyphs(id))
      for (yy <- 0 until g.h; xx <- 0 until g.w)
        if (g.bits(yy * g.w + xx) != 0 && y + yy < h && x + xx < w)
          expected((y + yy) * w + (x + xx)) = 1
    }
    val stream = Jbig2Synth.embeddedHuffTextStream(w, h, glyphs, instances,
      refines = refines)
    val out = Jbig2.decodeEmbedded(stream, w, h)
    assert(out.isDefined)
    assert(out.get.toSeq == expected.toSeq)
    // the unrefined encoding of the same instances must differ — proof the
    // refinement lane actually changed pixels
    val plain = Jbig2.decodeEmbedded(
      Jbig2Synth.embeddedHuffTextStream(w, h, glyphs, instances), w, h)
    assert(plain.get.toSeq != expected.toSeq)
  }

  test("degrades, never throws: B.6 selectors, refinement, truncation, mutation") {
    val glyphs = Seq(Jbig2Synth.glyph(Seq("##", "##")), Jbig2Synth.glyph(Seq(".#", "#.")))
    val good = Jbig2Synth.embeddedHuffTextStream(16, 8, glyphs, Seq((0, 1, 1), (1, 6, 3)))
    assert(Jbig2.decodeEmbedded(good, 16, 8).isDefined)
    for (cut <- Seq(0, 11, good.length / 2, good.length - 2)) {
      val r = Jbig2.decodeEmbedded(good.take(cut), 16, 8)
      assert(r.isEmpty || r.get.length == 16 * 8)
    }
    val rnd = new scala.util.Random(7)
    (0 until 60).foreach { k =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jbig2.decodeEmbedded(b, 16, 8)
      assert(r.isEmpty || r.get.length == 16 * 8, s"mutation $k")
    }
  }
}
