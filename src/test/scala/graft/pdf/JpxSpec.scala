package graft.pdf

import graft.testgen.JpxSynth
import org.scalatest.funsuite.AnyFunSuite

/** JPX (JPEG 2000) lane: staged round-trips from the primitive codecs up to
  * full codestreams — tag trees, Tier-1 EBCOT block coding, 5/3 and 9/7
  * wavelets, packet headers, JP2 boxes, multi-tile grids — plus corrupt-
  * stream robustness. The encoder is a from-spec mirror (JpxSynth), so every
  * green round-trip pins BOTH sides.
  *
  * Interop evidence (run out-of-band — node + the reference's OWN vendored
  * JPX decoder, pdf.combined.js JpxImage lines 10689-12880, extracted with
  * the ArithmeticDecoder closure plus shadow/log2/readUint* shims into
  * /tmp/jpx_harness.js, the same playbook as the JBIG2 harness): twelve
  * JpxSynth codestream classes — gray 5/3 at levels 0/2/3 (odd dims
  * included), RGB + reversible RCT, gray 9/7, a 64-px block-aligned
  * multi-tile grid, the JP2 box container, 2- and 3-quality-layer streams
  * (re-inclusion bits, persistent Lblock/tag trees, chunk concatenation),
  * a delayed-first-inclusion near-flat multi-layer stream, a
  * segmentation-symbol stream (the vendored decoder VALIDATES each 0xA
  * symbol, pinning the symbol bit placement), and a 2-layer SOP+EPH
  * stream — were decoded by both
  * implementations: 0 mismatched samples on every stream (the vendored
  * decoder emits interleaved 0-255 tile items; compared against
  * `Jpx.decode`'s planes after DC shift/clamp). That pins this codec pair's
  * bit conventions (MQ contexts, scan order, packet headers, tag trees,
  * lifting, RCT) to the interchange behavior of a conformant third-party
  * decoder, not just to internal round-trip consistency.
  *
  * Round 6 adds SIX SUBSAMPLED classes (/tmp/jpx_harness_sub.js, compared
  * pre-interleave against each transformTile output with the non-MCT
  * shift/clamp applied): gray XRsiz=YRsiz=2 at even and odd dims, gray 3×3,
  * and three-component 4:2:0 — 5/3, 9/7 and a 2-tile grid — all at
  * 0 mismatched samples against `Jpx.decodeComponents`' component-grid
  * planes. Caveats pinned during this: the vendored SIZ parse has TWO bugs
  * (pdf.combined.js:10839-10848 — YRsiz reads the XRsiz byte, and the
  * per-component cursor `j` is never advanced, so every component gets
  * component 0's Ssiz/XRsiz/YRsiz); single-component streams are unaffected
  * (validated against the untouched harness), while the multi-component
  * runs patch exactly those two parse lines — the vendored grid math
  * (calculateComponentDimensions/calculateTileGrids), packet iteration,
  * Tier-1/Tier-2 and wavelet code run unmodified. Its final interleave also
  * assumes equal component sizes (transformComponents writes tile0-sized
  * strides), so comparison happens per component before interleaving;
  * our reference-grid replication (`upsample`) is covered by the
  * replication assertions below.
  *
  * Round 6 also adds SEVEN MULTI-LAYER NON-LRCP classes (test-scope main
  * `graft.JpxXval` emits them; unpatched /tmp/jpx_harness.js decodes):
  * RLCP at 2 and 3 layers, RPCL at 3, PCRL at 2, CPRL at 3 (all RGB+RCT),
  * a 3-layer RPCL gray 9/7, and a 2-layer CPRL stream with SOP+EPH — all
  * 0 mismatched samples, pinning the B.12 packet-interleave orders (under
  * the default single whole-subband precinct the five progressions reduce
  * to the loop nestings l(r(c)), r(l(c)), r(c(l)), c(r(l)), c(r(l))).
  *
  * Round 6 also adds FIVE REFERENCE-GRID-OFFSET classes (XOsiz/YOsiz and
  * XTOsiz/YTOsiz nonzero, all multiples of 2^levels): gray, RGB+RCT, 9/7,
  * a clipped tile-partition origin below the image origin, and
  * offsets+custom-precincts with band origins precinct-ALIGNED — all at
  * 0 mismatched samples. The UNALIGNED offsets+precincts class cannot be
  * arbitrated there: the vendored codeblock→precinct mapping anchors at
  * the band origin (pdf.combined.js:11209-11212) where T.800 B.6's
  * partition is absolute (and its cbyMin update writes cbxMin, 11229), so
  * it desyncs (1873/1920 samples when tried); that class is gated by the
  * bit-exact round-trips below.
  *
  * ODD-parity origins (arbitrary offsets and tile grids, round 6's
  * parity-general wavelet) are likewise beyond the vendored decoder — its
  * Transform.iterate interleaves low-pass at relative-even positions
  * unconditionally (12665-12684; only the width-1 degenerate case consults
  * u0) — so those classes are gated by a hand-computed F.3.8 lifting
  * fixture, an every-parity forward/inverse exactness property, and
  * bit-exact full-codestream round-trips (odd image origins, tile sizes no
  * power of two divides, subsampled tiles off the XRsiz·2^levels grid).
  *
  * PPM/PPT/POC likewise CANNOT be cross-validated — the vendored decoder
  * throws 'Unknown codestream code' on all three markers — and are gated
  * by bit-exact round-trips (PPM/PPT × multi-tile × SOP/EPH × precincts ×
  * POC) plus dry-packed-stream and PPM+PPT-exclusivity reject tests.
  *
  * Round 6 closes PER-TILE CODING OVERRIDES (A.4.2 first-tile-part
  * COD/COC/QCD/QCC) with EIGHT cross-validated classes (graft.JpxXval
  * emits /tmp/xvt_*.j2k; /tmp/xval_cmp_tiles.js composites the vendored
  * per-tile items by left/top origin): tile COD changing the progression,
  * the layer count, or levels+block-size (with an own tile QCD), all
  * three combined on a 2×2 unaligned grid, RGB+RCT with a CPRL+2-layer
  * tile, a tile QCD whose exponents differ from the main (high-contrast
  * vs near-flat tiles), a 9/7 tile inside a 5/3 image, and a tile COD carrying its own custom precinct partition — 0 mismatched
  * samples on every stream. Two lanes stay round-trip-only: COC-bearing
  * streams (the vendored decoder throws 'COC not implemented' on 0xFF53
  * anywhere, pdf.combined.js:11051-11053) and tile-COD-signalled SOP/EPH
  * — its parseTilePackets reads both flags from the MAIN COD only
  * (11754-11755, vendored bug #4), so a tile-signalled SOP desyncs it
  * with 'Out of packets'; the spec reading (the tile's effective COD
  * governs its packets) is pinned by the bit-exact round-trips below,
  * which also cover the T.800 precedence (a tile COD dropping main COCs)
  * and the non-first-tile-part coding-marker reject. Tile-local
  * RGN and POC markers (the last tile-header classes) are likewise
  * round-trip-gated — a first-tile-part RGN whose stripped variant
  * provably mis-decodes, and a tile POC sequencing its own volumes while
  * the other tile stays on the COD progression.
  *
  * Maxshift ROI (RGN) CANNOT be cross-validated there — the vendored
  * decoder throws 'Unknown codestream code' on 0xFF5E
  * (pdf.combined.js:11054-11056), so the ROI lane is beyond-parity; its
  * gates are the reversible round-trips below (exact by construction:
  * the decoder's threshold downshift must recover precisely the
  * magnitudes the encoder scaled up) plus the strip-the-RGN tamper test
  * proving the shift is load-bearing. */
class JpxSpec extends AnyFunSuite {

  private def u16(d: Array[Byte], p: Int) = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  /** Scan main-header marker segments for `m`; returns the marker offset. */
  private def findMarker(d: Array[Byte], m: Int): Int = {
    var p = 2
    while (p + 2 <= d.length) {
      if (u16(d, p) == m) return p
      p += 2 + u16(d, p + 2)
    }
    -1
  }

  test("JPX PDFs decode through the full raster lane (all four flavors)") {
    for ((name, rgb, lossy, jp2, cs) <- Seq(
      ("raw gray", false, false, false, "DeviceGray"),
      ("rgb+rct", true, false, false, "DeviceRGB"),
      ("9/7 lossy", false, true, false, "DeviceGray"),
      ("jp2 boxed", false, false, true, "DeviceGray"))) {
      val pdf = JpxSynth.pdfWithJpx(64, 48, seed = 2, rgb = rgb,
        lossy = lossy, jp2 = jp2)
      val imgs = PdfImages.list(PdfDocument.open(pdf))
      assert(imgs.length == 1, name)
      val i = imgs.head
      assert((i.filter, i.colorSpace) == (("JPXDecode", cs)), name)
      assert((i.decodedW, i.decodedH, i.decodedBands) == ((64, 48, 3)), name)
      assert(i.grayMean >= 0, name)
    }
  }

  test("tag tree encode/decode round-trips values against thresholds") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 20) {
      val w = 1 + rnd.nextInt(7)
      val h = 1 + rnd.nextInt(5)
      val values = Array.fill(w * h)(rnd.nextInt(6))
      val enc = new JpxSynth.TagTreeEnc(w, h, values)
      val bw = new JpxSynth.BitWriter
      // visit leaves in scan order with increasing thresholds, like the
      // zero-bitplane consumer: encode until each leaf pins
      for (j <- 0 until h; i <- 0 until w)
        enc.encode(bw, i, j, values(j * w + i) + 1)
      bw.align()
      val data = bw.toArray
      val dec = new Jpx.TagTree(w, h)
      val br = new Jpx.PacketBitReader(data, 0, data.length)
      for (j <- 0 until h; i <- 0 until w) {
        var t = 1
        var got = -1
        while (got < 0) {
          got = dec.decode(br, i, j, t)
          t += 1
          assert(t < 64, s"trial $trial leaf ($i,$j) did not pin")
        }
        assert(got == values(j * w + i), s"trial $trial leaf ($i,$j)")
      }
    }
  }

  test("Tier-1 EBCOT block codec round-trips sign-magnitude coefficients") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 12) {
      val w = 1 + rnd.nextInt(34)
      val h = 1 + rnd.nextInt(34)
      val band = trial % 3
      val maxBits = 1 + rnd.nextInt(7)
      val vals = Array.fill(w * h) {
        if (rnd.nextInt(3) == 0) {
          val m = rnd.nextInt(1 << maxBits)
          if (rnd.nextBoolean() && m != 0) m | Int.MinValue else m
        } else 0
      }
      val actualMax = vals.map(_ & Int.MaxValue).max
      val needed = 32 - Integer.numberOfLeadingZeros(math.max(1, actualMax))
      val mb = needed + 1 + rnd.nextInt(2)
      val zbp = mb - math.max(1, needed)
      val (segs, passes) = JpxSynth.encodeBlock(vals, w, h, band, mb, zbp)
      if (actualMax == 0) assert(passes == 0 || segs.isEmpty)
      else {
        val data = segs.head
        val got = Jpx.decodeBlock(data, Seq((0, data.length, 0)), w, h, band,
          mb, zbp, passes)
        assert(got.toSeq == vals.toSeq, s"trial $trial ${w}x$h band=$band mb=$mb zbp=$zbp")
      }
    }
  }

  test("5/3 forward/inverse 2D wavelet is exact on integer grids") {
    val rnd = new scala.util.Random(5)
    for ((w, h) <- Seq((8, 8), (7, 5), (16, 9), (33, 17), (1, 7), (12, 1))) {
      val src = Array.fill(w * h)(rnd.nextInt(512) - 256)
      val (ll, hl, lh, hh) = JpxSynth.forward2D(reversible = true,
        src.map(_.toDouble), w, h)
      val back = Jpx.inverse2D(reversible = true, ll, hl, lh, hh, 0, w, 0, h)
      assert(back.map(math.rint(_).toInt).toSeq == src.toSeq, s"$w x $h")
    }
  }

  test("gray lossless codestream round-trips bit-exactly") {
    for ((w, h, levels, seed) <- Seq((64, 48, 2, 1L), (57, 43, 3, 2L),
      (16, 16, 1, 3L), (100, 30, 2, 4L), (31, 64, 0, 5L))) {
      val px = JpxSynth.testGray(w, h, seed)
      val cs = JpxSynth.encode(Array(px), w, h, 8, levels)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"$w x $h levels=$levels")
      val d = out.get
      assert((d.w, d.h, d.comps) == ((w, h, 1)))
      assert(d.planes(0).toSeq == px.toSeq, s"$w x $h levels=$levels seed=$seed")
    }
  }

  test("RGB + reversible RCT round-trips bit-exactly") {
    val (w, h) = (48, 40)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val cs = JpxSynth.encode(planes, w, h, 8, 2, mct = 1)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    val d = out.get
    assert(d.comps == 3)
    for (c <- 0 until 3)
      assert(d.planes(c).toSeq == planes(c).toSeq, s"component $c")
  }

  test("9/7 irreversible codestream reconstructs within tolerance") {
    val (w, h) = (64, 48)
    val px = JpxSynth.testGray(w, h, 2)
    val cs = JpxSynth.encode(Array(px), w, h, 8, 2, reversible = false)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    val got = out.get.planes(0)
    val mse = px.indices.map(i => { val e = got(i) - px(i); e.toDouble * e }).sum / px.length
    val psnr = 10 * math.log10(255.0 * 255 / math.max(mse, 1e-9))
    info(f"9/7 delta=1 PSNR = $psnr%.1f dB")
    assert(psnr > 40, f"PSNR $psnr%.1f")
  }

  test("JP2 box container wraps and decodes identically") {
    val (w, h) = (40, 32)
    val px = JpxSynth.testGray(w, h, 6)
    val raw = JpxSynth.encode(Array(px), w, h, 8, 2)
    val jp2 = JpxSynth.wrapJp2(raw, w, h, 1, 8)
    val out = Jpx.decode(jp2)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
  }

  test("multi-tile codestream round-trips (block-aligned tile grid)") {
    // subset constraint: tile size a multiple of cb << levels keeps every
    // band origin on the code-block grid for both sides
    val (w, h) = (100, 70)
    val px = JpxSynth.testGray(w, h, 8)
    val cs = JpxSynth.encode(Array(px), w, h, 8, 2, cbExp = 4,
      tileW = 64, tileH = 64)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
  }

  test("multi-layer codestreams round-trip bit-exactly (quality layers)") {
    // real-world PDF JPX is almost always multi-quality-layer: each block's
    // passes/bytes split across layers, later layers re-include via one bit,
    // Lblock and the tag trees persist across layers, chunks concatenate
    for ((layers, w, h, lev) <- Seq((2, 64, 48, 2), (3, 57, 43, 2), (4, 40, 40, 1))) {
      val px = JpxSynth.testGray(w, h, seed = layers.toLong)
      val cs = JpxSynth.encode(Array(px), w, h, 8, lev, layers = layers)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"layers=$layers")
      assert(out.get.planes(0).toSeq == px.toSeq, s"layers=$layers")
    }
    // RGB + RCT with layers
    val planes = Array(JpxSynth.testGray(48, 40, 1), JpxSynth.testGray(48, 40, 4),
      JpxSynth.testGray(48, 40, 9))
    val cs = JpxSynth.encode(planes, 48, 40, 8, 2, mct = 1, layers = 3)
    val d = Jpx.decode(cs).get
    for (c <- 0 until 3) assert(d.planes(c).toSeq == planes(c).toSeq, s"comp $c")
    // blocks with FEWER passes than layers: a near-flat image yields
    // single-pass code-blocks whose fair split gives layer 0 nothing — the
    // inclusion tag tree must first-include them at their first nonzero
    // layer, not claim them at layer 0 with no header fields
    val flat = Array.fill(48 * 48)(128)
    flat(5 * 48 + 7) = 129
    flat(30 * 48 + 40) = 127
    val csFlat = JpxSynth.encode(Array(flat), 48, 48, 8, 2, cbExp = 4, layers = 4)
    val dFlat = Jpx.decode(csFlat)
    assert(dFlat.isDefined)
    assert(dFlat.get.planes(0).toSeq == flat.toSeq)
  }

  test("multi-layer non-LRCP progressions round-trip (RLCP/RPCL/PCRL/CPRL)") {
    // under the default single whole-subband precinct the five progressions
    // are loop nestings of (layer, resolution, component); multi-layer
    // streams interleave packets differently per order — each must parse
    val (w, h) = (48, 40)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    for (prog <- 1 to 4; layers <- Seq(2, 3)) {
      val cs = JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = layers,
        prog = prog)
      val d = Jpx.decode(cs)
      assert(d.isDefined, s"prog=$prog layers=$layers")
      for (c <- 0 until 3)
        assert(d.get.planes(c).toSeq == planes(c).toSeq,
          s"prog=$prog layers=$layers comp $c")
    }
    // 4:2:0 subsampled + RPCL + 3 layers + SOP/EPH in one stream
    val sub = Array(JpxSynth.testGray(w, h, 2),
      JpxSynth.testGray(24, 20, 5), JpxSynth.testGray(24, 20, 8))
    val cs = JpxSynth.encode(sub, w, h, 8, 2, layers = 3, prog = 2,
      sop = true, eph = true, xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
    val d = Jpx.decodeComponents(cs)
    assert(d.isDefined)
    for (c <- 0 until 3)
      assert(d.get.planes(c).toSeq == sub(c).toSeq, s"sub comp $c")
  }

  test("segmentation symbols (style 0x20) round-trip") {
    val (w, h) = (48, 40)
    val px = JpxSynth.testGray(w, h, 7)
    val cs = JpxSynth.encode(Array(px), w, h, 8, 2, cbStyle = 0x20)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
    // with layers too (symbols end every cleanup pass, across chunks)
    val csL = JpxSynth.encode(Array(px), w, h, 8, 2, cbStyle = 0x20, layers = 3)
    assert(Jpx.decode(csL).get.planes(0).toSeq == px.toSeq)
  }

  test("code-block styles round-trip at the Tier-1 block level") {
    // bypass (0x1): raw SPP/MRP from pass 10 with D.7 bit-stuffing and
    // segment terminations; reset (0x2); terminate-all (0x4); vertically
    // causal (0x8); plus all six together. Values span >= 5 bitplanes so
    // bypass genuinely activates (needs pass index >= 10).
    val rnd = new scala.util.Random(11)
    for (style <- Seq(0x01, 0x02, 0x04, 0x08, 0x05, 0x3f); trial <- 0 until 6) {
      val w = 5 + rnd.nextInt(28)
      val h = 5 + rnd.nextInt(28)
      val band = trial % 3
      val vals = Array.fill(w * h) {
        if (rnd.nextInt(3) == 0) {
          val m = rnd.nextInt(1 << 7)
          if (rnd.nextBoolean() && m != 0) m | Int.MinValue else m
        } else 0
      }
      val actualMax = vals.map(_ & Int.MaxValue).max
      if (actualMax > 15) { // >= 5 planes -> >= 13 passes
        val needed = 32 - Integer.numberOfLeadingZeros(actualMax)
        val mb = needed + 1
        val zbp = mb - needed
        val (segs, passes) = JpxSynth.encodeBlock(vals, w, h, band, mb, zbp, style)
        if (((style & 1) != 0 && passes > 10) || (style & 4) != 0)
          assert(segs.length > 1, s"style=$style passes=$passes should terminate")
        var off = 0
        val chunks = segs.toSeq.zipWithIndex.map { case (s, i) =>
          val c = (off, off + s.length, i)
          off += s.length
          c
        }
        val flat = segs.toSeq.flatten.toArray
        val got = Jpx.decodeBlock(flat, chunks, w, h, band, mb, zbp, passes, style)
        assert(got.toSeq == vals.toSeq, s"style=$style trial=$trial ${w}x$h")
      }
    }
  }

  test("code-block styles round-trip through full codestreams and layers") {
    // Tier-2 must signal one length per codeword-segment piece (B.10.7.2);
    // multi-layer splits land inside segments (proportional bytes) and on
    // their boundaries — both shapes decode bit-exactly
    val (w, h) = (48, 40)
    val px = JpxSynth.testGray(w, h, 7)
    for (style <- Seq(0x01, 0x04, 0x08, 0x10, 0x3f); layers <- Seq(1, 3)) {
      val cs = JpxSynth.encode(Array(px), w, h, 8, 2, cbStyle = style,
        layers = layers)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"style=$style layers=$layers")
      assert(out.get.planes(0).toSeq == px.toSeq, s"style=$style layers=$layers")
    }
    // RGB + RCT with all styles, and the PDF raster lane end-to-end
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val csRgb = JpxSynth.encode(planes, w, h, 8, 2, mct = 1, cbStyle = 0x3f,
      layers = 2)
    val outRgb = Jpx.decode(csRgb)
    assert(outRgb.isDefined)
    for (c <- 0 until 3)
      assert(outRgb.get.planes(c).toSeq == planes(c).toSeq, s"rgb comp $c")
    val pdf = JpxSynth.pdfWithJpx(64, 48, seed = 2, styles = true)
    val imgs = graft.pdf.PdfImages.list(graft.pdf.PdfDocument.open(pdf))
    assert(imgs.length == 1 && imgs.head.decodedW == 64 && imgs.head.decodedH == 48)
  }

  test("SOP and EPH marker segments are consumed (single- and multi-layer)") {
    val (w, h) = (48, 40)
    val px = JpxSynth.testGray(w, h, 5)
    for (layers <- Seq(1, 2)) {
      val cs = JpxSynth.encode(Array(px), w, h, 8, 2, layers = layers,
        sop = true, eph = true)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"layers=$layers")
      assert(out.get.planes(0).toSeq == px.toSeq, s"layers=$layers")
    }
  }

  test("QCC / COC per-component overrides parse (semantic no-op splice)") {
    // splice a QCC (comp 2) and a COC (comp 1) that RESTATE the QCD/COD
    // values — the decode must be bit-identical, proving the per-component
    // override paths are actually taken without changing semantics
    val (w, h) = (48, 40)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val cs = JpxSynth.encode(planes, w, h, 8, 2, mct = 1)
    val qcdPos = findMarker(cs, 0xff5c)
    val qcdLen = u16(cs, qcdPos + 2)
    val qcdBody = cs.slice(qcdPos + 4, qcdPos + 2 + qcdLen) // Sqcd + exps
    val qcc = Array[Byte](0xff.toByte, 0x5d, 0, (2 + 1 + qcdBody.length).toByte,
      2 /*component*/) ++ qcdBody
    val codPos = findMarker(cs, 0xff52)
    // COD body: Scod prog layers(2) mct levels xcb ycb style wavelet
    val spcod = cs.slice(codPos + 4 + 5, codPos + 4 + 10) // levels..wavelet
    val coc = Array[Byte](0xff.toByte, 0x53, 0, (2 + 1 + 1 + 5).toByte,
      1 /*component*/, 0 /*Scoc*/) ++ spcod
    val spliceAt = qcdPos + 2 + qcdLen
    val spliced = cs.take(spliceAt) ++ qcc ++ coc ++ cs.drop(spliceAt)
    val base = Jpx.decode(cs).get
    val over = Jpx.decode(spliced)
    assert(over.isDefined)
    for (c <- 0 until 3)
      assert(over.get.planes(c).toSeq == base.planes(c).toSeq, s"comp $c")
  }

  test("COC segmentation-symbol bit differing from the COD is honored") {
    // the COC's code-block style must override the COD's per component —
    // a dropped 0x20 toggle desyncs the MQ cleanup passes silently
    val (w, h) = (40, 32)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 5),
      JpxSynth.testGray(w, h, 9))
    // COD: no seg symbols; COC on comp 1: seg symbols ON
    val csOn = JpxSynth.encode(planes, w, h, 8, levels = 2, cbExp = 4,
      cocStyles = Map(1 -> 0x20))
    val outOn = Jpx.decode(csOn)
    assert(outOn.isDefined)
    for (c <- 0 until 3)
      assert(outOn.get.planes(c).toSeq == planes(c).toSeq, s"on: comp $c")
    // COD: seg symbols; COC on comp 2: seg symbols OFF
    val csOff = JpxSynth.encode(planes, w, h, 8, levels = 2, cbExp = 4,
      cbStyle = 0x20, cocStyles = Map(2 -> 0))
    val outOff = Jpx.decode(csOff)
    assert(outOff.isDefined)
    for (c <- 0 until 3)
      assert(outOff.get.planes(c).toSeq == planes(c).toSeq, s"off: comp $c")
  }

  test("subsampled components round-trip on their own grids (4:2:0, 4:2:2)") {
    // each component decodes on its ceil(w/XRsiz)×ceil(h/YRsiz) grid (B.2);
    // decodeComponents exposes the raw grids, decode() replicates up
    for ((w, h, fx, fy, lbl) <- Seq(
      (64, 48, 2, 2, "4:2:0"), (64, 48, 2, 1, "4:2:2"),
      (57, 43, 2, 2, "odd dims"), (33, 25, 3, 2, "3x2"))) {
      val cw = Jpx.ceilDiv(w, fx)
      val ch = Jpx.ceilDiv(h, fy)
      val planes = Array(JpxSynth.testGray(w, h, 1),
        JpxSynth.testGray(cw, ch, 4), JpxSynth.testGray(cw, ch, 9))
      val cs = JpxSynth.encode(planes, w, h, 8, 2,
        xrs = Seq(1, fx, fx), yrs = Seq(1, fy, fy))
      val cd = Jpx.decodeComponents(cs)
      assert(cd.isDefined, lbl)
      val d = cd.get
      assert((d.cw(1), d.ch(1)) == ((cw, ch)), lbl)
      for (c <- 0 until 3)
        assert(d.planes(c).toSeq == planes(c).toSeq, s"$lbl comp $c")
      // the public surface replicates chroma samples to the full grid
      val up = Jpx.decode(cs).get
      assert((up.w, up.h) == ((w, h)), lbl)
      var mismatch = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (up.planes(1)(y * w + x) != planes(1)((y / fy) * cw + x / fx))
            mismatch += 1
          x += 1
        }
        y += 1
      }
      assert(mismatch == 0, s"$lbl replication")
    }
  }

  test("subsampled 9/7 reconstructs within tolerance; multi-tile aligns") {
    val (w, h) = (64, 48)
    val cw = w / 2
    val ch = h / 2
    val planes = Array(JpxSynth.testGray(w, h, 2),
      JpxSynth.testGray(cw, ch, 5), JpxSynth.testGray(cw, ch, 8))
    val cs97 = JpxSynth.encode(planes, w, h, 8, 2, reversible = false,
      xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
    val d97 = Jpx.decodeComponents(cs97)
    assert(d97.isDefined)
    for (c <- 0 until 3) {
      val got = d97.get.planes(c)
      val src = planes(c)
      val mse = src.indices.map(i => { val e = got(i) - src(i); e.toDouble * e })
        .sum / src.length
      val psnr = 10 * math.log10(255.0 * 255 / math.max(mse, 1e-9))
      assert(psnr > 40, f"comp $c PSNR $psnr%.1f")
    }
    // multi-tile + subsampling (alignment no longer required — the
    // parity-general wavelet handles any grid; this case keeps the
    // original aligned geometry for continuity with the r6 cross-val)
    val (w2, h2) = (128, 64)
    val planes2 = Array(JpxSynth.testGray(w2, h2, 3),
      JpxSynth.testGray(w2 / 2, h2 / 2, 6), JpxSynth.testGray(w2 / 2, h2 / 2, 11))
    val csMt = JpxSynth.encode(planes2, w2, h2, 8, 2, cbExp = 3,
      tileW = 64, tileH = 64, xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
    val dMt = Jpx.decodeComponents(csMt)
    assert(dMt.isDefined)
    for (c <- 0 until 3)
      assert(dMt.get.planes(c).toSeq == planes2(c).toSeq, s"mt comp $c")
    // forged XTsiz (36 vs the encoded 64-tile packet geometry): the tile
    // grid no longer matches the tile-part contents — malformed, must
    // degrade to None rather than wrong pixels
    val csBad = csMt.clone()
    val sizAt = findMarker(csBad, 0xff51)
    csBad(sizAt + 22) = 0; csBad(sizAt + 23) = 0
    csBad(sizAt + 24) = 0; csBad(sizAt + 25) = 36
    assert(Jpx.decode(csBad).isEmpty, "forged tile grid must reject")
  }

  test("MCT over mixed subsampling rejects (spec constraint)") {
    // patch a 4:2:0 no-MCT stream's COD multiple-component-transform byte:
    // the decoder must refuse rather than mix planes of different sizes
    val (w, h) = (32, 24)
    val planes = Array(JpxSynth.testGray(w, h, 1),
      JpxSynth.testGray(16, 12, 4), JpxSynth.testGray(16, 12, 9))
    val cs = JpxSynth.encode(planes, w, h, 8, 2,
      xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
    assert(Jpx.decode(cs).isDefined)
    val cod = findMarker(cs, 0xff52)
    val b = cs.clone()
    b(cod + 4 + 4) = 1 // SGcod MCT byte (Scod prog layers(2) | mct)
    assert(Jpx.decode(b).isEmpty)
  }

  test("4:2:0 PDF decodes through the full raster lane") {
    val pdf = JpxSynth.pdfWithJpx(64, 48, seed = 2, sub420 = true)
    val imgs = PdfImages.list(PdfDocument.open(pdf))
    assert(imgs.length == 1)
    val i = imgs.head
    assert((i.filter, i.colorSpace) == (("JPXDecode", "DeviceRGB")))
    assert((i.decodedW, i.decodedH, i.decodedBands) == ((64, 48, 3)))
    assert(i.grayMean > 0)
  }

  test("custom precincts round-trip bit-exactly (grids, clamped blocks, tag trees)") {
    val (w, h) = (64, 48)
    val px = JpxSynth.testGray(w, h, 11)
    // levels 2: r0 16×12, r1 32×24, r2 64×48. PPx/PPy = 4/4, 4/4, 5/5 →
    // precinct grids 1×1, 2×2, 2×2; effective code-blocks clamp from 16 to
    // 8 at r1/r2 (PPx−1 = 3 < cbExp 4 at r1; 16 at r2 via PPx−1 = 4)
    val ps = Seq(0x44, 0x44, 0x55)
    for (prog <- 0 to 4) {
      val cs = JpxSynth.encode(Array(px), w, h, 8, 2, cbExp = 4,
        precSizes = ps, prog = prog)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"prog=$prog")
      assert(out.get.planes(0).toSeq == px.toSeq, s"prog=$prog")
    }
    // multi-layer + precincts, every progression
    for (prog <- 0 to 4; layers <- Seq(2, 3)) {
      val cs = JpxSynth.encode(Array(px), w, h, 8, 2, cbExp = 4,
        precSizes = ps, prog = prog, layers = layers)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"prog=$prog layers=$layers")
      assert(out.get.planes(0).toSeq == px.toSeq, s"prog=$prog layers=$layers")
    }
    // RGB + RCT + precincts (position-dependent orders interleave the
    // components' precinct grids)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    for (prog <- Seq(0, 2, 3, 4)) {
      val cs = JpxSynth.encode(planes, w, h, 8, 2, mct = 1, cbExp = 4,
        precSizes = ps, prog = prog, layers = 2)
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"rgb prog=$prog")
      (0 until 3).foreach(c =>
        assert(out.get.planes(c).toSeq == planes(c).toSeq, s"rgb prog=$prog c=$c"))
    }
    // subsampled chroma + precincts: per-component precinct counts differ
    val cw = Jpx.ceilDiv(w, 2)
    val ch = Jpx.ceilDiv(h, 2)
    val sub = Array(JpxSynth.testGray(w, h, 2), JpxSynth.testGray(cw, ch, 5),
      JpxSynth.testGray(cw, ch, 8))
    for (prog <- Seq(0, 2)) {
      val cs = JpxSynth.encode(sub, w, h, 8, 2, cbExp = 4, precSizes = ps,
        prog = prog, xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
      val out = Jpx.decodeComponents(cs)
      assert(out.isDefined, s"sub prog=$prog")
      assert(out.get.planes(0).toSeq == sub(0).toSeq, s"sub prog=$prog c0")
      assert(out.get.planes(1).toSeq == sub(1).toSeq, s"sub prog=$prog c1")
    }
    // 9/7 + precincts within tolerance
    val cs97 = JpxSynth.encode(Array(px), w, h, 8, 2, reversible = false,
      cbExp = 4, precSizes = ps, prog = 2)
    val out97 = Jpx.decode(cs97)
    assert(out97.isDefined)
    val err = out97.get.planes(0).zip(px).map { case (a, b) => (a - b).toDouble }
    val mse = err.map(e => e * e).sum / err.length
    assert(mse < 2.0, s"9/7 precinct mse $mse")
  }

  test("out-of-subset streams degrade to None, never wrong pixels") {
    val (w, h) = (32, 24)
    val cs = JpxSynth.encode(Array(JpxSynth.testGray(w, h, 3)), w, h, 8, 2)
    val siz = findMarker(cs, 0xff51)
    val cod = findMarker(cs, 0xff52)
    def patched(pos: Int, v: Int): Array[Byte] = {
      val b = cs.clone(); b(pos) = v.toByte; b
    }
    // zero subsampling factors are A.5.1-illegal (1..255 all decode since
    // the parity-general wavelet); the length field sits at siz+2, so
    // comp-0 XRsiz is at (siz+2)+39. A FORGED factor on a stream encoded
    // without it is header corruption (covered by the mutation fuzz's
    // empty-or-dims-ok contract); real >8 factors round-trip below
    assert(Jpx.decode(patched(siz + 2 + 39, 0)).isEmpty)
    assert(Jpx.decode(patched(siz + 2 + 40, 0)).isEmpty) // YRsiz too
    // Scod bit 0 (custom precincts) WITHOUT the per-resolution size bytes
    // is malformed — custom precincts themselves decode (round 6)
    assert(Jpx.decode(patched(cod + 4, 1)).isEmpty)
    // reserved code-block style bits (0x40/0x80) stay out of subset; the
    // six defined style bits decode since round 6 (a style byte FORGED onto
    // a stream encoded without it is header corruption — covered by the
    // mutation test's empty-or-dims-ok contract, not this reject set)
    assert(Jpx.decode(patched(cod + 4 + 8, 0x40)).isEmpty)
    assert(Jpx.decode(patched(cod + 4 + 8, 0x80)).isEmpty)
    // 31+ decomposition levels
    assert(Jpx.decode(patched(cod + 4 + 5, 31)).isEmpty)
    // maxshift ROI decodes since round 6; only undefined RGN styles and
    // int-lane-overflowing shifts stay out of subset (RGN spliced after COD)
    val codEnd = cod + 2 + u16(cs, cod + 2)
    def rgn(srgn: Int, shift: Int) = Array[Byte](0xff.toByte, 0x5e, 0, 5,
      0 /*comp*/, srgn.toByte, shift.toByte)
    assert(Jpx.decode(cs.take(codEnd) ++ rgn(1, 4) ++ cs.drop(codEnd)).isEmpty)
    assert(Jpx.decode(cs.take(codEnd) ++ rgn(0, 32) ++ cs.drop(codEnd)).isEmpty)
    // a POC whose volumes do NOT cover every packet (this one stops at
    // r<2 on a levels=2 stream) leaves the parse ambiguous — reject;
    // complete POCs decode (see the POC round-trip test)
    val poc = Array[Byte](0xff.toByte, 0x5f, 0, 9, 0, 0, 0, 1, 2, 1, 0)
    assert(Jpx.decode(cs.take(codEnd) ++ poc ++ cs.drop(codEnd)).isEmpty)
    // a PPM whose packed headers run dry (here: an empty Nppm group spliced
    // onto an inline-headed stream) is malformed — the reader exhausts on
    // the first packet and the decode rejects rather than emit zeros
    val ppm = Array[Byte](0xff.toByte, 0x60, 0, 7, 0, 0, 0, 0, 0)
    assert(Jpx.decode(cs.take(codEnd) ++ ppm ++ cs.drop(codEnd)).isEmpty)
  }

  test("PPM packed packet headers round-trip (single- and multi-tile)") {
    val (w, h) = (64, 48)
    val px = JpxSynth.testGray(w, h, 2)
    // single tile, headers in one main-header PPM group
    val cs = JpxSynth.encode(Array(px), w, h, 8, 2, ppm = true)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
    assert(findMarker(cs, 0xff60) > 0, "PPM marker present")
    // multi-tile: one Nppm group per tile-part, consumed in codestream order
    val px2 = JpxSynth.testGray(100, 70, 8)
    val csMt = JpxSynth.encode(Array(px2), 100, 70, 8, 2, cbExp = 4,
      tileW = 37, tileH = 29, ppm = true)
    val dMt = Jpx.decode(csMt)
    assert(dMt.isDefined, "ppm multi-tile")
    assert(dMt.get.planes(0).toSeq == px2.toSeq, "ppm multi-tile")
    // PPM composes with multi-layer RGB + RCT, SOP in the body stream and
    // EPH inside the packed headers
    val rgb = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val csR = JpxSynth.encode(rgb, w, h, 8, 2, mct = 1, layers = 2,
      sop = true, eph = true, ppm = true)
    val dR = Jpx.decode(csR)
    assert(dR.isDefined, "ppm+sop+eph")
    for (c <- 0 until 3)
      assert(dR.get.planes(c).toSeq == rgb(c).toSeq, s"ppm rgb c$c")
    // packed headers + custom precincts + POC, the full composition
    val csP = JpxSynth.encode(Array(px), w, h, 8, 2, cbExp = 4,
      precSizes = Seq(0x44, 0x44, 0x55), ppm = true,
      poc = Seq((0, 0, 1, 1, 1, 0), (0, 0, 1, 3, 1, 2)))
    val dP = Jpx.decode(csP)
    assert(dP.isDefined, "ppm+precincts+poc")
    assert(dP.get.planes(0).toSeq == px.toSeq, "ppm+precincts+poc")
    // an undersized packed-header stream rejects (the reader running dry
    // mid-parse is detectable malformation)...
    val at = findMarker(cs, 0xff60)
    val segLen = u16(cs, at + 2)
    val starved = cs.clone()
    // shrink the first group's Nppm to 1: headers exhaust on packet one
    starved(at + 5) = 0; starved(at + 6) = 0; starved(at + 7) = 0; starved(at + 8) = 1
    assert(Jpx.decode(starved).isEmpty, "dry packed headers must reject")
    // ...while REMOVING the PPM leaves tile bodies that parse as inline
    // headers — header corruption, bounded by the fuzz contract (empty or
    // dims-ok, and certainly not the original pixels)
    val gutted = cs.take(at) ++ cs.drop(at + 2 + segLen)
    val g = Jpx.decode(gutted)
    assert(g.isEmpty || g.get.planes(0).toSeq != px.toSeq)
  }

  test("PPT tile-part packed headers round-trip; PPM+PPT rejects") {
    val (w, h) = (64, 48)
    val px = JpxSynth.testGray(w, h, 2)
    val cs = JpxSynth.encode(Array(px), w, h, 8, 2, ppt = true)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
    // multi-tile: each tile-part carries its own PPT segments
    val px2 = JpxSynth.testGray(100, 70, 8)
    val csMt = JpxSynth.encode(Array(px2), 100, 70, 8, 2, cbExp = 4,
      tileW = 64, tileH = 64, ppt = true)
    val dMt = Jpx.decode(csMt)
    assert(dMt.isDefined, "ppt multi-tile")
    assert(dMt.get.planes(0).toSeq == px2.toSeq, "ppt multi-tile")
    // multi-layer RGB with EPH inside the tile-packed headers
    val rgb = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val csR = JpxSynth.encode(rgb, w, h, 8, 2, mct = 1, layers = 2,
      eph = true, ppt = true)
    val dR = Jpx.decode(csR)
    assert(dR.isDefined, "ppt rgb")
    for (c <- 0 until 3)
      assert(dR.get.planes(c).toSeq == rgb(c).toSeq, s"ppt rgb c$c")
    // PPM and PPT together are A.7.4-illegal: splice the PPM stream's
    // main-header PPM segment into the PPT stream → reject
    val csPpm = JpxSynth.encode(Array(px), w, h, 8, 2, ppm = true)
    val pmAt = findMarker(csPpm, 0xff60)
    val pmLen = 2 + u16(csPpm, pmAt + 2)
    val ptAt = findMarker(cs, 0xff90) // splice before the first SOT
    val both = cs.take(ptAt) ++ csPpm.slice(pmAt, pmAt + pmLen) ++ cs.drop(ptAt)
    assert(Jpx.decode(both).isEmpty, "PPM + PPT must reject")
    // an unknown tile-part-header marker (per-tile COD override) rejects
    val codAt = findMarker(cs, 0xff52)
    val codLen = 2 + u16(cs, codAt + 2)
    val sotHdrEnd = ptAt + 12 // SOT marker + Lsot(10) bytes
    val tileCod = cs.take(sotHdrEnd) ++ cs.slice(codAt, codAt + codLen) ++ cs.drop(sotHdrEnd)
    assert(Jpx.decode(tileCod).isEmpty, "tile-header COD must reject")
  }

  test("POC progression volumes round-trip and override the COD order") {
    val (w, h) = (48, 40)
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    // two volumes: low resolutions of all components layer-first, then
    // everything remaining position-first — the classic thumbnail-then-
    // detail shape POC exists for
    val cs = JpxSynth.encode(planes, w, h, 8, 2, mct = 1, layers = 2,
      poc = Seq((0, 0, 1, 1, 3, 0), (0, 0, 2, 3, 3, 2)))
    assert(findMarker(cs, 0xff5f) > 0, "POC marker present")
    val d = Jpx.decode(cs)
    assert(d.isDefined)
    for (c <- 0 until 3)
      assert(d.get.planes(c).toSeq == planes(c).toSeq, s"component $c")
    // single full-cover volume in CPRL while the COD still says LRCP: the
    // POC must override — and the packet BYTES must equal a stream encoded
    // with prog=4 outright (same packets, same order, different markers)
    val gray = Array(JpxSynth.testGray(w, h, 7))
    val csPoc = JpxSynth.encode(gray, w, h, 8, 2, layers = 2,
      poc = Seq((0, 0, 2, 3, 1, 4)))
    val dPoc = Jpx.decode(csPoc)
    assert(dPoc.isDefined)
    assert(dPoc.get.planes(0).toSeq == gray(0).toSeq)
    // three volumes slicing by component under custom precincts + offsets
    val csMix = JpxSynth.encode(planes, w + 16, h + 8, 8, 2, mct = 1,
      cbExp = 4, precSizes = Seq(0x44, 0x44, 0x55), xOff = 16, yOff = 8,
      poc = Seq((0, 0, 1, 3, 1, 1), (0, 1, 1, 3, 3, 3), (0, 0, 1, 3, 3, 4)))
    val dMix = Jpx.decode(csMix)
    assert(dMix.isDefined, "poc+precincts+offsets")
    for (c <- 0 until 3)
      assert(dMix.get.planes(c).toSeq == planes(c).toSeq, s"mix component $c")
  }

  test("corrupt / truncated / foreign payloads never throw") {
    val (w, h) = (32, 24)
    val good = JpxSynth.encode(Array(JpxSynth.testGray(w, h, 3)), w, h, 8, 2)
    for (cut <- Seq(0, 2, 10, good.length / 2, good.length - 3)) {
      val r = Jpx.decode(good.take(cut))
      assert(r.isEmpty || r.get.w == w)
    }
    val rnd = new scala.util.Random(9)
    (0 until 60).foreach { k =>
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jpx.decode(b) // must not throw
      assert(r.isEmpty || (r.get.w == w && r.get.h == h), s"mutation $k")
    }
    assert(Jpx.decode(Array.tabulate[Byte](100)(i => (i * 41).toByte)).isEmpty)
    assert(Jpx.decode(Array.empty[Byte]).isEmpty)
    // the tile-override lane holds the same contract: mutations of a
    // first-tile-part COD/QCD stream degrade or decode, never throw
    val tiled = JpxSynth.encode(Array(JpxSynth.testGray(64, 48, 3)), 64, 48,
      8, 2, cbExp = 4, tileW = 48, tileCoding = Map(
        1 -> JpxSynth.TileCoding(prog = Some(1), levels = Some(1),
          cbExp = Some(3), ownQcd = true)))
    (0 until 60).foreach { k =>
      val b = tiled.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      val r = Jpx.decode(b)
      assert(r.isEmpty || (r.get.w == 64 && r.get.h == 48), s"tiled mutation $k")
    }
    for (cut <- Seq(tiled.length / 3, tiled.length / 2, tiled.length - 2))
      assert(Jpx.decode(tiled.take(cut)).forall(_.w == 64))
  }

  test("maxshift ROI (RGN) round-trips bit-exactly and the shift is load-bearing") {
    for ((w, h, levels, seed) <- Seq((64, 48, 2, 1L), (57, 43, 3, 2L),
      (40, 40, 1, 7L))) {
      val px = JpxSynth.testGray(w, h, seed)
      val cs = JpxSynth.encode(Array(px), w, h, 8, levels,
        roi = Map(0 -> ((w / 4, h / 4, 3 * w / 4, 3 * h / 4))))
      val at = findMarker(cs, 0xff5e)
      assert(at > 0, "RGN marker present")
      assert((cs(at + 4), cs(at + 5)) == ((0.toByte, 0.toByte)), "Crgn=0 Srgn=0")
      val sprgn = cs(at + 6) & 0xff
      assert(sprgn > 0, "non-trivial shift")
      val out = Jpx.decode(cs)
      assert(out.isDefined, s"$w x $h levels=$levels")
      assert(out.get.planes(0).toSeq == px.toSeq, s"$w x $h levels=$levels")
      // strip the 7-byte RGN segment: the stream still decodes (headers are
      // self-consistent) but the un-undone upshift must corrupt the pixels
      // — proof the threshold downshift actually ran above
      val stripped = cs.take(at) ++ cs.drop(at + 7)
      val raw = Jpx.decode(stripped)
      assert(raw.isDefined)
      assert(raw.get.planes(0).toSeq != px.toSeq, "shift must be load-bearing")
    }
  }

  test("maxshift ROI round-trips with RCT, subsampling and multi-tile grids") {
    val (w, h) = (64, 48)
    val rect = (16, 12, 48, 36)
    // RGB + reversible RCT, ROI on all three components
    val rgb = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 4),
      JpxSynth.testGray(w, h, 9))
    val csRct = JpxSynth.encode(rgb, w, h, 8, 2, mct = 1,
      roi = Map(0 -> rect, 1 -> rect, 2 -> rect))
    val dRct = Jpx.decode(csRct)
    assert(dRct.isDefined)
    for (c <- 0 until 3)
      assert(dRct.get.planes(c).toSeq == rgb(c).toSeq, s"rct component $c")
    // ROI on a single component only — the others stay unshifted
    val csOne = JpxSynth.encode(rgb, w, h, 8, 2, mct = 1, roi = Map(1 -> rect))
    assert(Jpx.decode(csOne).isDefined)
    for (c <- 0 until 3)
      assert(Jpx.decode(csOne).get.planes(c).toSeq == rgb(c).toSeq, s"one-comp $c")
    // 4:2:0 subsampled, ROI everywhere (rect lands on each component grid)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val sub = Array(JpxSynth.testGray(w, h, 2), JpxSynth.testGray(cw, ch, 5),
      JpxSynth.testGray(cw, ch, 8))
    val csSub = JpxSynth.encode(sub, w, h, 8, 2, xrs = Seq(1, 2, 2),
      yrs = Seq(1, 2, 2), roi = Map(0 -> rect, 1 -> rect, 2 -> rect))
    val dSub = Jpx.decodeComponents(csSub)
    assert(dSub.isDefined)
    for (c <- 0 until 3)
      assert(dSub.get.planes(c).toSeq == sub(c).toSeq, s"sub component $c")
    // multi-tile: the image-grid rectangle spans a tile boundary
    val (mw, mh) = (100, 70)
    val mpx = JpxSynth.testGray(mw, mh, 8)
    val csMt = JpxSynth.encode(Array(mpx), mw, mh, 8, 2, cbExp = 4,
      tileW = 64, tileH = 64, roi = Map(0 -> ((30, 20, 90, 60))))
    val dMt = Jpx.decode(csMt)
    assert(dMt.isDefined)
    assert(dMt.get.planes(0).toSeq == mpx.toSeq)
  }

  test("RGN styles T.800 does not define degrade to metadata-only") {
    val (w, h) = (32, 24)
    val cs = JpxSynth.encode(Array(JpxSynth.testGray(w, h, 3)), w, h, 8, 2,
      roi = Map(0 -> ((8, 6, 24, 18))))
    val at = findMarker(cs, 0xff5e)
    assert(at > 0)
    val badStyle = cs.clone(); badStyle(at + 5) = 1 // Srgn 1: undefined
    assert(Jpx.decode(badStyle).isEmpty)
    val badShift = cs.clone(); badShift(at + 6) = 40 // SPrgn > 31: int lane
    assert(Jpx.decode(badShift).isEmpty)
  }

  test("reference-grid offsets round-trip (XOsiz/YOsiz/XTOsiz/YTOsiz)") {
    // image [16,80)×[8,56) on the reference grid — 64×48 visible; offsets
    // are multiples of 2^levels so every resolution origin stays even
    val (x1, y1, xo, yo) = (80, 56, 16, 8)
    val px = JpxSynth.testGray(x1 - xo, y1 - yo, 3)
    val cs = JpxSynth.encode(Array(px), x1, y1, 8, 2, xOff = xo, yOff = yo)
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert((out.get.w, out.get.h) == ((64, 48)))
    assert(out.get.planes(0).toSeq == px.toSeq)
    // tile-partition origin below the image origin: first tile clipped
    val csT = JpxSynth.encode(Array(px), x1, y1, 8, 2, cbExp = 4,
      tileW = 64, tileH = 64, xOff = xo, yOff = yo, xtOff = 8, ytOff = 8)
    val outT = Jpx.decode(csT)
    assert(outT.isDefined, "tile offsets")
    assert(outT.get.planes(0).toSeq == px.toSeq, "tile offsets")
    // subsampled chroma on the offset grid (XRsiz·2^levels = 8 divides 16/8)
    val cw = (x1 - xo) / 2; val ch = (y1 - yo) / 2
    val sub = Array(px, JpxSynth.testGray(cw, ch, 5), JpxSynth.testGray(cw, ch, 9))
    val csS = JpxSynth.encode(sub, x1, y1, 8, 2, xrs = Seq(1, 2, 2),
      yrs = Seq(1, 2, 2), xOff = xo, yOff = 8)
    val dS = Jpx.decodeComponents(csS)
    assert(dS.isDefined, "subsampled offsets")
    for (c <- 0 until 3)
      assert(dS.get.planes(c).toSeq == sub(c).toSeq, s"subsampled offsets c$c")
    // RGB + RCT + maxshift ROI, all on the offset grid
    val rgb = Array(px, JpxSynth.testGray(64, 48, 4), JpxSynth.testGray(64, 48, 7))
    val csR = JpxSynth.encode(rgb, x1, y1, 8, 2, mct = 1, xOff = xo, yOff = yo,
      roi = Map(0 -> ((32, 20, 64, 44))))
    val dR = Jpx.decode(csR)
    assert(dR.isDefined, "rct+roi offsets")
    for (c <- 0 until 3)
      assert(dR.get.planes(c).toSeq == rgb(c).toSeq, s"rct+roi offsets c$c")
    // offsets + custom precincts with band origins MID-precinct: T.800 B.6
    // anchors the partition absolutely (a resolution precinct maps into a
    // band by exact halving), which our encoder and decoder share; the
    // vendored decoder instead anchors at the band origin
    // (pdf.combined.js:11209-11212 subtracts subband.tbx0 — plus the
    // cbyMin branch typo at 11229 that writes cbxMin) and desyncs on this
    // class (1873/1920 samples), so the gate here is the bit-exact
    // round-trip, with the ALIGNED class cross-validated in JpxXval
    for (prog <- Seq(0, 2)) {
      val csP = JpxSynth.encode(Array(px), x1, y1, 8, 2, cbExp = 4,
        precSizes = Seq(0x44, 0x44, 0x55), xOff = xo, yOff = yo, prog = prog)
      val dP = Jpx.decode(csP)
      assert(dP.isDefined, s"prec offsets prog=$prog")
      assert(dP.get.planes(0).toSeq == px.toSeq, s"prec offsets prog=$prog")
    }
  }

  test("A.5.1 offset ordering violations reject") {
    val (w, h) = (38, 30)
    val cs = JpxSynth.encode(Array(JpxSynth.testGray(w - 6, h - 6, 3)),
      w, h, 8, 1, xOff = 6, yOff = 6)
    assert(Jpx.decode(cs).isDefined)
    val siz = findMarker(cs, 0xff51)
    // XTOsiz > XOsiz violates A.5.1 → None
    val bad = cs.clone(); bad(siz + 2 + 29) = 8
    assert(Jpx.decode(bad).isEmpty)
  }

  test("odd-origin inverse lifting matches the hand-computed F.3.8 fixture") {
    // i0 = 1, four samples at absolute 1..4 (evens {2,4} low, odds {1,3}
    // high). Spec inverse by hand with E(0)=Y(2), E(5)=Y(3) extension:
    //   X(2) = 10 − floor((7−3+2)/4)       = 9
    //   X(4) = 20 − floor((−3−3+2)/4)      = 21
    //   X(1) = 7  + floor((X(2)+X(2))/2)   = 16   (X(0) reflects to X(2))
    //   X(3) = −3 + floor((X(2)+X(4))/2)   = 12
    val ll = Array(10.0, 20.0) // absolute-even samples
    val hl = Array(7.0, -3.0) // absolute-odd samples
    val out = Jpx.inverse2D(reversible = true, ll, hl,
      Array.empty, Array.empty, 1, 5, 0, 1)
    assert(out.toSeq == Seq(16.0, 9.0, 12.0, 21.0))
    // single sample at an odd index halves (the degenerate F.3.7 rule
    // pdf.js and OpenJPEG both apply)
    val one = Jpx.inverse2D(reversible = true, Array.empty, Array(8.0),
      Array.empty, Array.empty, 3, 4, 0, 1)
    assert(one.toSeq == Seq(4.0))
  }

  test("5/3 forward/inverse round-trips exactly at every origin parity") {
    val rnd = new scala.util.Random(21)
    for ((u0, v0) <- Seq((0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (7, 7));
         (w, h) <- Seq((7, 5), (8, 6), (1, 9), (9, 1), (4, 4))) {
      val src = Array.fill(w * h)(rnd.nextInt(511) - 255)
      val (ll, hl, lh, hh) = JpxSynth.forward2D(reversible = true,
        src.map(_.toDouble), w, h, u0, v0)
      val back = Jpx.inverse2D(reversible = true, ll, hl, lh, hh,
        u0, u0 + w, v0, v0 + h)
      assert(back.map(_.toInt).toSeq == src.toSeq, s"u0=$u0 v0=$v0 ${w}x$h")
    }
  }

  test("subsampling factors beyond 8 and non-power-of-two round-trip") {
    val (w, h) = (96, 64)
    def grid(xr: Int, yr: Int, seed: Long) =
      JpxSynth.testGray(Jpx.ceilDiv(w, xr), Jpx.ceilDiv(h, yr), seed)
    // 16× chroma and odd 3×/5× factors — the spec's full range; component
    // grids are ceil-divided so sizes land on arbitrary parities
    val planes = Array(grid(1, 1, 2), grid(16, 16, 5), grid(3, 5, 8))
    val cs = JpxSynth.encode(planes, w, h, 8, 2,
      xrs = Seq(1, 16, 3), yrs = Seq(1, 16, 5))
    val d = Jpx.decodeComponents(cs)
    assert(d.isDefined)
    for (c <- 0 until 3)
      assert(d.get.planes(c).toSeq == planes(c).toSeq, s"component $c")
    // replication up to the reference grid stays within plane bounds
    val up = Jpx.decode(cs)
    assert(up.isDefined)
    assert(up.get.planes.forall(_.length == w * h))
  }

  test("odd offsets / unaligned tiles / unaligned subsampling round-trip") {
    // odd image origin: every resolution origin carries odd parity
    val px = JpxSynth.testGray(59, 45, 13)
    val cs = JpxSynth.encode(Array(px), 64, 48, 8, 2, xOff = 5, yOff = 3)
    val d = Jpx.decode(cs)
    assert(d.isDefined, "odd offsets")
    assert((d.get.w, d.get.h) == ((59, 45)))
    assert(d.get.planes(0).toSeq == px.toSeq, "odd offsets")
    // multi-tile with a tile size no power-of-two divides
    val px2 = JpxSynth.testGray(100, 70, 8)
    val csMt = JpxSynth.encode(Array(px2), 100, 70, 8, 2, cbExp = 4,
      tileW = 37, tileH = 29)
    val dMt = Jpx.decode(csMt)
    assert(dMt.isDefined, "unaligned tiles")
    assert(dMt.get.planes(0).toSeq == px2.toSeq, "unaligned tiles")
    // subsampled chroma with a tile size off the XRsiz·2^levels grid —
    // chroma tile origins land on odd component-grid positions
    val (w3, h3) = (100, 64)
    val sub = Array(JpxSynth.testGray(w3, h3, 4),
      JpxSynth.testGray(w3 / 2, h3 / 2, 6), JpxSynth.testGray(w3 / 2, h3 / 2, 9))
    val csS = JpxSynth.encode(sub, w3, h3, 8, 2, cbExp = 4, tileW = 50,
      tileH = 50, xrs = Seq(1, 2, 2), yrs = Seq(1, 2, 2))
    val dS = Jpx.decodeComponents(csS)
    assert(dS.isDefined, "unaligned subsampled tiles")
    for (c <- 0 until 3)
      assert(dS.get.planes(c).toSeq == sub(c).toSeq, s"unaligned sub c$c")
    // 9/7 at odd offsets reconstructs within tolerance
    val cs97 = JpxSynth.encode(Array(px), 64, 48, 8, 2, reversible = false,
      xOff = 5, yOff = 3)
    val d97 = Jpx.decode(cs97)
    assert(d97.isDefined, "odd offsets 9/7")
    val got = d97.get.planes(0)
    val mse = px.indices.map(i => { val e = got(i) - px(i); e.toDouble * e })
      .sum / px.length
    val psnr = 10 * math.log10(255.0 * 255 / math.max(mse, 1e-9))
    assert(psnr > 40, f"odd-offset 9/7 PSNR $psnr%.1f")
  }

  test("ROI PDF decodes through the full raster lane") {
    val pdf = JpxSynth.pdfWithJpx(64, 48, seed = 2, roi = true)
    val imgs = PdfImages.list(PdfDocument.open(pdf))
    assert(imgs.length == 1)
    val i = imgs.head
    assert((i.filter, i.colorSpace) == (("JPXDecode", "DeviceGray")))
    assert((i.decodedW, i.decodedH, i.decodedBands) == ((64, 48, 3)))
    assert(i.grayMean > 0)
  }

  // ── per-tile coding overrides (A.4.2 first-tile-part COD/COC/QCD/QCC) ──

  test("per-tile COD overrides round-trip: progression, layers, levels, block size") {
    val (w, h) = (80, 64)
    val px = JpxSynth.testGray(w, h, 31)
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, tileH = 40, // 2×2 unaligned tile grid
      tileCoding = Map(
        1 -> JpxSynth.TileCoding(prog = Some(1), sop = Some(true), eph = Some(true)),
        2 -> JpxSynth.TileCoding(layers = Some(3)),
        3 -> JpxSynth.TileCoding(levels = Some(1), cbExp = Some(3), ownQcd = true)))
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
  }

  test("tile COD drops main COCs; a tile COC overrides without one (precedence)") {
    val (w, h) = (80, 40) // 2×1 tiles
    val planes = Array(JpxSynth.testGray(w, h, 1), JpxSynth.testGray(w, h, 5),
      JpxSynth.testGray(w, h, 9))
    // main COC: segmentation symbols on comp 1; tile 1 emits a tile COD
    // (progression change) which per T.800 precedence CLEARS the main COC
    // for that tile — both encoder and decoder must agree or the cleanup
    // passes desync silently
    val csA = JpxSynth.encode(planes, w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, cocStyles = Map(1 -> 0x20),
      tileCoding = Map(1 -> JpxSynth.TileCoding(prog = Some(4))))
    val outA = Jpx.decode(csA)
    assert(outA.isDefined, "tile COD vs main COC")
    for (c <- 0 until 3)
      assert(outA.get.planes(c).toSeq == planes(c).toSeq, s"A comp $c")
    // tile COC without a tile COD: main COC still applies to the other
    // component, the tile COC turns bypass on for comp 2 in tile 0 only
    val csB = JpxSynth.encode(planes, w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, cocStyles = Map(1 -> 0x20),
      tileCoding = Map(0 -> JpxSynth.TileCoding(
        cocStyles = Some(Map(2 -> 0x01)))))
    val outB = Jpx.decode(csB)
    assert(outB.isDefined, "tile COC only")
    for (c <- 0 until 3)
      assert(outB.get.planes(c).toSeq == planes(c).toSeq, s"B comp $c")
  }

  test("a tile QCD with the tile's own exponents round-trips") {
    val (w, h) = (96, 40)
    // high-contrast left tile, near-flat right tile → genuinely different
    // exponent arrays between the main QCD and the tile QCD
    val px = Array.tabulate(w * h) { i =>
      val x = i % w
      if (x < 48) (if (((i / w) + x) % 2 == 0) 255 else 0)
      else 128 + (x % 3)
    }
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, tileCoding = Map(1 -> JpxSynth.TileCoding(ownQcd = true)))
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
  }

  test("per-tile wavelet override: 5/3 main, one 9/7 tile") {
    val (w, h) = (80, 40)
    val px = JpxSynth.testGray(w, h, 17)
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, tileCoding = Map(
        1 -> JpxSynth.TileCoding(reversible = Some(false), ownQcd = true)))
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    val got = out.get.planes(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = math.abs(got(y * w + x) - px(y * w + x))
        if (x < 48) assert(d == 0, s"5/3 tile exact at ($x,$y)")
        else assert(d <= 3, s"9/7 tile within tolerance at ($x,$y): $d")
        x += 1
      }
      y += 1
    }
  }

  test("per-tile-override PDF decodes through the full raster lane, lossless") {
    val plain = JpxSynth.pdfWithJpx(64, 48, seed = 2)
    val tiled = JpxSynth.pdfWithJpx(64, 48, seed = 2, tiles = true)
    val Seq(a, b) = Seq(plain, tiled).map { pdf =>
      val imgs = PdfImages.list(PdfDocument.open(pdf))
      assert(imgs.length == 1)
      imgs.head
    }
    assert((b.decodedW, b.decodedH, b.decodedBands) == ((64, 48, 3)))
    assert(b.grayMean == a.grayMean) // both lossless encodings of one raster
  }

  test("tile-local maxshift ROI (first-tile-part RGN) round-trips; shift is load-bearing") {
    val (w, h) = (80, 40)
    val px = JpxSynth.testGray(w, h, 13)
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, tileCoding = Map(
        1 -> JpxSynth.TileCoding(roi = Map(0 -> ((56, 8, 72, 32))))))
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
    // strip the tile RGN (FF5E, 5-byte body): the shifted magnitudes then
    // dequantize unscaled — the decode MUST differ, proving the tile
    // marker is honored rather than skipped
    var rgnAt = -1
    var i = 0
    while (rgnAt < 0 && i + 1 < cs.length) {
      if ((cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x5e) rgnAt = i
      i += 1
    }
    assert(rgnAt > 0)
    val stripped = cs.take(rgnAt) ++ cs.drop(rgnAt + 7)
    // Psot spans the removed marker: fix the length field of the SOT that
    // precedes it (second tile's SOT is the nearest FF90 before rgnAt)
    var sot = -1
    i = 0
    while (i + 1 < rgnAt) {
      if ((cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x90) sot = i
      i += 1
    }
    assert(sot > 0)
    val psot = ((stripped(sot + 6) & 0xff) << 24) | ((stripped(sot + 7) & 0xff) << 16) |
      ((stripped(sot + 8) & 0xff) << 8) | (stripped(sot + 9) & 0xff)
    val np = psot - 7
    stripped(sot + 6) = (np >>> 24).toByte
    stripped(sot + 7) = ((np >>> 16) & 0xff).toByte
    stripped(sot + 8) = ((np >>> 8) & 0xff).toByte
    stripped(sot + 9) = (np & 0xff).toByte
    val tampered = Jpx.decode(stripped)
    assert(tampered.isEmpty || tampered.get.planes(0).toSeq != px.toSeq)
  }

  test("tile-local POC volumes (first-tile-part POC) round-trip") {
    val (w, h) = (80, 40)
    val px = JpxSynth.testGray(w, h, 21)
    // tile 0 stays plain LRCP; tile 1 sequences a low-res thumbnail volume
    // before the detail volume, each in its own progression
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 48, layers = 2, tileCoding = Map(
        1 -> JpxSynth.TileCoding(poc = Seq(
          (0, 0, 2, 1, 1, 0), // r0 only, both layers, LRCP
          (1, 0, 2, 3, 1, 1))))) // r1..2, RLCP
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
  }

  test("tile-COD custom precincts round-trip (per-tile precinct grids)") {
    val (w, h) = (128, 64)
    val px = JpxSynth.testGray(w, h, 29)
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 64, tileCoding = Map(
        1 -> JpxSynth.TileCoding(precSizes = Seq(0x44, 0x44, 0x55))))
    val out = Jpx.decode(cs)
    assert(out.isDefined)
    assert(out.get.planes(0).toSeq == px.toSeq)
    // and combined with a levels override (precinct list sized to the
    // TILE's resolution count, not the main header's)
    val cs2 = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileW = 64, tileCoding = Map(
        1 -> JpxSynth.TileCoding(levels = Some(1), ownQcd = true,
          precSizes = Seq(0x44, 0x55))))
    assert(Jpx.decode(cs2).exists(_.planes(0).toSeq == px.toSeq))
  }

  test("coding markers in a non-first tile-part reject") {
    val (w, h) = (48, 40)
    val px = JpxSynth.testGray(w, h, 7)
    val cs = JpxSynth.encode(Array(px), w, h, 8, levels = 2, cbExp = 4,
      tileCoding = Map(0 -> JpxSynth.TileCoding(prog = Some(1))))
    assert(Jpx.decode(cs).exists(_.planes(0).toSeq == px.toSeq))
    val sot = findMarker(cs, 0xff90)
    assert(sot > 0 && (cs(sot + 10) & 0xff) == 0) // TPsot
    val bad = cs.clone()
    bad(sot + 10) = 1 // now a NON-first part carrying a COD: A.4.2 violation
    assert(Jpx.decode(bad).isEmpty)
  }
}
