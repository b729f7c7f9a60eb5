package graft.pdf

/** JPX (JPEG 2000, ITU-T T.800) — the last embedded-in-PDF image codec the
  * raster lane needs, implemented from the public spec for the codestream
  * subset PDF viewers actually meet:
  *
  *   - raw codestreams (SOC..EOC) and JP2 box containers (the 'jp2c' box);
  *   - SIZ/COD/COC/QCD/QCC main-header markers, single or multiple
  *     tile-parts (SOT/SOD), any of the five progression orders — realized
  *     as a stable sort of the packet list by each order's B.12 key, with
  *     precinct positions projected to the reference grid for the
  *     position-dependent orders;
  *   - custom precinct partitions (round 6 — Scod/Scoc bit 0 size bytes):
  *     per-resolution precinct grids (B.6), precinct-clamped code-block
  *     sizes (B.7), per-precinct inclusion/zero-bitplane tag trees (B.10.2)
  *     and one packet per (component, resolution, precinct, layer);
  *   - Tier-2 packet headers (B.10): bit-stuffed reader, inclusion and
  *     zero-bitplane tag trees, coding-pass counts, Lblock length codes,
  *     optional SOP/EPH marker segments;
  *   - Tier-1 EBCOT code-block decoding (Annex D): the three coding passes
  *     over sign-magnitude bitplanes with the standard ZC/SC/MR/RL/UNIFORM
  *     context model, driven by the same MQ decoder the JBIG2 lane built
  *     from T.88 Annex E (T.800 Annex C is the identical coder);
  *   - all six code-block styles (A.6.1 Table A.19, round 6): selective
  *     arithmetic bypass (raw SPP/MRP passes from pass 10, D.7 bit-stuffed
  *     reader, codeword-segment terminations around each raw run), context
  *     reset on every pass boundary, termination on each pass (one codeword
  *     segment per pass, each with its own packet-header length per
  *     B.10.7.2), vertically causal contexts (the row below the stripe
  *     reads insignificant), predictable termination (accepted — an
  *     encoder-side error-resilience property; segment structure is
  *     unchanged), and segmentation symbols;
  *   - reversible 5/3 and irreversible 9/7 inverse wavelets (Annex F
  *     lifting with symmetric extension), scalar dequantization (E.1),
  *     reversible (RCT) and irreversible (ICT) inverse component transforms,
  *     DC level shift.
  *
  * Component subsampling (XRsiz/YRsiz over the spec's full 1..255 —
  * 4:2:0/4:2:2 chroma in scanned color PDFs and beyond) IS supported:
  * every component decodes on its own sample grid
  * (T.800 B.2/B.3 ceil-divided coordinates, through resolutions, code-block
  * grids and the wavelet) and the decoded planes are replicated up to the
  * reference grid for the caller. MCT requires identical subsampling on
  * components 0-2 (the spec's own constraint). Tile grids need no
  * alignment: the wavelet is parity-general (round 6), so odd resolution
  * origins — from any tile size, offset or subsampling combination —
  * synthesize correctly.
  *
  * ROI (RGN marker, round 6) decodes by the maxshift method — the only
  * style T.800 defines (Srgn 0, Annex H): per-component SPrgn from the
  * main header; Tier-1 magnitudes at/above 2^SPrgn are ROI coefficients
  * scaled up by the encoder and are shifted back down before
  * dequantization, everything below is background (H.2 — the decoder
  * never needs the encoder's ROI mask, the magnitude threshold separates
  * the two populations by construction).
  *
  * Reference-grid offsets (XOsiz/YOsiz/XTOsiz/YTOsiz, round 6) decode at
  * ANY value meeting A.5.1's ordering: the F.3.3 interleave places
  * low-pass samples at absolute even indices and each lifting line carries
  * its origin parity (with the degenerate single-sample halving rule), so
  * odd resolution origins are first-class. The geometry is anchored
  * ABSOLUTELY throughout per the spec: code-block grids at multiples of
  * the block size (B.7), precinct partitions at multiples of 2^PPx on each
  * resolution (B.6) — where the vendored reference anchors the
  * codeblock→precinct mapping at the band origin instead
  * (pdf.combined.js:11209-11212), desyncing on offset streams whose band
  * origins land mid-precinct (and its transform is parity-blind,
  * 12665-12684, so odd-origin classes are gated by hand-computed spec
  * fixtures and bit-exact round-trips rather than cross-validation).
  *
  * POC (progression order changes, A.6.6, round 6) decodes: the B.12.3
  * volume sequencing falls out of the sort-based packet ordering — each
  * volume's not-yet-emitted packets sort by its own progression key and
  * concatenate; a POC whose volumes do not cover every packet rejects
  * (the parse would be ambiguous).
  *
  * Packed packet headers decode in BOTH forms (round 6): PPM (A.7.4) —
  * main-header segments concatenated in Zppm order, split into
  * Nppm-prefixed groups, one per tile-part in codestream order — and PPT
  * (A.7.5) — tile-part-header segments concatenated per tile in (part,
  * Zppt) order (PLT/COM tile-header markers are skipped as metadata).
  * Each packet's header bits (and EPH) then come from the tile's packed
  * stream while its codeword-segment bodies stay in the tile stream. A
  * packed stream that runs dry mid-parse rejects, as does a stream
  * carrying both PPM and PPT (A.7.4's exclusivity).
  *
  * Per-tile coding overrides decode (A.4.2, round 6): first tile-parts may
  * carry COD/COC/QCD/QCC/RGN/POC, merged per T.800's precedence — tile
  * COC > tile COD > main COC > main COD, a tile COD/QCD dropping the main
  * per-component overrides for its tile (the reference's SOT reset +
  * tile-COD clear, pdf.combined.js:11010-11011), a tile RGN overriding the
  * main RGN per component, and a tile POC replacing the main POC wholesale
  * for its tile. Coding markers in a NON-first tile-part (TPsot > 0)
  * reject per A.4.2. Note the vendored reference reads SOP/EPH from the
  * main COD only (11754-11755), so a tile-signalled SOP desyncs it — ours
  * honors the tile's flags.
  *
  * Scope (disclosed): RGN styles other than maxshift (none are defined by
  * T.800) and SPrgn above 31 (the int magnitude lane) return None — the
  * caller keeps the metadata-only row. Everything else decodes: all six
  * code-block style bits (which the reference errors on), custom
  * precincts, maxshift ROI, POC, PPM, PPT, per-tile coding overrides
  * (incl. tile RGN/POC), the full 1..255 subsampling range and arbitrary
  * grid offsets/tile grids. The reference wires its own vendored decoder
  * at pdf.combined.js:10689-12880 (stream wiring 22461-22529) — cited as the
  * semantic contract; this implementation is from the public spec and is
  * cross-validated against that decoder on encoder-generated fixtures.
  */
object Jpx {

  /** Decoded image: per-component sample planes AFTER inverse wavelet,
    * inverse component transform and DC level shift, clamped to the
    * component bit depth. Planes are row-major, full image grid (subsampled
    * components are replicated up to the reference grid). */
  final case class Decoded(w: Int, h: Int, comps: Int, bitDepth: Int,
      planes: Array[Array[Int]])

  /** Component-grid decode result (pre-replication): plane c is
    * `cw(c)×ch(c)` where `cw = ceil(Xsiz/XRsiz)` per T.800 B.2. The
    * cross-validation specs compare these against the vendored decoder's
    * per-component tiles; `decode` replicates them to the reference grid. */
  private[graft] final case class CompDecoded(w: Int, h: Int, comps: Int,
      bitDepth: Int, xr: Array[Int], yr: Array[Int],
      cw: Array[Int], ch: Array[Int], planes: Array[Array[Int]],
      /** reference-grid image origin (XOsiz/YOsiz) — 0,0 for most streams */
      x0: Int = 0, y0: Int = 0)

  // ── MQ contexts (T.800 C.2.3 / Table C-3 initial index assignments):
  // 19 contexts — ZC 0-8, SC 9-13, MR 14-16, RL 17, UNIFORM 18 ─────────────
  private[graft] final val CxZC0 = 0
  private[graft] final val CxRL = 17
  private[graft] final val CxUNI = 18

  private[graft] def freshContexts(): Array[Int] = {
    val cx = new Array[Int](19)
    cx(CxZC0) = 4 << 1
    cx(CxRL) = 3 << 1
    cx(CxUNI) = 46 << 1
    cx
  }

  // ── zero-coding context (Table D.1) — band 0=LL/LH column, 1=HL, 2=HH ────
  private[graft] def zcContext(band: Int, hRaw: Int, vRaw: Int, d: Int): Int = {
    // HL is the transpose of the LL/LH column
    val (h, v) = if (band == 1) (vRaw, hRaw) else (hRaw, vRaw)
    if (band == 2) {
      if (d >= 3) 8
      else if (d == 2) { if (h + v >= 1) 7 else 6 }
      else if (d == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else h + v }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else if (v == 2) 4
      else if (v == 1) 3
      else if (d >= 2) 2
      else d
    }
  }

  // ── sign-coding context + XOR bit (Tables D.2/D.3): hc/vc are the clamped
  // horizontal/vertical sign contributions (-1, 0, +1) ──────────────────────
  private[graft] def scContext(hc: Int, vc: Int): (Int, Int) = {
    if (hc == 1) {
      if (vc == 1) (13, 0) else if (vc == 0) (12, 0) else (11, 0)
    } else if (hc == 0) {
      if (vc == 1) (10, 0) else if (vc == 0) (9, 0) else (10, 1)
    } else {
      if (vc == 1) (11, 1) else if (vc == 0) (12, 1) else (13, 1)
    }
  }

  // ── tag tree (B.10.2) ─────────────────────────────────────────────────────
  /** Decoder-side tag tree over a w×h leaf grid. `value(i,j)` is revealed
    * incrementally against a threshold via `decodeLow`. */
  private[graft] final class TagTree(val w: Int, val h: Int) {
    // levels from leaves (0) to the single root
    val levels: Array[Array[Int]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var lw = w
      var lh = h
      while (lw > 1 || lh > 1) {
        out += new Array[Int](lw * lh)
        lw = (lw + 1) / 2
        lh = (lh + 1) / 2
      }
      out += new Array[Int](1)
      out.toArray
    }
    val widths: Array[Int] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var lw = w
      var lh = h
      while (lw > 1 || lh > 1) { out += lw; lw = (lw + 1) / 2; lh = (lh + 1) / 2 }
      out += 1
      out.toArray
    }
    // per-node lower bound state (how much is already known)
    val known: Array[Array[Int]] = levels.map(l => new Array[Int](l.length))

    /** Decode whether value(i,j) < threshold, consuming bits from `bits`;
      * returns the revealed value if < threshold, else -1 ("≥ threshold").
      * Matches the B.10.2 procedure: walk root→leaf, raising each node's
      * known lower bound one unit per 0-bit until a 1-bit pins its value. */
    def decode(bits: PacketBitReader, i: Int, j: Int, threshold: Int): Int = {
      var lower = 0
      var level = levels.length - 1
      var value = 0
      while (level >= 0) {
        val li = (i >> level)
        val lj = (j >> level)
        val idx = lj * ((widths(level))) + li
        val vals = levels(level)
        val kn = known(level)
        if (vals(idx) < lower) vals(idx) = lower
        value = vals(idx)
        var done = kn(idx) > value // value already pinned exactly
        while (!done && value < threshold) {
          if (bits.bit() == 1) { kn(idx) = value + 1; done = true }
          else { value += 1; vals(idx) = value }
        }
        vals(idx) = value
        if (value >= threshold) return -1
        lower = value
        level -= 1
      }
      value
    }
  }

  /** Packet-header bit reader with 0xFF stuffing (B.10.1: a byte following
    * 0xFF carries only 7 bits). */
  private[graft] final class PacketBitReader(data: Array[Byte], var pos: Int, end: Int) {
    private var buf = 0
    private var cnt = 0
    private var prevFF = false
    /** set once a bit was served past `end` — a packed-header stream (PPM)
      * that runs dry mid-parse is malformed, not silently all-zero */
    var exhausted = false

    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= end) {
          buf = 0; cnt = if (prevFF) 7 else 8; prevFF = false
          exhausted = true
        }
        else {
          buf = data(pos) & 0xff
          pos += 1
          cnt = if (prevFF) 7 else 8
          prevFF = buf == 0xff
        }
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Align to the next byte boundary (end of packet header). When the last
      * loaded byte was 0xFF the next byte opens with a stuffed 0 bit and
      * belongs to the header — consume it (B.10.1; same convention as the
      * reference's alignToByte). */
    def align(): Unit = {
      cnt = 0
      if (prevFF) { if (pos < end) pos += 1; prevFF = false }
    }
  }

  // ── code-block Tier-1 state ──────────────────────────────────────────────
  private[graft] final class CodeBlock(
      val x0: Int, val y0: Int, val x1: Int, val y1: Int, val band: Int,
      val gi: Int = 0, val gj: Int = 0, val prec: Int = 0) {
    var zeroBitPlanes: Int = -1 // revealed at first inclusion
    var lblock: Int = 3
    var included: Boolean = false
    var totalPasses: Int = 0
    // codeword-segment pieces across layers: (start, end, segment index)
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
  }

  /** Codeword-segment index of coding pass `pass` under the code-block style
    * (D.4.2): terminate-all → one segment per pass; selective bypass →
    * passes 0-9 (the all-MQ prefix) form segment 0, then each raw SPP+MRP
    * pair and each interleaved MQ cleanup pass terminates its own segment;
    * neither → a single segment. */
  private[graft] def segmentOf(pass: Int, bypass: Boolean, termAll: Boolean): Int =
    if (termAll) pass
    else if (!bypass || pass < 10) 0
    else { val m = pass - 10; 1 + (m / 3) * 2 + (if (m % 3 == 2) 1 else 0) }

  /** Passes that can still join the codeword segment containing `pass`
    * (itself included) — the packet header signals one length per segment
    * piece, so contributions split on these boundaries (B.10.7.2). */
  private[graft] def passesLeftInSegment(pass: Int, bypass: Boolean,
      termAll: Boolean): Int =
    if (termAll) 1
    else if (!bypass) Int.MaxValue
    else if (pass < 10) 10 - pass
    else { val m = (pass - 10) % 3; if (m == 2) 1 else 2 - m }

  /** Is coding pass `pass` raw-coded (D.7)? Only SPP/MRP passes from pass
    * 10 on, and only under selective bypass; cleanup stays MQ. */
  private[graft] def isRawPass(pass: Int, bypass: Boolean): Boolean =
    bypass && pass >= 10 && ((pass - 10) % 3) != 2

  /** Raw (arithmetic-bypass) bit reader (D.7): MSB-first with bit-stuffing —
    * a byte following 0xFF carries only 7 bits (its MSB is skipped). Reads
    * 0 past the end of the segment. */
  private[graft] final class RawBitReader(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var buf = 0
    private var cnt = 0
    private var prevFF = false
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= end) return 0
        val b = data(pos) & 0xff
        pos += 1
        cnt = if (prevFF) 7 else 8
        prevFF = b == 0xff
        buf = b
      }
      cnt -= 1
      (buf >>> cnt) & 1
    }
  }

  /** Tier-1 EBCOT decode (Annex D) of one code-block into sign-magnitude
    * coefficients. `mb` = total magnitude bitplanes; decoding starts at
    * bitplane mb-1-zeroBitPlanes and runs `passes` coding passes. `chunks`
    * are codeword-segment pieces (start, end, segIdx) in packet order; with
    * no bypass/termination style there is a single segment 0. Returns
    * row-major Int array: sign-magnitude (bit 31 = sign). */
  private[graft] def decodeBlock(data: Array[Byte], chunks: Seq[(Int, Int, Int)],
      w: Int, h: Int, band: Int, mb: Int, zeroBitPlanes: Int,
      passes: Int, cbStyle: Int = 0): Array[Int] = {
    val n = w * h
    val segSymbols = (cbStyle & 0x20) != 0
    val bypass = (cbStyle & 0x01) != 0
    val resetCtx = (cbStyle & 0x02) != 0
    val termAll = (cbStyle & 0x04) != 0
    val vcausal = (cbStyle & 0x08) != 0
    val mag = new Array[Int](n)
    val sgn = new Array[Byte](n)
    val sig = new Array[Byte](n) // 1 = significant
    val vis = new Array[Byte](n) // coded in current bitplane
    val ref = new Array[Byte](n) // has been refined once already
    // assemble each codeword segment's bytes (pieces concatenate in packet
    // order); the common single-piece single-segment case stays zero-copy
    val maxSeg = chunks.foldLeft(0)((m, c) => math.max(m, c._3))
    val segRanges = Array.fill(maxSeg + 1)(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    chunks.foreach { case (s, e, g) => if (g >= 0) segRanges(g) += ((s, e)) }
    def segmentBytes(g: Int): (Array[Byte], Int, Int) = {
      val rs = if (g <= maxSeg) segRanges(g) else null
      if (rs == null || rs.isEmpty) (Array.emptyByteArray, 0, 0)
      else if (rs.length == 1) (data, rs.head._1, rs.head._2)
      else {
        val out = new java.io.ByteArrayOutputStream()
        rs.foreach { case (s, e) => out.write(data, s, e - s) }
        val a = out.toByteArray
        (a, 0, a.length)
      }
    }
    var curSeg = -1
    var mq: Jbig2.MqDecoder = null
    var raw: RawBitReader = null
    var cx = freshContexts()
    // one stripe's context window under vertical causality: neighbors at
    // y >= stripeEnd read as insignificant
    var stripeEnd = Int.MaxValue

    def sigAt(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h || y >= stripeEnd) 0
      else sig(y * w + x)
    def signContrib(x: Int, y: Int): Int =
      if (x < 0 || x >= w || y < 0 || y >= h || y >= stripeEnd ||
        sig(y * w + x) == 0) 0
      else if (sgn(y * w + x) != 0) -1 else 1

    def neighborCounts(x: Int, y: Int): (Int, Int, Int) = {
      val hN = sigAt(x - 1, y) + sigAt(x + 1, y)
      val vN = sigAt(x, y - 1) + sigAt(x, y + 1)
      val dN = sigAt(x - 1, y - 1) + sigAt(x + 1, y - 1) +
        sigAt(x - 1, y + 1) + sigAt(x + 1, y + 1)
      (hN, vN, dN)
    }

    def decodeSign(x: Int, y: Int): Unit = {
      val hc = math.max(-1, math.min(1, signContrib(x - 1, y) + signContrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, signContrib(x, y - 1) + signContrib(x, y + 1)))
      val (c, xor) = scContext(hc, vc)
      val bit = mq.decode(cx, c) ^ xor
      sgn(y * w + x) = bit.toByte
    }

    val firstPlane = mb - 1 - zeroBitPlanes
    var plane = firstPlane
    var pass = 0
    // the FIRST pass of the first coded bitplane is a cleanup pass; then
    // SPP, MRP, CP per plane (D.2)
    var passKind = 2
    while (pass < passes && plane >= 0) {
      val bitVal = 1 << plane
      val seg = segmentOf(pass, bypass, termAll)
      if (seg != curSeg) {
        curSeg = seg
        val (sd, ss, se) = segmentBytes(seg)
        if (isRawPass(pass, bypass)) { raw = new RawBitReader(sd, ss, se); mq = null }
        else { mq = new Jbig2.MqDecoder(sd, ss, se); raw = null }
      }
      if (resetCtx && pass > 0) cx = freshContexts()
      val rawMode = raw != null
      passKind match {
        case 0 => // significance propagation
          var y0s = 0
          while (y0s < h) {
            stripeEnd = if (vcausal) y0s + 4 else Int.MaxValue
            var x = 0
            while (x < w) {
              var dy = 0
              while (dy < 4 && y0s + dy < h) {
                val y = y0s + dy
                val i = y * w + x
                if (sig(i) == 0) {
                  val (hN, vN, dN) = neighborCounts(x, y)
                  if (hN + vN + dN > 0) {
                    if (rawMode) {
                      // raw SPP (D.7): significance bit, then the sign bit
                      // directly (no context, no prediction)
                      if (raw.bit() == 1) {
                        sig(i) = 1
                        mag(i) = bitVal
                        sgn(i) = raw.bit().toByte
                      }
                    } else {
                      val c = zcContext(band, hN, vN, dN)
                      if (mq.decode(cx, c) == 1) {
                        sig(i) = 1
                        mag(i) = bitVal
                        decodeSign(x, y)
                      }
                    }
                    vis(i) = 1
                  }
                }
                dy += 1
              }
              x += 1
            }
            y0s += 4
          }
        case 1 => // magnitude refinement
          var y0s = 0
          while (y0s < h) {
            stripeEnd = if (vcausal) y0s + 4 else Int.MaxValue
            var x = 0
            while (x < w) {
              var dy = 0
              while (dy < 4 && y0s + dy < h) {
                val y = y0s + dy
                val i = y * w + x
                if (sig(i) == 1 && vis(i) == 0) {
                  if (rawMode) {
                    // raw MRP (D.7): the refinement bit itself
                    if (raw.bit() == 1) mag(i) |= bitVal
                  } else {
                    val c =
                      if (ref(i) != 0) 16
                      else {
                        val (hN, vN, dN) = neighborCounts(x, y)
                        if (hN + vN + dN > 0) 15 else 14
                      }
                    if (mq.decode(cx, c) == 1) mag(i) |= bitVal
                  }
                  ref(i) = 1
                }
                dy += 1
              }
              x += 1
            }
            y0s += 4
          }
        case _ => // cleanup
          var y0s = 0
          while (y0s < h) {
            stripeEnd = if (vcausal) y0s + 4 else Int.MaxValue
            var x = 0
            while (x < w) {
              // run-length mode: full 4-high column, nothing visited or
              // significant, zero neighborhoods throughout (D.4.1)
              var rlEligible = y0s + 3 < h
              var dy = 0
              while (rlEligible && dy < 4) {
                val y = y0s + dy
                val i = y * w + x
                if (sig(i) != 0 || vis(i) != 0) rlEligible = false
                else {
                  val (hN, vN, dN) = neighborCounts(x, y)
                  if (hN + vN + dN > 0) rlEligible = false
                }
                dy += 1
              }
              var start = 0
              var skipColumn = false
              if (rlEligible) {
                if (mq.decode(cx, CxRL) == 0) skipColumn = true
                else {
                  start = (mq.decode(cx, CxUNI) << 1) | mq.decode(cx, CxUNI)
                  // the first significant row's coefficient becomes
                  // significant with no ZC bit
                  val y = y0s + start
                  val i = y * w + x
                  sig(i) = 1
                  mag(i) = bitVal
                  decodeSign(x, y)
                  start += 1
                }
              }
              if (!skipColumn) {
                var dy2 = start
                while (dy2 < 4 && y0s + dy2 < h) {
                  val y = y0s + dy2
                  val i = y * w + x
                  if (sig(i) == 0 && vis(i) == 0) {
                    val (hN, vN, dN) = neighborCounts(x, y)
                    val c = zcContext(band, hN, vN, dN)
                    if (mq.decode(cx, c) == 1) {
                      sig(i) = 1
                      mag(i) = bitVal
                      decodeSign(x, y)
                    }
                  }
                  dy2 += 1
                }
              }
              x += 1
            }
            y0s += 4
          }
          // segmentation symbol (D.6): 4 UNIFORM bits ending each cleanup
          // pass; the value (0xA) is error-detection only — consume it
          if (segSymbols) {
            var k = 0
            while (k < 4) { mq.decode(cx, CxUNI); k += 1 }
          }
          java.util.Arrays.fill(vis, 0.toByte)
      }
      if (passKind == 2) { plane -= 1; passKind = 0 } else passKind += 1
      pass += 1
    }
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = if (sgn(i) != 0) mag(i) | Int.MinValue else mag(i)
      i += 1
    }
    out
  }

  // ── inverse wavelets (Annex F) ───────────────────────────────────────────

  /** In-place inverse 5/3 lifting over one line of interleaved coefficients
    * (even = low-pass, odd = high-pass), symmetric extension. */
  /** In-place inverse 5/3 lifting (F.3.8.2.1) over a line whose ABSOLUTE
    * origin has parity `p` (0 = starts on a low-pass sample, 1 = high-pass
    * first — round 6's odd-origin support). The F.3.7 whole-sample
    * symmetric extension reflects about the interval endpoints regardless
    * of parity; a single sample at an odd index halves (the degenerate
    * rule every conformant decoder shares). */
  private def inv53Line(x: Array[Double], n: Int, p: Int = 0): Unit = {
    if (n == 1) {
      if (p == 1) x(0) = x(0) / 2
      return
    }
    def at(i: Int): Double = {
      // whole-sample symmetric extension
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      x(j)
    }
    // x[2n] -= floor((x[2n-1] + x[2n+1] + 2) / 4) — 2n ABSOLUTE even
    var i = p
    while (i < n) {
      x(i) = x(i) - math.floor((at(i - 1) + at(i + 1) + 2) / 4)
      i += 2
    }
    i = 1 - p
    while (i < n) {
      x(i) = x(i) + math.floor((at(i - 1) + at(i + 1)) / 2)
      i += 2
    }
  }

  // 9/7 lifting constants (Table F.4) — shared with the fixture encoder so
  // the codec pair can never desynchronize on a precision tweak
  private[graft] final val A97 = -1.586134342059924
  private[graft] final val B97 = -0.052980118572961
  private[graft] final val G97 = 0.882911075530934
  private[graft] final val D97 = 0.443506852043971
  private[graft] final val K97 = 1.230174104914001

  /** In-place inverse 9/7 lifting (F.4.8.2), symmetric extension; `p` is
    * the line's absolute origin parity, as in inv53Line. */
  private def inv97Line(x: Array[Double], n: Int, p: Int = 0): Unit = {
    if (n == 1) {
      if (p == 1) x(0) *= 0.5
      return
    }
    def at(i: Int): Double = {
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      x(j)
    }
    var i = p
    while (i < n) { x(i) *= K97; i += 2 }
    i = 1 - p
    while (i < n) { x(i) /= K97; i += 2 }
    i = p
    while (i < n) { x(i) -= D97 * (at(i - 1) + at(i + 1)); i += 2 }
    i = 1 - p
    while (i < n) { x(i) -= G97 * (at(i - 1) + at(i + 1)); i += 2 }
    i = p
    while (i < n) { x(i) -= B97 * (at(i - 1) + at(i + 1)); i += 2 }
    i = 1 - p
    while (i < n) { x(i) -= A97 * (at(i - 1) + at(i + 1)); i += 2 }
  }

  /** One inverse 2D composition step (F.3.2 2D_SR): `ll` is the lower
    * resolution (w0×h0); hl/lh/hh the detail subbands. u0/v0/u1/v1 are the
    * composed-grid coordinates at this level — ARBITRARY parity since
    * round 6: the F.3.3 interleave places low-pass samples at absolute
    * even indices (a column is low-pass iff u0+x is even), and the lifting
    * lines carry their origin parity. */
  private[graft] def inverse2D(reversible: Boolean,
      ll: Array[Double], hl: Array[Double], lh: Array[Double], hh: Array[Double],
      u0: Int, u1: Int, v0: Int, v1: Int): Array[Double] = {
    val w = u1 - u0
    val h = v1 - v0
    val w0 = ceilDiv2(u1) - ceilDiv2(u0) // low-pass columns
    val h0 = ceilDiv2(v1) - ceilDiv2(v0)
    val wH = w - w0
    val hH = h - h0
    val px = u0 & 1
    val py = v0 & 1
    val a = new Array[Double](w * h)
    // 2D interleave (F.3.3): ABSOLUTE even indices take low-pass samples;
    // low column for even au is au/2 − ceil(u0/2), high column for odd au
    // is (au−1)/2 − floor(u0/2) (B.5's band coordinates)
    var y = 0
    while (y < h) {
      val av = v0 + y
      val rL = (av >> 1) - ((v0 + 1) >> 1)
      val rH = ((av - 1) >> 1) - (v0 >> 1)
      var x = 0
      while (x < w) {
        val au = u0 + x
        val cL = (au >> 1) - ((u0 + 1) >> 1)
        val cH = ((au - 1) >> 1) - (u0 >> 1)
        val v =
          if ((av & 1) == 0 && (au & 1) == 0) ll(rL * w0 + cL)
          else if ((av & 1) == 0) { if (wH > 0) hl(rL * wH + cH) else 0.0 }
          else if ((au & 1) == 0) { if (hH > 0) lh(rH * w0 + cL) else 0.0 }
          else { if (wH > 0 && hH > 0) hh(rH * wH + cH) else 0.0 }
        a(y * w + x) = v
        x += 1
      }
      y += 1
    }
    // horizontal then vertical lifting (F.3.4: HOR_SR rows, then VER_SR cols)
    val line = new Array[Double](math.max(w, h))
    y = 0
    while (y < h) {
      System.arraycopy(a, y * w, line, 0, w)
      if (reversible) inv53Line(line, w, px) else inv97Line(line, w, px)
      System.arraycopy(line, 0, a, y * w, w)
      y += 1
    }
    var x = 0
    while (x < w) {
      var yy = 0
      while (yy < h) { line(yy) = a(yy * w + x); yy += 1 }
      if (reversible) inv53Line(line, h, py) else inv97Line(line, h, py)
      yy = 0
      while (yy < h) { a(yy * w + x) = line(yy); yy += 1 }
      x += 1
    }
    a
  }

  private[graft] def ceilDiv2(x: Int): Int = (x + 1) >> 1
  private[graft] def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  // ── codestream structures ────────────────────────────────────────────────
  private final case class Siz(w: Int, h: Int, x0: Int, y0: Int,
      xt: Int, yt: Int, xto: Int, yto: Int,
      comps: Int, depth: Array[Int], signed: Array[Boolean],
      xr: Array[Int], yr: Array[Int])

  private final case class Cod(progression: Int, layers: Int, mct: Int,
      levels: Int, xcb: Int, ycb: Int, cbStyle: Int, reversible: Boolean,
      sop: Boolean, eph: Boolean,
      /** Custom precinct size bytes, one per resolution 0..levels (PPx in
        * the low nibble, PPy high — A.6.1); null = the 2^15 defaults. */
      precSizes: Array[Int] = null) {
    /** Segmentation symbols (style bit 0x20): a 4-bit error-detection
      * symbol after each cleanup pass — supported, like the reference. */
    def segSymbols: Boolean = (cbStyle & 0x20) != 0
    /** Selective arithmetic bypass (0x1): SPP/MRP passes from pass 10 on
      * are raw-coded (D.7), with codeword-segment terminations around each
      * raw run and each interleaved cleanup pass (D.4.2). */
    def bypass: Boolean = (cbStyle & 0x01) != 0
    /** Reset context probabilities on every coding-pass boundary (0x2). */
    def resetCtx: Boolean = (cbStyle & 0x02) != 0
    /** Termination on each coding pass (0x4): every pass is its own
      * codeword segment, each with its own length in the packet header. */
    def termAll: Boolean = (cbStyle & 0x04) != 0
    /** Vertically causal context (0x8): context formation treats the row
      * below the current 4-row stripe as insignificant (D.4.2). */
    def vcausal: Boolean = (cbStyle & 0x08) != 0
    def ppx(r: Int): Int =
      if (precSizes == null) 15 else precSizes(math.min(r, precSizes.length - 1)) & 0xf
    def ppy(r: Int): Int =
      if (precSizes == null) 15 else (precSizes(math.min(r, precSizes.length - 1)) >> 4) & 0xf
  }

  /** One POC progression volume (A.6.6): resolutions [rs, re), components
    * [cs, ce), layers [0, lye), sequenced in progression `prog`. */
  private[graft] final case class Poc(rs: Int, cs: Int, lye: Int,
      re: Int, ce: Int, prog: Int)

  private final case class Qcd(style: Int, guard: Int,
      exponents: Array[Int], mantissas: Array[Int])

  /** One band-side precinct: the tag trees (per B.10.2 one inclusion + one
    * zero-bitplane tree per precinct per band) plus the code-block grid
    * window they cover. Null entries = no code-blocks of this band fall in
    * that precinct (its packets read the single empty/non-empty bit only). */
  private final class BandPrecinct(val iMin: Int, val jMin: Int,
      val nw: Int, val nh: Int) {
    val inclTree = new TagTree(nw, nh)
    val zbpTree = new TagTree(nw, nh)
  }

  private final class Band(val kind: Int, // 0 LL, 1 HL, 2 LH, 3 HH
      val x0: Int, val y0: Int, val x1: Int, val y1: Int,
      val blocks: Array[CodeBlock],
      val bw: Int, val bh: Int, // block grid dims
      val precincts: Array[BandPrecinct])

  private final class Resolution(val r: Int,
      val x0: Int, val y0: Int, val x1: Int, val y1: Int,
      val bands: Array[Band],
      /** Precinct grid of this resolution (B.6): columns, rows, and the
        * 2^ppx × 2^ppy partition anchored at 0 on the resolution grid. */
      val npw: Int, val nph: Int, val ppx: Int, val ppy: Int) {
    def numPrec: Int = npw * nph
  }

  /** Decode a JPX payload (raw codestream or JP2 box container). Returns
    * None for anything outside the supported subset or malformed input —
    * the never-fail discipline the whole raster lane follows. */
  def decode(data: Array[Byte]): Option[Decoded] =
    decodeComponents(data).map(upsample)

  /** Component-grid decode (planes NOT replicated to the reference grid) —
    * the surface the subsampling cross-validation specs compare. */
  private[graft] def decodeComponents(data: Array[Byte]): Option[CompDecoded] =
    try decodeImpl(data)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Replicate component-grid planes up to the reference grid: image pixel
    * (x, y) at absolute reference position (x0+x, y0+y) takes component
    * sample floor((x0+x)/XRsiz) — the standard nearest-sample expansion —
    * clamped to the component grid (whose origin ceil(x0/XRsiz) can sit one
    * sample past the floor-mapped position when x0 is off the sampling
    * grid). */
  private def upsample(cd: CompDecoded): Decoded = {
    val planes = Array.tabulate(cd.comps) { c =>
      if (cd.xr(c) == 1 && cd.yr(c) == 1) cd.planes(c)
      else {
        val out = new Array[Int](cd.w * cd.h)
        val src = cd.planes(c)
        val cw = cd.cw(c)
        val ch = cd.ch(c)
        val cx0 = ceilDiv(cd.x0, cd.xr(c))
        val cy0 = ceilDiv(cd.y0, cd.yr(c))
        var y = 0
        while (y < cd.h) {
          val sy = math.min(ch - 1, math.max(0, (cd.y0 + y) / cd.yr(c) - cy0))
          val srow = sy * cw
          val drow = y * cd.w
          var x = 0
          while (x < cd.w) {
            val sx = math.min(cw - 1, math.max(0, (cd.x0 + x) / cd.xr(c) - cx0))
            out(drow + x) = src(srow + sx)
            x += 1
          }
          y += 1
        }
        out
      }
    }
    Decoded(cd.w, cd.h, cd.comps, cd.bitDepth, planes)
  }

  private def u16(d: Array[Byte], p: Int): Int = ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)
  private def u32(d: Array[Byte], p: Int): Long =
    ((d(p) & 0xffL) << 24) | ((d(p + 1) & 0xffL) << 16) | ((d(p + 2) & 0xffL) << 8) | (d(p + 3) & 0xffL)

  /** Find the contiguous codestream: raw SOC..EOC, or the first 'jp2c' box. */
  private def findCodestream(data: Array[Byte]): Option[(Int, Int)] = {
    if (data.length < 4) return None
    if ((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0x4f) return Some((0, data.length))
    // ISO base media boxes: [len(4)][type(4)]; len 0 = to EOF, len 1 = XL
    var p = 0
    while (p + 8 <= data.length) {
      var len = u32(data, p)
      val typ = u32(data, p + 4)
      var hdr = 8
      if (len == 1 && p + 16 <= data.length) {
        val xl = (u32(data, p + 8) << 32) | u32(data, p + 12)
        len = xl
        hdr = 16
      }
      val end = if (len == 0) data.length else (p + len).toInt
      if (end <= p || end > data.length) return None
      if (typ == 0x6a703263L) return Some((p + hdr, end)) // 'jp2c'
      p = end
    }
    None
  }

  private def decodeImpl(data: Array[Byte]): Option[CompDecoded] = {
    val (cs, csEnd) = findCodestream(data).getOrElse(return None)
    var p = cs
    if (p + 2 > csEnd || u16(data, p) != 0xff4f) return None
    p += 2
    var siz: Siz = null
    var cod: Cod = null
    val codPerComp = scala.collection.mutable.HashMap.empty[Int, Cod]
    var qcd: Qcd = null
    val qcdPerComp = scala.collection.mutable.HashMap.empty[Int, Qcd]
    // RGN (ROI, maxshift): per-component implicit shift SPrgn (H.2)
    val roiPerComp = scala.collection.mutable.HashMap.empty[Int, Int]
    // POC (A.6.6): progression order changes, main header
    val pocs = scala.collection.mutable.ArrayBuffer.empty[Poc]
    // PPM (A.7.4): packed packet headers, (Zppm, payload) per segment
    val ppmChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    // PPT (A.7.5): per-tile-part packed headers, (part ordinal, Zppt, bytes)
    val pptChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Array[Byte])]
    // tile-part data segments in codestream order: (tileIdx, start, end)
    val tileParts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]

    def parseQ(q: Array[Byte], s: Int, e: Int): Qcd = {
      val sq = q(s) & 0xff
      val style = sq & 0x1f
      val guard = sq >>> 5
      style match {
        case 0 => // no quantization: one byte per subband, exponent in high 5
          val n = e - s - 1
          val exps = Array.tabulate(n)(i => (q(s + 1 + i) & 0xff) >>> 3)
          Qcd(0, guard, exps, Array.fill(n)(0))
        case 1 => // scalar derived: a single (exp, mantissa) pair
          val v = u16(q, s + 1)
          Qcd(1, guard, Array(v >>> 11), Array(v & 0x7ff))
        case _ => // scalar expounded: one pair per subband
          val n = (e - s - 1) / 2
          val exps = new Array[Int](n)
          val mans = new Array[Int](n)
          var i = 0
          while (i < n) {
            val v = u16(q, s + 1 + 2 * i)
            exps(i) = v >>> 11
            mans(i) = v & 0x7ff
            i += 1
          }
          Qcd(2, guard, exps, mans)
      }
    }

    /** COD segment body (A.6.1) at `s` (the Lcod position). Null = reject. */
    def parseCodSeg(s: Int, e: Int): Cod = {
      val scod = data(s + 2) & 0xff
      val prog = data(s + 3) & 0xff
      val layers = u16(data, s + 4)
      val mct = data(s + 6) & 0xff
      val levels = data(s + 7) & 0xff
      val xcb = (data(s + 8) & 0x0f) + 2
      val ycb = (data(s + 9) & 0x0f) + 2
      val cbStyle = data(s + 10) & 0xff
      val wavelet = data(s + 11) & 0xff
      // custom precinct partition (Scod bit 0): one size byte per
      // resolution; PPx/PPy must be ≥ 1 above resolution 0 (B.6)
      val precSizes: Array[Int] =
        if ((scod & 1) == 0) null
        else {
          if (s + 12 + levels + 1 > e) return null
          val ps = Array.tabulate(levels + 1)(i => data(s + 12 + i) & 0xff)
          if (ps.indices.exists(r => r > 0 && ((ps(r) & 0xf) < 1 || (ps(r) >> 4) < 1)))
            return null
          ps
        }
      // 1 << shift wraps at 32 on the JVM: cap the subset at 30.
      // All six defined code-block style bits (A.6.1 Table A.19) are
      // supported: bypass 0x1, context reset 0x2, terminate-all 0x4,
      // vertically causal 0x8, predictable termination 0x10 (an
      // encoder-side error-resilience property — segment structure
      // is unchanged, so decoding needs no special handling), and
      // segmentation symbols 0x20
      if (levels > 30 || xcb + ycb > 12 || (cbStyle & ~0x3f) != 0) return null
      if (layers < 1 || prog > 4) return null
      Cod(prog, layers, mct, levels, xcb, ycb, cbStyle,
        wavelet == 1, (scod & 2) != 0, (scod & 4) != 0, precSizes)
    }

    /** COC segment body (A.6.2) at `s`; SGcod fields copy from `base`
      * (which COD governs this scope). Null = reject. */
    def parseCocSeg(s: Int, e: Int, base: Cod): (Int, Cod) = {
      if (siz == null || base == null) return null
      val (ci, off) =
        if (siz.comps < 257) (data(s + 2) & 0xff, s + 3)
        else (u16(data, s + 2), s + 4)
      val scoc = data(off) & 0xff
      val levels = data(off + 1) & 0xff
      val xcb = (data(off + 2) & 0x0f) + 2
      val ycb = (data(off + 3) & 0x0f) + 2
      val cbStyle = data(off + 4) & 0xff
      val wavelet = data(off + 5) & 0xff
      if (levels > 30 || xcb + ycb > 12 || (cbStyle & ~0x3f) != 0) return null
      val precSizesC: Array[Int] =
        if ((scoc & 1) == 0) null
        else {
          if (off + 6 + levels + 1 > e) return null
          val ps = Array.tabulate(levels + 1)(i => data(off + 6 + i) & 0xff)
          if (ps.indices.exists(r => r > 0 && ((ps(r) & 0xf) < 1 || (ps(r) >> 4) < 1)))
            return null
          ps
        }
      (ci, base.copy(levels = levels, xcb = xcb, ycb = ycb,
        cbStyle = cbStyle, reversible = wavelet == 1, precSizes = precSizesC))
    }

    /** RGN segment body (A.6.3) at `s`; null = reject. Srgn 0 is the only
      * style T.800 defines; shifts above 31 would overflow the int
      * magnitude lane — metadata-only then. */
    def parseRgnSeg(s: Int): (Int, Int) = {
      if (siz == null) return null
      val (ci, off) =
        if (siz.comps < 257) (data(s + 2) & 0xff, s + 3)
        else (u16(data, s + 2), s + 4)
      val srgn = data(off) & 0xff
      val sprgn = data(off + 1) & 0xff
      if (srgn != 0 || sprgn > 31) return null
      (ci, sprgn)
    }

    /** POC segment body (A.6.6) at `s`, entries appended to `into`.
      * False = reject. */
    def parsePocSeg(s: Int, e: Int,
        into: scala.collection.mutable.ArrayBuffer[Poc]): Boolean = {
      if (siz == null) return false
      val entry = if (siz.comps < 257) 7 else 9
      val len = e - s
      if (len - 2 < entry || (len - 2) % entry != 0) return false
      var q = s + 2
      while (q < e) {
        val rs = data(q) & 0xff
        val (cs0, q1) =
          if (siz.comps < 257) (data(q + 1) & 0xff, q + 2)
          else (u16(data, q + 1), q + 3)
        val lye = u16(data, q1)
        val re = data(q1 + 2) & 0xff
        val (ceRaw, q2) =
          if (siz.comps < 257) (data(q1 + 3) & 0xff, q1 + 4)
          else (u16(data, q1 + 3), q1 + 5)
        val pp = data(q2) & 0xff
        val ce = math.min(ceRaw, siz.comps)
        if (pp > 4 || rs >= re || cs0 >= ce || lye == 0) return false
        into += Poc(rs, cs0, lye, re, ce, pp)
        q = q2 + 1
      }
      true
    }

    // per-tile coding overrides (A.4.2: first tile-part headers may carry
    // COD/COC/QCD/QCC/RGN/POC; T.800's precedence — tile COC > tile COD >
    // main COC > main COD, a tile COD/QCD dropping the main per-component
    // overrides for that tile, a tile RGN overriding the main RGN per
    // component, a tile POC replacing the main POC for its tile — is
    // realized at the decodeTile call site)
    val tileCod = scala.collection.mutable.HashMap.empty[Int, Cod]
    val tileCoc = scala.collection.mutable.HashMap.empty[(Int, Int), Cod]
    val tileQcd = scala.collection.mutable.HashMap.empty[Int, Qcd]
    val tileQcc = scala.collection.mutable.HashMap.empty[(Int, Int), Qcd]
    val tileRoi = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    val tilePocs = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Poc]]

    var sawEoc = false
    while (!sawEoc && p + 2 <= csEnd) {
      val marker = u16(data, p)
      p += 2
      marker match {
        case 0xffd9 => sawEoc = true
        case 0xff93 => return None // SOD before SOT
        case _ =>
          if (p + 2 > csEnd) return None
          val len = u16(data, p)
          val segEnd = p + len
          if (segEnd > csEnd || len < 2) return None
          marker match {
            case 0xff51 => // SIZ (p sits at Lsiz; Rsiz at p+2, Xsiz at p+4)
              val w = u32(data, p + 4).toInt
              val h = u32(data, p + 8).toInt
              val x0 = u32(data, p + 12).toInt
              val y0 = u32(data, p + 16).toInt
              val xt = u32(data, p + 20).toInt
              val yt = u32(data, p + 24).toInt
              val xto = u32(data, p + 28).toInt
              val yto = u32(data, p + 32).toInt
              val nc = u16(data, p + 36)
              if (nc < 1 || nc > 4) return None
              val depth = new Array[Int](nc)
              val signed = new Array[Boolean](nc)
              val xrs = new Array[Int](nc)
              val yrs = new Array[Int](nc)
              var c = 0
              while (c < nc) {
                val ss = data(p + 38 + 3 * c) & 0xff
                depth(c) = (ss & 0x7f) + 1
                signed(c) = (ss & 0x80) != 0
                xrs(c) = data(p + 39 + 3 * c) & 0xff
                yrs(c) = data(p + 40 + 3 * c) & 0xff
                // component subsampling: the spec's full 1..255 range (the
                // grids are all ceil-divided B.2/B.3 coordinates and the
                // wavelet is parity-general, so no factor is special);
                // 0 is A.5.1-illegal
                if (xrs(c) < 1 || yrs(c) < 1) return None
                c += 1
              }
              if (w <= x0 || h <= y0 || w.toLong * h > 64L * 1024 * 1024) return None
              // mixed per-component depths: out of subset (the caller scales
              // every plane by component 0's depth) -> metadata-only row;
              // depths past 16 would wrap the final-clamp shifts at 32
              if (depth.distinct.length != 1) return None
              if (depth(0) < 1 || depth(0) > 16) return None
              siz = Siz(w, h, x0, y0, xt, yt, xto, yto, nc, depth, signed,
                xrs, yrs)
            case 0xff52 => // COD
              cod = parseCodSeg(p, segEnd)
              if (cod == null) return None
            case 0xff53 => // COC
              parseCocSeg(p, segEnd, cod) match {
                case null => return None
                case (ci, c) => codPerComp(ci) = c
              }
            case 0xff5c => qcd = parseQ(data, p + 2, segEnd)
            case 0xff5d =>
              if (siz == null) return None
              val (ci, off) =
                if (siz.comps < 257) (data(p + 2) & 0xff, p + 3)
                else (u16(data, p + 2), p + 4)
              qcdPerComp(ci) = parseQ(data, off, segEnd)
            case 0xff5e => // RGN (ROI): maxshift method (A.6.3 / Annex H)
              parseRgnSeg(p) match {
                case null => return None
                case (ci, sprgn) => roiPerComp(ci) = sprgn
              }
            case 0xff90 => // SOT
              val tileIdx = u16(data, p + 2)
              val psot0 = u32(data, p + 4).toInt
              // Psot 0 = "to EOC" (last tile-part)
              val tpEnd = if (psot0 == 0) {
                // scan backwards assumption: EOC is the last 2 bytes
                if (csEnd - 2 >= p && u16(data, csEnd - 2) == 0xffd9) csEnd - 2 else csEnd
              } else p - 2 + psot0
              if (tpEnd > csEnd) return None
              // tile-part header markers between SOT and SOD (round 6):
              // PPT collects this part's packed packet headers, PLT/COM are
              // metadata, and FIRST tile-parts (TPsot 0) may override the
              // coding style per A.4.2 — COD/COC/QCD/QCC collected in two
              // passes (COD/QCD first) since the header fixes no marker
              // order. RGN-in-tile and POC-in-tile stay out of subset.
              val tpsot = data(p + 8) & 0xff
              val hdrSegs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
              var tp = segEnd
              var sod = -1
              while (sod < 0) {
                if (tp + 2 > tpEnd) return None
                u16(data, tp) match {
                  case 0xff93 => sod = tp + 2
                  case m =>
                    if (tp + 4 > tpEnd) return None
                    val l = u16(data, tp + 2)
                    if (l < 2 || tp + 2 + l > tpEnd) return None
                    m match {
                      case 0xff61 => // PPT: Zppt + packed header bytes
                        if (l < 3) return None
                        pptChunks += ((tileParts.length, data(tp + 4) & 0xff,
                          java.util.Arrays.copyOfRange(data, tp + 5, tp + 2 + l)))
                      case 0xff58 | 0xff64 => () // PLT / COM: skipped
                      case 0xff52 | 0xff53 | 0xff5c | 0xff5d | 0xff5e | 0xff5f =>
                        // coding markers are first-tile-part-only (A.4.2)
                        if (tpsot != 0) return None
                        hdrSegs += ((m, tp + 2, tp + 2 + l))
                      case _ => return None // unknown tile-header marker
                    }
                    tp += 2 + l
                }
              }
              hdrSegs.foreach { case (m, s, e) => // pass 1: COD / QCD / RGN / POC
                m match {
                  case 0xff52 =>
                    val c = parseCodSeg(s, e)
                    if (c == null) return None
                    tileCod(tileIdx) = c
                  case 0xff5c => tileQcd(tileIdx) = parseQ(data, s + 2, e)
                  case 0xff5e =>
                    parseRgnSeg(s) match {
                      case null => return None
                      case (ci, sprgn) => tileRoi((tileIdx, ci)) = sprgn
                    }
                  case 0xff5f =>
                    if (!parsePocSeg(s, e, tilePocs.getOrElseUpdate(tileIdx,
                      scala.collection.mutable.ArrayBuffer.empty[Poc]))) return None
                  case _ => ()
                }
              }
              hdrSegs.foreach { case (m, s, e) => // pass 2: COC / QCC
                m match {
                  case 0xff53 =>
                    parseCocSeg(s, e, tileCod.getOrElse(tileIdx, cod)) match {
                      case null => return None
                      case (ci, c) => tileCoc((tileIdx, ci)) = c
                    }
                  case 0xff5d =>
                    if (siz == null) return None
                    val (ci, off) =
                      if (siz.comps < 257) (data(s + 2) & 0xff, s + 3)
                      else (u16(data, s + 2), s + 4)
                    tileQcc((tileIdx, ci)) = parseQ(data, off, e)
                  case _ => ()
                }
              }
              tileParts += ((tileIdx, sod, tpEnd))
            case 0xff5f => // POC (A.6.6): progression order changes
              if (!parsePocSeg(p, segEnd, pocs)) return None
            case 0xff60 => // PPM (A.7.4): packed packet headers, round 6
              if (len < 3) return None
              val z = data(p + 2) & 0xff
              ppmChunks += ((z,
                java.util.Arrays.copyOfRange(data, p + 3, segEnd)))
            // (PPT/PLT live in tile-part headers, which the SOT→SOD subset
            // check already bounds; TLM/PLM/COM/CRG are pure metadata.)
            case _ => () // COM, TLM, PLM, CRG ... skipped
          }
          p = marker match {
            case 0xff90 =>
              val (_, _, tpEnd) = tileParts.last
              tpEnd
            case _ => segEnd
          }
      }
    }
    if (siz == null || cod == null || qcd == null || tileParts.isEmpty) return None
    // Grid offsets (round 6): XOsiz/YOsiz/XTOsiz/YTOsiz decode at ANY value
    // meeting A.5.1's ordering — the wavelet carries each line's absolute
    // origin parity (F.3.3 interleave + F.3.8 lifting phase), so odd
    // resolution origins are first-class. Note the reference's vendored
    // transform mis-decodes odd origins (its interleave is parity-blind
    // outside the width-1 halving special case, pdf.combined.js:12665-12684);
    // even-preserving offsets are cross-validated against it, odd-parity
    // classes against hand-computed spec fixtures + round-trips.
    if (siz.x0 < 0 || siz.y0 < 0 || siz.xto < 0 || siz.yto < 0 ||
      siz.xto > siz.x0 || siz.yto > siz.y0) return None // A.5.1 ordering
    // MCT mixes components sample-for-sample: the spec only permits it when
    // components 0-2 share a sampling grid
    if (cod.mct == 1 && siz.comps >= 3 &&
      (1 until 3).exists(c => siz.xr(c) != siz.xr(0) || siz.yr(c) != siz.yr(0)))
      return None

    // multi-tile grids need no alignment since round 6's parity-general
    // wavelet: each tile-component's resolution origins carry their own
    // parity through the synthesis
    val numXTiles = ceilDiv(siz.w - siz.xto, siz.xt)
    val numYTiles = ceilDiv(siz.h - siz.yto, siz.yt)
    if (numXTiles < 1 || numYTiles < 1 || numXTiles.toLong * numYTiles > 65535) return None

    val imgW = siz.w - siz.x0
    val imgH = siz.h - siz.y0
    // per-component sample grids (B.2): plane c covers
    // [ceil(XOsiz/XRsiz), ceil(Xsiz/XRsiz)) × the same vertically
    val compX0 = Array.tabulate(siz.comps)(c => ceilDiv(siz.x0, siz.xr(c)))
    val compY0 = Array.tabulate(siz.comps)(c => ceilDiv(siz.y0, siz.yr(c)))
    val compW = Array.tabulate(siz.comps)(c => ceilDiv(siz.w, siz.xr(c)) - compX0(c))
    val compH = Array.tabulate(siz.comps)(c => ceilDiv(siz.h, siz.yr(c)) - compY0(c))
    val planes = Array.tabulate(siz.comps)(c => new Array[Int](compW(c) * compH(c)))

    // PPM (A.7.4): concatenate segment payloads in Zppm order, split into
    // Nppm-prefixed per-tile-part groups (groups may span segment
    // boundaries), and assign group k to the k-th tile-part in codestream
    // order; a tile's packed headers are its parts' groups concatenated
    val ppmByPart: Array[Array[Byte]] =
      if (ppmChunks.isEmpty) null
      else {
        val all = ppmChunks.sortBy(_._1).toArray.flatMap(_._2)
        val groups = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        var q = 0
        while (q + 4 <= all.length && groups.length < tileParts.length) {
          val n = u32(all, q).toInt
          if (n < 0 || q + 4 + n > all.length) return None
          groups += java.util.Arrays.copyOfRange(all, q + 4, q + 4 + n)
          q += 4 + n
        }
        if (groups.length < tileParts.length) return None
        groups.toArray
      }
    if (ppmByPart != null && pptChunks.nonEmpty) return None // A.7.4: exclusive

    // group tile-part segments by tile (in order, keeping each part's
    // codestream ordinal for the PPM group mapping)
    val byTile = tileParts.zipWithIndex.groupBy(_._1._1)

    var ti = 0
    while (ti < numXTiles * numYTiles) {
      val px = ti % numXTiles
      val py = ti / numXTiles
      val tx0 = math.max(siz.xto + px * siz.xt, siz.x0)
      val ty0 = math.max(siz.yto + py * siz.yt, siz.y0)
      val tx1 = math.min(siz.xto + (px + 1) * siz.xt, siz.w)
      val ty1 = math.min(siz.yto + (py + 1) * siz.yt, siz.h)
      val parts = byTile.getOrElse(ti,
        scala.collection.mutable.ArrayBuffer.empty[((Int, Int, Int), Int)])
      if (parts.nonEmpty && tx1 > tx0 && ty1 > ty0) {
        val ppmHdr: Array[Byte] =
          if (ppmByPart != null) {
            val bos = new java.io.ByteArrayOutputStream()
            parts.foreach { case (_, ord) => bos.write(ppmByPart(ord)) }
            bos.toByteArray
          } else if (pptChunks.nonEmpty) {
            // PPT: this tile's chunks in (part ordinal, Zppt) order
            val ords = parts.map(_._2).toSet
            val sel = pptChunks.filter(c => ords(c._1)).sortBy(c => (c._1, c._2))
            if (sel.isEmpty) null
            else {
              val bos = new java.io.ByteArrayOutputStream()
              sel.foreach(c => bos.write(c._3))
              bos.toByteArray
            }
          } else null
        // effective coding per T.800's precedence (tile COC > tile COD >
        // main COC > main COD — a tile COD/QCD drops the main per-component
        // overrides, exactly the reference's SOT reset + tile-COD clear,
        // pdf.combined.js:11010-11011, 10896-10897)
        val codT = tileCod.getOrElse(ti, cod)
        val codPerCompT = {
          val m = scala.collection.mutable.HashMap.empty[Int, Cod]
          if (!tileCod.contains(ti)) m ++= codPerComp
          tileCoc.foreach { case ((t, c), v) => if (t == ti) m(c) = v }
          m
        }
        val qcdT = tileQcd.getOrElse(ti, qcd)
        val qcdPerCompT = {
          val m = scala.collection.mutable.HashMap.empty[Int, Qcd]
          if (!tileQcd.contains(ti)) m ++= qcdPerComp
          tileQcc.foreach { case ((t, c), v) => if (t == ti) m(c) = v }
          m
        }
        // a tile RGN overrides the main RGN per component; a tile POC
        // replaces the main POC wholesale for its tile (A.6.6)
        val roiT = {
          val m = scala.collection.mutable.HashMap.empty[Int, Int]
          m ++= roiPerComp
          tileRoi.foreach { case ((t, c), v) => if (t == ti) m(c) = v }
          m
        }
        val pocsT: Seq[Poc] = tilePocs.get(ti) match {
          case Some(tp) => tp.toSeq
          case None => pocs.toSeq
        }
        decodeTile(data, parts.map { case (t, _) => (t._2, t._3) }.toSeq,
          siz, codT, codPerCompT,
          qcdT, qcdPerCompT, roiT, pocsT, ppmHdr, tx0, ty0, tx1, ty1) match {
          case Some(tilePlanes) =>
            var c = 0
            while (c < siz.comps) {
              // copy back at component-grid coordinates (B.3 ceil division)
              val cx0 = ceilDiv(tx0, siz.xr(c))
              val cy0 = ceilDiv(ty0, siz.yr(c))
              val cx1 = ceilDiv(tx1, siz.xr(c))
              val cy1 = ceilDiv(ty1, siz.yr(c))
              val ctw = cx1 - cx0
              var y = cy0
              while (y < cy1) {
                System.arraycopy(tilePlanes(c), (y - cy0) * ctw, planes(c),
                  (y - compY0(c)) * compW(c) + (cx0 - compX0(c)), ctw)
                y += 1
              }
              c += 1
            }
          case None => return None
        }
      }
      ti += 1
    }
    Some(CompDecoded(imgW, imgH, siz.comps, siz.depth(0), siz.xr, siz.yr,
      compW, compH, planes, siz.x0, siz.y0))
  }

  /** Decode one tile from its concatenated tile-part data. Returns per-
    * component planes on each component's own sample grid: plane c is
    * (ceil(tx1/XRsiz)-ceil(tx0/XRsiz)) × (ceil(ty1/YRsiz)-ceil(ty0/YRsiz)). */
  private def decodeTile(data: Array[Byte], parts: Seq[(Int, Int)],
      siz: Siz, codG: Cod, codPerComp: collection.Map[Int, Cod],
      qcdG: Qcd, qcdPerComp: collection.Map[Int, Qcd],
      roiPerComp: collection.Map[Int, Int], pocs: Seq[Poc],
      /** PPM packed packet headers for this tile (null = headers inline) */
      ppmHdr: Array[Byte],
      tx0: Int, ty0: Int, tx1: Int, ty1: Int): Option[Array[Array[Int]]] = {

    // per-component resolution/band/code-block geometry
    val comps = siz.comps
    val compCod = Array.tabulate(comps)(c => codPerComp.getOrElse(c, codG))
    val compQcd = Array.tabulate(comps)(c => qcdPerComp.getOrElse(c, qcdG))
    val maxLevels = compCod.map(_.levels).max
    // tile-component rectangles on each component's sample grid (B.3)
    val ctx0 = Array.tabulate(comps)(c => ceilDiv(tx0, siz.xr(c)))
    val cty0 = Array.tabulate(comps)(c => ceilDiv(ty0, siz.yr(c)))
    val ctx1 = Array.tabulate(comps)(c => ceilDiv(tx1, siz.xr(c)))
    val cty1 = Array.tabulate(comps)(c => ceilDiv(ty1, siz.yr(c)))

    def bandRect(kind: Int, nb: Int, cx0: Int, cy0: Int, cx1: Int, cy1: Int) = {
      // T.800 B.5: band coordinates at decomposition level nb
      val (xob, yob) = kind match {
        case 0 => (0, 0)
        case 1 => (1, 0)
        case 2 => (0, 1)
        case _ => (1, 1)
      }
      val sh = 1 << nb
      val off = 1 << (nb - 1)
      def f(v: Int, o: Int) = ceilDiv(v - o * off, sh)
      (f(cx0, xob), f(cy0, yob), f(cx1, xob), f(cy1, yob))
    }

    val resolutions: Array[Array[Resolution]] = Array.tabulate(comps) { c =>
      val cod = compCod(c)
      Array.tabulate(cod.levels + 1) { r =>
        val shift = cod.levels - r
        val rx0 = ceilDiv(ctx0(c), 1 << shift)
        val ry0 = ceilDiv(cty0(c), 1 << shift)
        val rx1 = ceilDiv(ctx1(c), 1 << shift)
        val ry1 = ceilDiv(cty1(c), 1 << shift)
        // precinct partition of the resolution (B.6), anchored at 0
        val ppx = cod.ppx(r)
        val ppy = cod.ppy(r)
        val npw = if (rx1 > rx0) ceilDiv(rx1, 1 << ppx) - (rx0 >> ppx) else 0
        val nph = if (ry1 > ry0) ceilDiv(ry1, 1 << ppy) - (ry0 >> ppy) else 0
        // code-block size clamped to the precinct (B.7: xcb' ≤ PPx at r=0,
        // PPx−1 above); the same offset maps the partition into band coords
        val sub = if (r == 0) 0 else 1
        val xcbEff = math.min(cod.xcb, ppx - sub)
        val ycbEff = math.min(cod.ycb, ppy - sub)
        val bands: Array[Band] =
          if (r == 0)
            Array(mkBand(0, rx0, ry0, rx1, ry1, xcbEff, ycbEff,
              ppx, ppy, npw, npw * nph))
          else {
            val nb = cod.levels - r + 1
            Array(1, 2, 3).map { kind =>
              val (bx0, by0, bx1, by1) =
                bandRect(kind, nb, ctx0(c), cty0(c), ctx1(c), cty1(c))
              mkBand(kind, bx0, by0, bx1, by1, xcbEff, ycbEff,
                ppx - sub, ppy - sub, npw, npw * nph)
            }
          }
        new Resolution(r, rx0, ry0, rx1, ry1, bands, npw, nph, ppx, ppy)
      }
    }

    // concatenate tile-part payloads (packet stream)
    val stream: Array[Byte] =
      if (parts.length == 1) data
      else {
        val out = new java.io.ByteArrayOutputStream()
        parts.foreach { case (s, e) => out.write(data, s, e - s) }
        out.toByteArray
      }
    val (sStart, sEnd) =
      if (parts.length == 1) (parts.head._1, parts.head._2) else (0, stream.length)

    // packet iteration (B.12): one packet per (component, resolution,
    // precinct, layer). The five progressions are realized as a STABLE sort
    // of the canonical packet list by each progression's key — for the
    // position-dependent orders (RPCL/PCRL/CPRL) a precinct's key is its
    // top-left sample position projected to the reference grid
    // (x · XRsiz · 2^(NL−r)), exactly the coordinate the spec's nested
    // position loops step over; with the default single whole-subband
    // precinct every position is the tile origin and the orders reduce to
    // the loop nestings rounds 1-5 shipped.
    val layers = codG.layers
    val base = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)] // (c, r, p, l)
    for (c <- 0 until comps; r <- 0 to maxLevels; if r < resolutions(c).length;
         p <- 0 until resolutions(c)(r).numPrec; l <- 0 until layers)
      base += ((c, r, p, l))
    def posKey(c: Int, r: Int, p: Int): (Long, Long) = {
      val res = resolutions(c)(r)
      val pi = p % res.npw
      val pj = p / res.npw
      val px = math.max(res.x0, ((res.x0 >> res.ppx) + pi).toLong << res.ppx)
      val py = math.max(res.y0, ((res.y0 >> res.ppy) + pj).toLong << res.ppy)
      val shift = compCod(c).levels - r
      ((py * siz.yr(c)) << shift, (px * siz.xr(c)) << shift)
    }
    def progKey(prog: Int, c: Int, r: Int, p: Int, l: Int): (Long, Long, Long, Long, Long) =
      prog match {
        case 0 => (l.toLong, r.toLong, c.toLong, p.toLong, 0L) // LRCP
        case 1 => (r.toLong, l.toLong, c.toLong, p.toLong, 0L) // RLCP
        case 2 => val (y, x) = posKey(c, r, p); (r.toLong, y, x, c.toLong, l.toLong) // RPCL
        case 3 => val (y, x) = posKey(c, r, p); (y, x, c.toLong, r.toLong, l.toLong) // PCRL
        case _ => val (y, x) = posKey(c, r, p); (c.toLong, y, x, r.toLong, l.toLong) // CPRL
      }
    val order =
      if (pocs.isEmpty)
        base.sortBy { case (c, r, p, l) => progKey(codG.progression, c, r, p, l) }
      else {
        // B.12.3: each POC volume sequences its not-yet-emitted packets in
        // its own progression; a conformant stream's volumes cover every
        // packet — anything left over means the packet stream and the POC
        // disagree, so reject rather than misparse
        val emitted = scala.collection.mutable.HashSet.empty[(Int, Int, Int, Int)]
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
        pocs.foreach { v =>
          val vol = base.filter { case (c, r, p, l) =>
            r >= v.rs && r < v.re && c >= v.cs && c < v.ce && l < v.lye &&
              !emitted((c, r, p, l))
          }
          vol.sortBy { case (c, r, p, l) => progKey(v.prog, c, r, p, l) }
            .foreach { t => emitted += t; out += t }
        }
        if (out.length != base.length) return None
        out
      }

    val br = new PacketBitReader(stream, sStart, sEnd)
    val ppmReader =
      if (ppmHdr == null) null
      else new PacketBitReader(ppmHdr, 0, ppmHdr.length)
    var ok = true
    var oi = 0
    while (ok && oi < order.length) {
      val (c, r, p, l) = order(oi)
      ok = parsePacket(br, stream, sEnd, resolutions(c)(r), compCod(c), l, p,
        ppmReader, ppmHdr)
      // a packed-header stream running dry mid-parse is malformed
      if (ppmReader != null && ppmReader.exhausted) ok = false
      oi += 1
    }
    if (!ok) return None

    // Tier-1 decode + dequant + inverse DWT per component
    val out = new Array[Array[Int]](comps)
    var c = 0
    while (c < comps) {
      val cod = compCod(c)
      val qcd = compQcd(c)
      val guard = qcd.guard
      val roiShift = roiPerComp.getOrElse(c, 0)
      // subband index in QCD order: LL, then per res: HL, LH, HH
      def sbIndex(r: Int, kind: Int): Int = if (r == 0) 0 else 3 * (r - 1) + kind
      def exponent(r: Int, kind: Int): Int = qcd.style match {
        case 1 =>
          // scalar derived: εb = ε0 − NL + nb  (E.1.1)
          val nb = if (r == 0) cod.levels else cod.levels - r + 1
          qcd.exponents(0) - cod.levels + nb
        case _ =>
          val i = sbIndex(r, kind)
          if (i < qcd.exponents.length) qcd.exponents(i)
          else throw new IllegalStateException("QCD subband count") // -> None
      }
      def mantissa(r: Int, kind: Int): Int = qcd.style match {
        case 0 => 0
        case 1 => qcd.mantissas(0)
        case _ => qcd.mantissas(math.min(sbIndex(r, kind), qcd.mantissas.length - 1))
      }
      // band gain (E.1.1 Table E.1): LL 0, HL/LH 1, HH 2
      def gain(kind: Int): Int = kind match {
        case 0 => 0
        case 3 => 2
        case _ => 1
      }

      def bandCoefficients(res: Resolution, band: Band): Array[Double] = {
        val bw = band.x1 - band.x0
        val bh = band.y1 - band.y0
        val coeffs = new Array[Double](bw * bh)
        if (bw == 0 || bh == 0) return coeffs
        val mb = guard + exponent(res.r, band.kind) - 1
        if (mb < 0 || mb > 31) throw new IllegalStateException("mb")
        val rev = cod.reversible
        val delta =
          if (rev) 1.0
          else {
            val rb = siz.depth(c) + gain(band.kind)
            math.pow(2, rb - exponent(res.r, band.kind)) *
              (1.0 + mantissa(res.r, band.kind) / 2048.0)
          }
        band.blocks.foreach { blk =>
          if (blk.included && blk.totalPasses > 0 && blk.chunks.nonEmpty) {
            val bwB = blk.x1 - blk.x0
            val bhB = blk.y1 - blk.y0
            val vals = decodeBlock(stream, blk.chunks.toSeq, bwB, bhB,
              bandKindCtx(band.kind), mb, blk.zeroBitPlanes, blk.totalPasses,
              cod.cbStyle)
            var i = 0
            while (i < vals.length) {
              val sm = vals(i)
              var mag = sm & Int.MaxValue
              // H.2 maxshift: magnitudes at/above 2^SPrgn are ROI
              // coefficients the encoder scaled up — undo the shift;
              // everything below is background, untouched
              if (roiShift > 0 && mag >= (1 << roiShift)) mag >>>= roiShift
              if (mag != 0) {
                val x = blk.x0 - band.x0 + i % bwB
                val y = blk.y0 - band.y0 + i / bwB
                val v =
                  if (rev) mag.toDouble
                  else (mag + 0.5) * delta // mid-point reconstruction
                coeffs(y * bw + x) = if (sm < 0) -v else v
              }
              i += 1
            }
          }
        }
        coeffs
      }

      // multi-resolution synthesis
      val res0 = resolutions(c)(0)
      var ll = bandCoefficients(res0, res0.bands(0))
      var r = 1
      while (r <= cod.levels) {
        val res = resolutions(c)(r)
        val hl = bandCoefficients(res, res.bands(0))
        val lh = bandCoefficients(res, res.bands(1))
        val hh = bandCoefficients(res, res.bands(2))
        ll = inverse2D(cod.reversible, ll, hl, lh, hh,
          res.x0, res.x1, res.y0, res.y1)
        r += 1
      }
      // scale non-reversible coefficients already handled; store tile plane
      // on the component grid
      val plane = new Array[Int]((ctx1(c) - ctx0(c)) * (cty1(c) - cty0(c)))
      var i = 0
      while (i < plane.length) {
        plane(i) = math.rint(ll(i)).toInt
        i += 1
      }
      out(c) = plane
      c += 1
    }

    // inverse component transform + DC level shift (MCT requires identical
    // sampling on components 0-2 — enforced at parse; lengths match here)
    if (codG.mct == 1 && comps >= 3) {
      val y = out(0); val u = out(1); val v = out(2)
      if (u.length != y.length || v.length != y.length)
        throw new IllegalStateException("MCT plane dims") // -> None
      if (compCod(0).reversible) {
        var i = 0
        while (i < y.length) {
          val g = y(i) - ((u(i) + v(i)) >> 2)
          val r0 = v(i) + g
          val b0 = u(i) + g
          y(i) = r0; u(i) = g; v(i) = b0
          i += 1
        }
      } else {
        var i = 0
        while (i < y.length) {
          val yy = y(i).toDouble; val cb = u(i).toDouble; val cr = v(i).toDouble
          y(i) = math.rint(yy + 1.402 * cr).toInt
          u(i) = math.rint(yy - 0.344136 * cb - 0.714136 * cr).toInt
          v(i) = math.rint(yy + 1.772 * cb).toInt
          i += 1
        }
      }
    }
    var cc = 0
    while (cc < comps) {
      val shift = if (siz.signed(cc)) 0 else 1 << (siz.depth(cc) - 1)
      val maxV = (1 << siz.depth(cc)) - 1
      val pl = out(cc)
      var i = 0
      while (i < pl.length) {
        val v = pl(i) + shift
        pl(i) = if (v < 0) 0 else if (v > maxV) maxV else v
        i += 1
      }
      cc += 1
    }
    Some(out)
  }

  /** Map band kind to the ZC context family: 0 = LL/LH column, 1 = HL
    * (transposed), 2 = HH. */
  private[graft] def bandKindCtx(kind: Int): Int = kind match {
    case 1 => 1
    case 3 => 2
    case _ => 0
  }

  /** Build one band's code-block grid (B.7) and its per-precinct tag trees
    * (B.10.2). `xcbEff`/`ycbEff` are the precinct-clamped code-block
    * exponents; `ppxSub`/`ppySub` the precinct partition exponents in BAND
    * coordinates (PPx at r=0, PPx−1 above — the partition is anchored at 0
    * like the code-block grid, so each block falls wholly in one precinct);
    * `npw`/`numPrec` come from the resolution's precinct grid. */
  private def mkBand(kind: Int, x0: Int, y0: Int, x1: Int, y1: Int,
      xcbEff: Int, ycbEff: Int, ppxSub: Int, ppySub: Int,
      npw: Int, numPrec: Int): Band = {
    val cbw = 1 << xcbEff
    val cbh = 1 << ycbEff
    val bw0 = math.max(0, x1 - x0)
    val bh0 = math.max(0, y1 - y0)
    if (bw0 == 0 || bh0 == 0)
      return new Band(kind, x0, y0, x1, y1, Array.empty, 0, 0,
        new Array[BandPrecinct](math.max(1, numPrec)))
    // code-block grid aligned to absolute multiples of the block size (B.7)
    val gx0 = (x0 / cbw) * cbw
    val gy0 = (y0 / cbh) * cbh
    val nx = ceilDiv(x1 - gx0, cbw)
    val ny = ceilDiv(y1 - gy0, cbh)
    val pi0 = x0 >> ppxSub
    val pj0 = y0 >> ppySub
    val blocks = new Array[CodeBlock](nx * ny)
    var j = 0
    while (j < ny) {
      var i = 0
      while (i < nx) {
        val bx0 = math.max(x0, gx0 + i * cbw)
        val by0 = math.max(y0, gy0 + j * cbh)
        val bx1 = math.min(x1, gx0 + (i + 1) * cbw)
        val by1 = math.min(y1, gy0 + (j + 1) * cbh)
        val pi = (bx0 >> ppxSub) - pi0
        val pj = (by0 >> ppySub) - pj0
        val prec = math.max(0, math.min(numPrec - 1, pj * npw + pi))
        blocks(j * nx + i) = new CodeBlock(bx0, by0, bx1, by1, kind, i, j, prec)
        i += 1
      }
      j += 1
    }
    val precincts = new Array[BandPrecinct](math.max(1, numPrec))
    blocks.foreach { blk =>
      val p = precincts(blk.prec)
      if (p == null)
        precincts(blk.prec) = new BandPrecinct(blk.gi, blk.gj, 1, 1)
      else {
        val iMin = math.min(p.iMin, blk.gi)
        val jMin = math.min(p.jMin, blk.gj)
        val nw = math.max(p.iMin + p.nw, blk.gi + 1) - iMin
        val nh = math.max(p.jMin + p.nh, blk.gj + 1) - jMin
        if (iMin != p.iMin || jMin != p.jMin || nw != p.nw || nh != p.nh)
          precincts(blk.prec) = new BandPrecinct(iMin, jMin, nw, nh)
      }
    }
    new Band(kind, x0, y0, x1, y1, blocks, nx, ny, precincts)
  }

  /** Parse one packet for (resolution, precinct, layer).
    * Mutates code-block states; returns false on malformed input. With PPM
    * (round 6) the header bits — and any EPH — come from the tile's packed
    * header stream (`ppm`/`ppmData`) while the codeword-segment bodies stay
    * in the tile stream, consumed from `br.pos`. */
  private def parsePacket(br: PacketBitReader, data: Array[Byte], end: Int,
      res: Resolution, cod: Cod, layer: Int, prec: Int,
      ppm: PacketBitReader = null, ppmData: Array[Byte] = null): Boolean = {
    // SOP marker segment (A.8.1) if signalled — always in the tile stream
    if (cod.sop && br.pos + 6 <= end &&
      (data(br.pos) & 0xff) == 0xff && (data(br.pos + 1) & 0xff) == 0x91) {
      br.pos += 6
    }
    val hdr = if (ppm != null) ppm else new PacketBitReader(data, br.pos, end)
    val hdrData = if (ppm != null) ppmData else data
    val hdrEnd = if (ppm != null) ppmData.length else end
    // (block, passes, byte length, codeword-segment index) per piece
    val contributions = scala.collection.mutable.ArrayBuffer.empty[(CodeBlock, Int, Int, Int)]
    if (hdr.bit() == 0) {
      // empty packet
      hdr.align()
    } else {
      var bi = 0
      while (bi < res.bands.length) {
        val band = res.bands(bi)
        val bp = if (prec < band.precincts.length) band.precincts(prec) else null
        var idx = 0
        while (bp != null && idx < band.blocks.length) {
          val blk = band.blocks(idx)
          val i = blk.gi - bp.iMin
          val j = blk.gj - bp.jMin
          var newPasses = 0
          if (blk.prec == prec && blk.x1 > blk.x0 && blk.y1 > blk.y0) {
            val included =
              if (!blk.included) bp.inclTree.decode(hdr, i, j, layer + 1) >= 0
              else hdr.bit() == 1
            if (included) {
              if (!blk.included) {
                // first inclusion: zero bitplanes via its tag tree, fully
                var t = 1
                var zbp = -1
                while (zbp < 0) {
                  zbp = bp.zbpTree.decode(hdr, i, j, t)
                  t += 1
                  if (t > 64) return false
                }
                blk.zeroBitPlanes = zbp
                blk.included = true
              }
              // coding passes (Table B.4)
              newPasses =
                if (hdr.bit() == 0) 1
                else if (hdr.bit() == 0) 2
                else {
                  val v = hdr.bits(2)
                  if (v < 3) 3 + v
                  else {
                    val v2 = hdr.bits(5)
                    if (v2 < 31) 6 + v2
                    else 37 + hdr.bits(7)
                  }
                }
              // Lblock adaptation (once per contribution), then one length
              // per codeword-segment piece (B.10.7.2): bypass/terminate-all
              // styles split the contribution on segment boundaries, each
              // piece's length read with lblock + floorLog2(piece passes)
              while (hdr.bit() == 1) blk.lblock += 1
              var passBase = blk.totalPasses // one contribution per packet
              var remaining = newPasses
              while (remaining > 0) {
                val segIdx = segmentOf(passBase, cod.bypass, cod.termAll)
                val room = passesLeftInSegment(passBase, cod.bypass, cod.termAll)
                val take = math.min(remaining, room)
                val lenBits = blk.lblock + floorLog2(take)
                val segLen = hdr.bits(lenBits)
                contributions += ((blk, take, segLen, segIdx))
                passBase += take
                remaining -= take
              }
            }
          }
          idx += 1
        }
        bi += 1
      }
      hdr.align()
    }
    // EPH marker after the header if signalled — in the HEADER stream
    if (cod.eph && hdr.pos + 2 <= hdrEnd &&
      (hdrData(hdr.pos) & 0xff) == 0xff && (hdrData(hdr.pos + 1) & 0xff) == 0x92)
      hdr.pos += 2
    // codeword-segment bodies: directly after the inline header, or at the
    // tile stream's cursor when the header came packed (PPM)
    var pos = if (ppm != null) br.pos else hdr.pos
    var ci = 0
    while (ci < contributions.length) {
      val (blk, passes, segLen, segIdx) = contributions(ci)
      if (pos + segLen > end) return false
      blk.chunks += ((pos, pos + segLen, segIdx))
      blk.totalPasses += passes
      pos += segLen
      ci += 1
    }
    br.pos = pos
    true
  }

  private[graft] def floorLog2(x: Int): Int = {
    var v = x
    var n = -1
    while (v > 0) { v >>= 1; n += 1 }
    math.max(0, n)
  }
}
