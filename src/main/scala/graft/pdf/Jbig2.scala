package graft.pdf

/** JBIG2 (ITU-T T.88) — the embedded-in-PDF subset the raster lane needs:
  * MQ arithmetic decoder (T.88 Annex E, Table E.1 state machine), the generic
  * region decoding procedure (6.2.5.7) for templates 0-3 with TPGDON typical
  * prediction, and the PDF-embedded segment stream parser (7.2 segment
  * headers; PDF 32000-1 §7.4.7 embeds segments with no file header).
  *
  * Scope (disclosed): arithmetic generic regions only. MMR-coded regions,
  * symbol/text/halftone/refinement segments and JBIG2Globals-resident symbol
  * dictionaries fall back to the metadata-only row in `PdfImages` — generic
  * coding is what scanner pipelines emit for full-page masks, and it is the
  * piece with no JDK codec. The reference carries a full decoder inside its
  * vendored pdf.combined.js (JBIG2 stream wiring at 22530-22556) — cited as
  * the semantic contract; this implementation is from the public spec.
  *
  * Context bit order: template pixels (nominal fixed positions plus the AT
  * pixels at their signalled offsets) are ordered row-major — by dy then dx —
  * with the first pixel as the most significant context bit, matching the
  * spec's context-formation figures (6.2.5.3) and the interchange behavior of
  * public decoders.
  */
object Jbig2 {

  // ── T.88 Table E.1: Qe, NMPS, NLPS, SWITCH ────────────────────────────────
  private[graft] val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private[graft] val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private[graft] val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private[graft] val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** MQ arithmetic decoder (T.88 E.3.2-E.3.4 software conventions).
    * Context state packs (stateIndex << 1) | MPS per context slot; reads past
    * the segment end behave as 0xFF padding (the marker-terminated stream
    * convention, E.3.4). */
  final class MqDecoder(data: Array[Byte], start: Int, end: Int) {
    private var bp = start
    private var c = 0L
    private var a = 0
    private var ct = 0

    private def byteAt(i: Int): Int = if (i >= start && i < end) data(i) & 0xff else 0xff

    // INITDEC
    c = byteAt(bp).toLong << 16
    byteIn()
    c = (c << 7) & 0xffffffffL
    ct -= 7
    a = 0x8000

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    def decode(cx: Array[Int], i: Int): Int = {
      var icx = cx(i) >> 1
      var mps = cx(i) & 1
      val qe = Qe(icx)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS exchange path
        if (a < qe) { a = qe; d = mps; icx = Nmps(icx) }
        else {
          a = qe
          d = 1 - mps
          if (Switch(icx) == 1) mps = 1 - mps
          icx = Nlps(icx)
        }
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          // MPS exchange path
          if (a < qe) {
            d = 1 - mps
            if (Switch(icx) == 1) mps = 1 - mps
            icx = Nlps(icx)
          } else { d = mps; icx = Nmps(icx) }
          renorm()
        } else d = mps
      }
      cx(i) = (icx << 1) | mps
      d
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteIn()
        a = (a << 1) & 0xffff
        c = (c << 1) & 0xffffffffL
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }
  }

  // ── generic region templates (6.2.5.3): fixed pixels per template; the AT
  // pixel count is 4 for template 0, 1 for templates 1-3 ──────────────────────
  private def fixedTemplate(template: Int): Array[(Int, Int)] = template match {
    case 0 => Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
    case 1 => Array((-1, -2), (0, -2), (1, -2), (2, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
      (-3, 0), (-2, 0), (-1, 0))
    case 2 => Array((-1, -2), (0, -2), (1, -2),
      (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-2, 0), (-1, 0))
    case _ => Array((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1),
      (-4, 0), (-3, 0), (-2, 0), (-1, 0))
  }

  private[graft] def atCount(template: Int): Int = if (template == 0) 4 else 1

  /** Sorted full template (fixed + AT), row-major: the context-formation
    * order — first entry is the most significant bit. */
  private[graft] def templatePoints(template: Int, at: Array[(Int, Int)]): Array[(Int, Int)] =
    (fixedTemplate(template) ++ at.take(atCount(template)))
      .sortBy { case (dx, dy) => (dy, dx) }

  /** TPGDON pseudo-pixel contexts per template (6.2.5.7) — the single
    * definition both the decoder and the fixture encoder share. */
  private[graft] def ltpContext(template: Int): Int = template match {
    case 0 => 0x9b25
    case 1 => 0x0795
    case 2 => 0x00e5
    case _ => 0x0195
  }

  /** Generic region decoding procedure (6.2.5.7, arithmetic path): returns a
    * row-major byte bitmap (1 = black). Shared `cx` state array sized to the
    * largest template (2^16 contexts). */
  def decodeGenericRegion(
      data: Array[Byte], start: Int, end: Int,
      w: Int, h: Int, template: Int, at: Array[(Int, Int)],
      tpgdon: Boolean): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024, s"region $w x $h")
    val bitmap = new Array[Byte](w * h)
    val cx = new Array[Int](1 << 16)
    val mq = new MqDecoder(data, start, end)
    val tmpl = templatePoints(template, at)
    val ltpCx = ltpContext(template)
    var ltp = false
    var y = 0
    while (y < h) {
      if (tpgdon && mq.decode(cx, ltpCx) == 1) ltp = !ltp
      if (tpgdon && ltp) {
        // typical row: copy of the row above (all-0 for the first row)
        if (y > 0) System.arraycopy(bitmap, (y - 1) * w, bitmap, y * w, w)
      } else {
        var x = 0
        while (x < w) {
          var ctx = 0
          var t = 0
          while (t < tmpl.length) {
            val (dx, dy) = tmpl(t)
            val xx = x + dx
            val yy = y + dy
            val bit =
              if (xx < 0 || xx >= w || yy < 0) 0
              else bitmap(yy * w + xx)
            ctx = (ctx << 1) | bit
            t += 1
          }
          bitmap(y * w + x) = mq.decode(cx, ctx).toByte
          x += 1
        }
      }
      y += 1
    }
    bitmap
  }

  private def be32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  /** Decode a PDF-embedded JBIG2 stream (segment headers per 7.2, no file
    * header) into a `width`×`height` page bitmap (row-major, 1 = black).
    * Generic region segments (types 36/38/39, arithmetic path) OR-compose at
    * their region offsets; every other segment type is skipped structurally.
    * Returns None when no decodable generic region was found (symbol-coded or
    * MMR streams → caller keeps the metadata-only row). Never throws on
    * malformed input — parsing stops at the first inconsistent header. */
  def decodeEmbedded(data: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    try {
      if (width <= 0 || height <= 0 || width.toLong * height > 64L * 1024 * 1024) return None
      var out: Array[Byte] = null
      var off = 0
      var safe = true
      while (safe && off + 11 <= data.length) {
        val segNum = be32(data, off)
        val flags = data(off + 4) & 0xff
        val segType = flags & 0x3f
        val pa4 = (flags & 0x40) != 0
        var p = off + 5
        // referred-to segment count + retain bits (7.2.4)
        val rts = data(p) & 0xff
        var refCount = rts >>> 5
        if (refCount == 7) {
          refCount = (be32(data, p) & 0x1fffffffL).toInt
          p += 4 + (refCount + 8) / 8
        } else p += 1
        if (refCount < 0 || refCount > 1000000) return Option(out).filter(_ != null)
        val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
        p += refCount * refSize
        p += (if (pa4) 4 else 1)
        if (p + 4 > data.length) return Option(out).filter(_ != null)
        val dataLen = be32(data, p)
        p += 4
        if (dataLen == 0xffffffffL || p + dataLen > data.length) safe = false
        else {
          val segEnd = p + dataLen.toInt
          if ((segType == 36 || segType == 38 || segType == 39) && dataLen >= 18) {
            // region segment info (7.4.1) + generic region flags (7.4.6)
            val rw = be32(data, p).toInt
            val rh = be32(data, p + 4).toInt
            val rx = be32(data, p + 8).toInt
            val ry = be32(data, p + 12).toInt
            val gFlags = data(p + 17) & 0xff
            val mmr = (gFlags & 1) != 0
            val template = (gFlags >> 1) & 3
            val tpgdon = (gFlags & 8) != 0
            if (!mmr && rw > 0 && rh > 0 && rw.toLong * rh <= 64L * 1024 * 1024) {
              val nAt = atCount(template)
              val atOff = p + 18
              if (atOff + 2 * nAt <= segEnd) {
                val at = Array.tabulate(nAt)(i =>
                  (data(atOff + 2 * i).toInt, data(atOff + 2 * i + 1).toInt))
                val bmp = decodeGenericRegion(
                  data, atOff + 2 * nAt, segEnd, rw, rh, template, at, tpgdon)
                if (out == null) out = new Array[Byte](width * height)
                var yy = 0
                while (yy < rh) {
                  val py = ry + yy
                  if (py >= 0 && py < height) {
                    var xx = 0
                    while (xx < rw) {
                      val px = rx + xx
                      if (px >= 0 && px < width && bmp(yy * rw + xx) != 0)
                        out(py * width + px) = 1
                      xx += 1
                    }
                  }
                  yy += 1
                }
              }
            }
          }
          off = segEnd
        }
      }
      Option(out).filter(_ != null)
    } catch { case scala.util.control.NonFatal(_) => None }
}
