package graft.pdf

/** JBIG2 huffman-coded segment support (ITU-T T.88 Annex B + §6.5.9/§6.4
  * huffman paths) — the one coding mode the reference's vendored decoder
  * errors on (`pdf.combined.js` jbig2 has no huffman branch at all), so this
  * lane exceeds it.
  *
  * Scope (disclosed): standard tables **B.1–B.5** are carried — their
  * constants are provable in-repo (Kraft-complete prefix sets + contiguous
  * range coverage, asserted by Jbig2HuffmanSpec). Standard tables B.6–B.15
  * are NOT carried: no source in this sandbox can verify those constants,
  * and silently-wrong tables would decode wrong pixels — a stream selecting
  * them degrades to the metadata-only row, like every other out-of-scope
  * shape. Huffman text regions therefore decode when their FS/DS/DT tables
  * are CUSTOM (selector 3, carried in table segments — fully
  * self-describing), which is also the only selector custom encoders need.
  * Huffman + refinement and huffman REFAGG dictionaries degrade (rare, and
  * the refinement data layout is arithmetic-coded mid-huffman).
  *
  * Bit order is MSB-first (B.4); code assignment follows the B.3 procedure:
  * codes assigned by increasing prefix length, within a length by table line
  * order — normal lines lowest-value first, then the lower-range line, the
  * upper-range line, and the OOB line, matching both the printed standard
  * tables and the custom-table build order of §B.5.
  */
object Jbig2Huffman {

  /** One table line. `lower`: value = rangeLow − offset (the open lower
    * range); otherwise value = rangeLow + offset. `oob` lines carry no
    * value. prefLen 0 = line absent (never assigned a code). */
  final case class Line(prefLen: Int, rangeLen: Int, rangeLow: Long,
      lower: Boolean = false, oob: Boolean = false)

  /** MSB-first bit reader over a byte slice (T.88 B.4). Reads past the end
    * yield an `exhausted` flag the decode paths turn into failure — the
    * never-fail discipline of the rest of the lane. */
  final class Reader(data: Array[Byte], start: Int, end: Int) {
    var pos: Int = start
    private var bitPos = 0
    var exhausted = false
    def bit(): Int = {
      if (pos >= end) { exhausted = true; return 0 }
      val b = ((data(pos) & 0xff) >>> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Skip to the next byte boundary (6.5.9 collective bitmaps, 6.4.5.1
      * after the symbol ID code table). */
    def align(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
    def remaining: Int = end - pos
  }

  /** OOB marker distinct from decode failure. */
  sealed trait Result
  final case class Value(v: Int) extends Result
  case object Oob extends Result
  case object Fail extends Result

  /** A table with codes assigned per the B.3 procedure. */
  final class Table private[Jbig2Huffman] (val lines: Array[Line]) {
    // (prefLen, code) per line; -1 length for prefLen-0 lines
    private[graft] val codes: Array[Int] = {
      val maxLen = lines.iterator.map(_.prefLen).max
      val lenCount = new Array[Int](maxLen + 1)
      lines.foreach(l => if (l.prefLen > 0) lenCount(l.prefLen) += 1)
      val out = new Array[Int](lines.length)
      java.util.Arrays.fill(out, -1)
      // FIRSTCODE[len] = (FIRSTCODE[len−1] + LENCOUNT[len−1]) << 1; within a
      // length, codes increment in table line order (B.3)
      var firstCode = 0
      var len = 1
      while (len <= maxLen) {
        firstCode = (firstCode + lenCount(len - 1)) << 1
        var c = firstCode
        var i = 0
        while (i < lines.length) {
          if (lines(i).prefLen == len) { out(i) = c; c += 1 }
          i += 1
        }
        len += 1
      }
      out
    }
    private val maxLen = lines.iterator.map(_.prefLen).max

    def decode(r: Reader): Result = {
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | r.bit()
        len += 1
        if (r.exhausted) return Fail
        var i = 0
        while (i < lines.length) {
          val l = lines(i)
          if (l.prefLen == len && codes(i) == code) {
            if (l.oob) return Oob
            val off = r.bits(l.rangeLen)
            if (r.exhausted) return Fail
            val v = if (l.lower) l.rangeLow - off else l.rangeLow + off
            if (v < Int.MinValue || v > Int.MaxValue) return Fail
            return Value(v.toInt)
          }
          i += 1
        }
      }
      Fail
    }
  }

  def table(lines: Line*): Table = new Table(lines.toArray)

  /** Canonical table over plain code lengths (runcodes, symbol-ID codes):
    * value i has prefix length lengths(i); zero-length entries are absent. */
  def fromLengths(lengths: Array[Int]): Table =
    new Table(lengths.zipWithIndex.map { case (len, i) => Line(len, 0, i) })

  // ── Standard tables B.1–B.5 (T.88 Annex B; structure asserted in spec) ──
  val B1: Table = table(
    Line(1, 4, 0), Line(2, 8, 16), Line(3, 16, 272), Line(3, 32, 65808))
  val B2: Table = table(
    Line(1, 0, 0), Line(2, 0, 1), Line(3, 0, 2), Line(4, 3, 3), Line(5, 6, 11),
    Line(6, 32, 75), Line(6, 0, 0, oob = true))
  val B3: Table = table(
    Line(8, 8, -256), Line(1, 0, 0), Line(2, 0, 1), Line(3, 0, 2), Line(4, 3, 3),
    Line(5, 6, 11), Line(8, 32, -257, lower = true), Line(7, 32, 75),
    Line(6, 0, 0, oob = true))
  val B4: Table = table(
    Line(1, 0, 1), Line(2, 0, 2), Line(3, 0, 3), Line(4, 3, 4), Line(5, 6, 12),
    Line(5, 32, 76))
  val B5: Table = table(
    Line(7, 8, -255), Line(1, 0, 1), Line(2, 0, 2), Line(3, 0, 3), Line(4, 3, 4),
    Line(5, 6, 12), Line(7, 32, -256, lower = true), Line(6, 32, 76))

  private val MaxCustomLines = 4096

  /** Custom table segment (type 53, §7.4.13): flags byte (bit 0 HTOOB,
    * bits 1-3 HTPS−1, bits 4-6 HTRS−1), signed 32-bit HTLOW/HTHIGH, then
    * (prefLen, rangeLen) pairs covering [HTLOW, HTHIGH), then the lower- and
    * upper-range prefix lengths, then the OOB prefix length if HTOOB. */
  def parseTableSegment(data: Array[Byte], start: Int, end: Int): Option[Table] = {
    if (start + 9 > end) return None
    val flags = data(start) & 0xff
    val htOob = (flags & 1) != 0
    val htPs = ((flags >> 1) & 7) + 1
    val htRs = ((flags >> 4) & 7) + 1
    val htLow = be32s(data, start + 1)
    val htHigh = be32s(data, start + 5)
    if (htHigh <= htLow) return None
    val r = new Reader(data, start + 9, end)
    val lines = scala.collection.mutable.ArrayBuffer.empty[Line]
    var cur = htLow.toLong
    while (cur < htHigh) {
      if (lines.length > MaxCustomLines) return None
      val pref = r.bits(htPs).toInt
      val range = r.bits(htRs).toInt
      if (r.exhausted || range > 32) return None
      lines += Line(pref, range, cur)
      cur += (1L << range)
    }
    val lowPref = r.bits(htPs).toInt
    lines += Line(lowPref, 32, htLow - 1L, lower = true)
    val highPref = r.bits(htPs).toInt
    lines += Line(highPref, 32, htHigh.toLong)
    if (htOob) {
      val oobPref = r.bits(htPs).toInt
      lines += Line(oobPref, 0, 0, oob = true)
    }
    if (r.exhausted) None else Some(new Table(lines.toArray))
  }

  private def be32s(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 24) | ((d(i + 1) & 0xff) << 16) | ((d(i + 2) & 0xff) << 8) | (d(i + 3) & 0xff)
}
