package graft.eval

/** Resolved color spaces for text fill (SURVEY.md §2.2 E5; reference
  * ColorSpace.parse/fromIR, pdf.combined.js:40554+). The extraction surface
  * only needs fill values good enough to reproduce the reference's run
  * breaks (G10: a fill change closes a tspan), so:
  *
  *  - device and CIE-based families map to their device analogue
  *    (CalGray→Gray, CalRGB→RGB, ICCBased by /N — the reference does the
  *    same for the SVG/text path, which never color-manages);
  *  - /Indexed dereferences the lookup table into base-space components;
  *  - /Separation and /DeviceN map tint → gray as 1−t (full ink = black);
  *    the reference evaluates the tint-transform function, but on the text
  *    path the only observable is the fill attribute, and 1−t preserves the
  *    break structure (distinct tints stay distinct);
  *  - /Pattern leaves the fill unchanged (name operands, as before).
  */
sealed trait ColorSpaceModel {
  def numComps: Int
}

object ColorSpaceModel {
  case object Gray extends ColorSpaceModel { val numComps = 1 }
  case object RGB extends ColorSpaceModel { val numComps = 3 }
  case object CMYK extends ColorSpaceModel { val numComps = 4 }

  /** Device / CIE name → model; the single name table shared by the `cs`
    * operand handler and the resource-dict parser (array families like
    * /Indexed live in the parser only). A bare /Lab (illegal — WhitePoint is
    * required) degrades to the D50 default rather than dropping the fill. */
  def fromName(name: String): Option[ColorSpaceModel] = name match {
    case "DeviceGray" | "G" | "CalGray" => Some(Gray)
    case "DeviceRGB" | "RGB" | "CalRGB" => Some(RGB)
    case "Lab" => Some(Lab())
    case "DeviceCMYK" | "CMYK" => Some(CMYK)
    case _ => None
  }

  /** CIE L*a*b* (PDF 32000-1 §8.6.5.4; reference LabCS,
    * pdf.combined.js:41660-41770): L ∈ [0,100], a/b clamped to /Range,
    * g-function to XYZ against /WhitePoint, then the reference's D50/D65
    * XYZ→RGB matrices with its sqrt gamma and byte truncation — values are
    * pre-quantized to n/255 so the evaluator's `(x*255).round` formatting
    * reproduces the reference's `sqrt(x)*255|0` integers exactly. */
  final case class Lab(xw: Double = 0.9642, yw: Double = 1.0, zw: Double = 0.8249,
      amin: Double = -100, amax: Double = 100,
      bmin: Double = -100, bmax: Double = 100) extends ColorSpaceModel {
    val numComps = 3
  }
  /** tint components → gray 1−mean(t) (Separation: one component). */
  final case class Tint(numComps: Int) extends ColorSpaceModel
  final case class Indexed(base: ColorSpaceModel, lookup: Array[Byte]) extends ColorSpaceModel {
    val numComps = 1
  }

  /** Fill components → (r, g, b) in [0,1]; None when the operands don't
    * resolve to a color (pattern name, bad index). */
  def toRgb(cs: ColorSpaceModel, comps: Array[Double]): Option[(Double, Double, Double)] =
    cs match {
      case Gray if comps.length >= 1 =>
        val v = comps(0); Some((v, v, v))
      case RGB if comps.length >= 3 =>
        Some((comps(0), comps(1), comps(2)))
      case CMYK if comps.length >= 4 =>
        val k = comps(3)
        Some(((1 - comps(0)) * (1 - k), (1 - comps(1)) * (1 - k), (1 - comps(2)) * (1 - k)))
      case l: Lab if comps.length >= 3 =>
        def g(x: Double): Double =
          if (x >= 6.0 / 29) x * x * x else (108.0 / 841) * (x - 4.0 / 29)
        val ls = comps(0)
        val as = math.min(l.amax, math.max(l.amin, comps(1)))
        val bs = math.min(l.bmax, math.max(l.bmin, comps(2)))
        val m = (ls + 16) / 116
        val x = l.xw * g(m + as / 500)
        val y = l.yw * g(m)
        val z = l.zw * g(m - bs / 200)
        val (r, gg, b) =
          if (l.zw < 1) // D50
            (x * 3.1339 + y * -1.6170 + z * -0.4906,
              x * -0.9785 + y * 1.9160 + z * 0.0333,
              x * 0.0720 + y * -0.2290 + z * 1.4057)
          else // D65
            (x * 3.2406 + y * -1.5372 + z * -0.4986,
              x * -0.9689 + y * 1.8758 + z * 0.0415,
              x * 0.0557 + y * -0.2040 + z * 1.0570)
        def q(v: Double): Double = // reference byte quantization, kept exact
          (if (v <= 0) 0 else if (v >= 1) 255 else math.floor(math.sqrt(v) * 255)) / 255.0
        Some((q(r), q(gg), q(b)))
      case Tint(n) if comps.length >= 1 =>
        val t = comps.take(math.max(1, n)).sum / math.max(1, math.min(n, comps.length))
        val v = 1 - t
        Some((v, v, v))
      case Indexed(base, lookup) if comps.length >= 1 =>
        val n = base.numComps
        val idx = comps(0).toInt
        if (idx < 0 || (idx + 1) * n > lookup.length) None
        else {
          val sub = Array.tabulate(n)(i => (lookup(idx * n + i) & 0xff) / 255.0)
          toRgb(base, sub)
        }
      case _ => None
    }
}
