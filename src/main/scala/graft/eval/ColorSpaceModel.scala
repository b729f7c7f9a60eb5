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
    * /Indexed live in the parser only). */
  def fromName(name: String): Option[ColorSpaceModel] = name match {
    case "DeviceGray" | "G" | "CalGray" => Some(Gray)
    case "DeviceRGB" | "RGB" | "CalRGB" | "Lab" => Some(RGB)
    case "DeviceCMYK" | "CMYK" => Some(CMYK)
    case _ => None
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
