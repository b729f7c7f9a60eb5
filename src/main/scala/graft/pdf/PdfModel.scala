package graft.pdf

/** PDF object model (SURVEY.md §2.2 P1). Plain ADTs, executor-internal only —
  * never leak into Catalyst rows (the same serializability boundary the
  * reference draws, pdf.combined.js:45867-45881).
  */
sealed trait PObj

object PObj {
  case object PNull extends PObj
  final case class PBool(value: Boolean) extends PObj
  final case class PNum(value: Double) extends PObj {
    def int: Int = value.toInt
  }
  /** String object as raw bytes (PDF strings are byte strings). */
  final case class PStr(bytes: Array[Byte]) extends PObj {
    def latin1: String = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
  }
  final case class PName(name: String) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(entries: Map[String, PObj]) extends PObj {
    def get(key: String): Option[PObj] = entries.get(key)
    def has(key: String): Boolean = entries.contains(key)
  }
  /** Stream: dict + raw (still encoded) bytes, decode on demand. */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
  final case class PRef(num: Int, gen: Int) extends PObj
}
