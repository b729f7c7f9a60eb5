package graft.eval

/** Content-stream operator table: the 73 commands the reference accepts
  * (opMap, /root/reference/src/main/js/pdf.combined.js:47221-47329), with
  * arity and variable-args flags. Commands are from the public PDF spec
  * (ISO 32000-1 §A.2); the tolerance rules (skip unknown, rebalance excess
  * args) mirror EvaluatorPreprocessor.read (pdf.combined.js:47366-47434).
  */
final case class OpSpec(name: String, numArgs: Int, variableArgs: Boolean = false)

object OpTable {
  val ops: Map[String, OpSpec] = Seq(
    // graphics state
    OpSpec("w", 1), OpSpec("J", 1), OpSpec("j", 1), OpSpec("M", 1),
    OpSpec("d", 2), OpSpec("ri", 1), OpSpec("i", 1), OpSpec("gs", 1),
    OpSpec("q", 0), OpSpec("Q", 0), OpSpec("cm", 6),
    // path construction + painting
    OpSpec("m", 2), OpSpec("l", 2), OpSpec("c", 6), OpSpec("v", 4),
    OpSpec("y", 4), OpSpec("h", 0), OpSpec("re", 4),
    OpSpec("S", 0), OpSpec("s", 0), OpSpec("f", 0), OpSpec("F", 0),
    OpSpec("f*", 0), OpSpec("B", 0), OpSpec("B*", 0), OpSpec("b", 0),
    OpSpec("b*", 0), OpSpec("n", 0),
    // clipping
    OpSpec("W", 0), OpSpec("W*", 0),
    // text
    OpSpec("BT", 0), OpSpec("ET", 0),
    OpSpec("Tc", 1), OpSpec("Tw", 1), OpSpec("Tz", 1), OpSpec("TL", 1),
    OpSpec("Tf", 2), OpSpec("Tr", 1), OpSpec("Ts", 1),
    OpSpec("Td", 2), OpSpec("TD", 2), OpSpec("Tm", 6), OpSpec("T*", 0),
    OpSpec("Tj", 1), OpSpec("TJ", 1), OpSpec("'", 1), OpSpec("\"", 3),
    // type3 glyph metrics
    OpSpec("d0", 2), OpSpec("d1", 6),
    // color
    OpSpec("CS", 1), OpSpec("cs", 1),
    OpSpec("SC", 4, variableArgs = true), OpSpec("SCN", 33, variableArgs = true),
    OpSpec("sc", 4, variableArgs = true), OpSpec("scn", 33, variableArgs = true),
    OpSpec("G", 1), OpSpec("g", 1), OpSpec("RG", 3), OpSpec("rg", 3),
    OpSpec("K", 4), OpSpec("k", 4),
    // shading / images / xobjects
    OpSpec("sh", 1), OpSpec("BI", 0), OpSpec("ID", 0), OpSpec("EI", 0),
    OpSpec("Do", 1),
    // marked content / compatibility
    OpSpec("MP", 1), OpSpec("DP", 2), OpSpec("BMC", 1), OpSpec("BDC", 2),
    OpSpec("EMC", 0), OpSpec("BX", 0), OpSpec("EX", 0)
  ).map(s => s.name -> s).toMap

  /** Command set for the lexer's early-break rule — the full op table plus the
    * reference's reserved partial commands (pdf.combined.js:47319-47328), which
    * keep multi-char tokens whose first char is itself a command (`false`,
    * `null`, `BMC`, `BDC`) from being split. */
  val knownCommands: Set[String] = ops.keySet ++ Set(
    "BM", "BD", "true", "fa", "fal", "fals", "false", "nu", "nul", "null")
}
