package graft

import graft.pdf.PdfDocument
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Item-level parity against the reference's AUTHENTIC text-content output:
  * the src/test/resources/reference-*-page*-items.json fixtures were
  * produced by the vendored engine itself under node (the getinfo.js
  * surface — page.getTextContent() on EVERY page of each corpus PDF, item
  * strs + dirs dumped as JSON). Our TextItems walker must reproduce all
  * 10556 items (30 pages: 1301.4293 ×4, C04-1204 ×7, test24 ×12,
  * test25 ×7) one for one — full-document coverage, no per-page
  * induction gap. */
class TextItemsSpec extends AnyFunSuite {

  /** Minimal JSON parse for the fixture's flat shape
    * [{"str":..,"dir":..,"fontName":..},..] — no JSON dependency exists in
    * this build. Handles the full JSON escape set: Type3 math fonts with
    * identity-ish encodings emit control chars that serialize as \b \f \r
    * (decoding those as literal 'b'/'f'/'r' once produced phantom diffs). */
  private def parseFixture(json: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val m = java.util.regex.Pattern
      .compile("\\{\"str\":\\s*\"((?:[^\"\\\\]|\\\\.)*)\",\\s*\"dir\":\\s*\"([a-z]+)\"")
      .matcher(json)
    while (m.find()) {
      val raw = m.group(1)
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c == '\\' && i + 1 < raw.length) {
          raw.charAt(i + 1) match {
            case 'u' =>
              sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case other => sb.append(other); i += 2 // \" \\ \/
          }
        } else { sb.append(c); i += 1 }
      }
      out += ((sb.toString, m.group(2)))
    }
    out.result()
  }

  test("all four reference PDFs, every page: item-for-item equality with getTextContent") {
    // per-(paper, page) item counts pinned from the vendored-engine fixtures
    val counts = Map(
      ("1301.4293", 1) -> 118, ("1301.4293", 2) -> 310,
      ("1301.4293", 3) -> 113, ("1301.4293", 4) -> 44,
      ("C04-1204", 1) -> 648, ("C04-1204", 2) -> 740,
      ("C04-1204", 3) -> 623, ("C04-1204", 4) -> 725,
      ("C04-1204", 5) -> 787, ("C04-1204", 6) -> 695,
      ("C04-1204", 7) -> 625,
      ("test24", 1) -> 245, ("test24", 2) -> 528, ("test24", 3) -> 391,
      ("test24", 4) -> 463, ("test24", 5) -> 206, ("test24", 6) -> 244,
      ("test24", 7) -> 162, ("test24", 8) -> 220, ("test24", 9) -> 296,
      ("test24", 10) -> 175, ("test24", 11) -> 388, ("test24", 12) -> 493,
      ("test25", 1) -> 279, ("test25", 2) -> 139, ("test25", 3) -> 132,
      ("test25", 4) -> 85, ("test25", 5) -> 141, ("test25", 6) -> 390,
      ("test25", 7) -> 151)
    assert(counts.values.sum == 10556)
    var total = 0
    counts.keys.map(_._1).toSeq.distinct.sorted.foreach { name =>
      val pp = Paths.get(s"/root/reference/src/test/resources/input/$name.pdf")
      if (!Files.exists(pp)) cancel(s"reference PDF not present for $name")
      val doc = PdfDocument.open(Files.readAllBytes(pp))
      val pages = counts.keys.filter(_._1 == name).map(_._2).max
      assert(doc.pages.length == pages, s"$name page count")
      (1 to pages).foreach { page =>
        val fp = Paths.get(s"src/test/resources/reference-$name-page$page-items.json")
        if (!Files.exists(fp)) cancel(s"fixture not present for $name p$page")
        val expected = parseFixture(
          new String(Files.readAllBytes(fp), StandardCharsets.UTF_8))
        assert(expected.length == counts((name, page)), s"$name p$page fixture size")
        val got = doc.textContentItems(page - 1)
        assert(got.length == expected.length,
          s"$name p$page item count ${got.length} vs ${expected.length}")
        got.zip(expected).zipWithIndex.foreach { case ((item, (str, dir)), i) =>
          assert(item.str == str, s"$name p$page item $i: '${item.str}' vs '$str'")
          assert(item.dir == dir, s"$name p$page item $i dir")
        }
        total += got.length
      }
    }
    assert(total == 10556)
  }

  test("same-line Td merge joins words; a large move flushes") {
    import graft.eval.{FontSpec, PageResources}
    val res = PageResources.fromMap(Map(
      "F1" -> FontSpec("Times", _ => 500.0)))
    def items(content: String) =
      graft.extract.TextItems.extract(content.getBytes("ISO-8859-1"), res)
    // widths 500/1000em at size 10 → glyph 5 units, spaceWidth 5 units;
    // fakeMultiSpaceMax = 20. "AB" advances lastAdvanceWidth = 10.
    // Td(18, 0): advance 18 ≤ 20 merges, diff 8 → round(8/5) = 2 spaces.
    val merged = items("BT /F1 10 Tf 10 700 Td (AB) Tj 18 0 Td (CD) Tj ET")
    assert(merged.map(_.str) == Vector("AB  CD"))
    // Td(30, 0): advance 30 > 20 → flush, two items
    val split = items("BT /F1 10 Tf 10 700 Td (AB) Tj 30 0 Td (CD) Tj ET")
    assert(split.map(_.str) == Vector("AB", "CD"))
    // Td with dy ≠ 0 never merges
    val moved = items("BT /F1 10 Tf 10 700 Td (AB) Tj 12 -11 Td (CD) Tj ET")
    assert(moved.map(_.str) == Vector("AB", "CD"))
  }

  test("TJ thresholds: small kern nothing, mid kern one space, big kern breaks") {
    import graft.eval.{FontSpec, PageResources}
    val res = PageResources.fromMap(Map(
      "F1" -> FontSpec("Times", _ => 500.0),
      "M1" -> FontSpec("Mono", _ => 500.0, monospace = true)))
    def items(content: String) =
      graft.extract.TextItems.extract(content.getBytes("ISO-8859-1"), res)
    // spaceWidth 5 text units = TJ units /1000 * size: kern -n → advance
    // n*10/1000; fakeSpaceMin 1.5, fakeMultiSpaceMin 7.5, fakeMultiSpaceMax 20
    assert(items("BT /F1 10 Tf (A) Tj [(B) -100 (C)] TJ ET").map(_.str) ==
      Vector("ABC")) // advance 1 < 1.5: nothing
    assert(items("BT /F1 10 Tf [(B) -400 (C)] TJ ET").map(_.str) ==
      Vector("B C")) // advance 4 in [1.5, 7.5): one space
    assert(items("BT /F1 10 Tf [(B) -1000 (C)] TJ ET").map(_.str) ==
      Vector("B  C")) // advance 10 in [7.5, 20]: round(10/5) = 2 spaces
    assert(items("BT /F1 10 Tf [(B) -2500 (C)] TJ ET").map(_.str) ==
      Vector("B", "C")) // advance 25 > 20: run break
    // monospace fonts never break: they fake as much space as needed
    assert(items("BT /M1 10 Tf [(B) -2500 (C)] TJ ET").map(_.str) ==
      Vector("B     C"))
  }

  test("a stray Q inside a form XObject never aborts item extraction") {
    import graft.eval.{FontSpec, FormXObject, PageResources}
    val base = PageResources.fromMap(Map("F1" -> FontSpec("Times", _ => 500.0)))
    val res = new PageResources {
      def font(name: String): FontSpec = base.font(name)
      override def form(name: String): Option[FormXObject] =
        if (name == "Fm1") Some(FormXObject(
          // the stray Q consumes the Do snapshot (reference shares one
          // state stack and its restore() no-ops when empty)
          "Q BT /F1 10 Tf 5 5 Td (IN) Tj ET".getBytes("ISO-8859-1"),
          base, Array(1.0, 0, 0, 1, 0, 0), "fm1"))
        else None
    }
    val content = "BT /F1 10 Tf 10 700 Td (A) Tj ET /Fm1 Do BT /F1 10 Tf 10 600 Td (B) Tj ET"
    val items = graft.extract.TextItems.extract(content.getBytes("ISO-8859-1"), res)
    assert(items.map(_.str) == Vector("A", "IN", "B"))
  }

  test("normalizeWhitespace option matches getTextContent({normalizeWhitespace:true})") {
    // expectations verified against the vendored engine under node
    // (/tmp/getitems_nw.js over Synth.pdfWithWhitespaceText): an item with
    // any char outside printable ASCII gets every JS-\s char (NBSP, TAB,
    // ideographic space) replaced by 0x20 — and the fast scan stops at a
    // TAB too (0x09 < 0x20), so a pure-ASCII-plus-TAB item normalizes as
    // well; without the option both items pass through untouched
    val doc = PdfDocument.open(graft.testgen.Synth.pdfWithWhitespaceText())
    val plain = doc.textContentItems(0)
    assert(plain.map(_.str) == Vector("é E\t　", "E\tE"))
    val norm = doc.textContentItems(0, normalizeWhitespace = true)
    assert(norm.map(_.str) == Vector("é E  ", "E E"))
    assert(norm.map(_.dir) == Vector("ltr", "ltr"))
  }

  test("textContentText renders the getinfo join of the fixture items") {
    val fp = Paths.get("src/test/resources/reference-C04-1204-page1-items.json")
    val pp = Paths.get("/root/reference/src/test/resources/input/C04-1204.pdf")
    if (!Files.exists(fp) || !Files.exists(pp)) cancel("fixtures not present")
    val expected = parseFixture(
      new String(Files.readAllBytes(fp), StandardCharsets.UTF_8))
      .map(_._1).mkString(" ")
    val doc = PdfDocument.open(Files.readAllBytes(pp))
    val text = doc.textContentText(0)
    assert(text == expected)
    assert(text.startsWith("Deep Linguistic Analysis"))
  }
}
