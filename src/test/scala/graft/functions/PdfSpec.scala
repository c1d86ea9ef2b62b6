package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden units for the pure-JDK PDF text kernel (r19): the operator
  * walk, the string escapes, the FlateDecode arm over REAL zlib bytes,
  * and the never-throw malformed contract.
  */
class PdfSpec extends AnyFunSuite {

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def extract(s: String): String = {
    val r = PdfToText.compute(latin1(s))
    if (r == null) null else r.toString
  }
  private def pdfWithRaw(content: String): String =
    "%PDF-1.4\n4 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF"

  test("Tj/T* walk: two text lines with an accent byte") {
    val got = extract(pdfWithRaw(
      "BT /F1 12 Tf 72 720 Td (Report 7 first line.) Tj T* " +
        "(Second: café 7.) Tj ET"))
    assert(got == "Report 7 first line.\nSecond: café 7.")
  }

  test("TJ array concatenates strings and ignores kerning numbers; " +
      "escapes resolve; ' and \" break lines") {
    val got = extract(pdfWithRaw(
      "BT [(Table ) 20 (of) -120 ( contents)] TJ " +
        "(Escaped \\(parens\\) and backslash \\\\ end.) ' " +
        "(Octal \\101\\102 tab\\there.) Tj ET"))
    assert(got == "Table of contents\nEscaped (parens) and backslash " +
      "\\ end.Octal AB tab\there.")
  }

  test("strings bound to NON-text operators never leak; hex strings " +
      "are skipped") {
    val got = extract(pdfWithRaw(
      "BT (leaked?) Tz (kept.) Tj <48656C6C6F> Tj ET"))
    assert(got == "kept.")
  }

  test("FlateDecode stream: REAL zlib bytes round-trip through the " +
      "kernel") {
    val content = "BT (Deflated body text.) Tj ET"
    val coded = DeflateBytes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(content))
    val view = new String(coded.map(b => (b & 0xFF).toChar))
    val pdf = "%PDF-1.4\n4 0 obj\n<< /Length " + coded.length +
      " /Filter /FlateDecode >>\nstream\n" + view +
      "\nendstream\nendobj\n%%EOF"
    assert(extract(pdf) == "Deflated body text.")
  }

  test("never-throw contract: non-PDF null; declared-Flate garbage " +
      "null; unterminated stream null; textless PDF empty string; " +
      "image-filter streams skipped") {
    assert(extract("not a pdf at all") == null)
    assert(extract("%PDF-1.4\n<< /Filter /FlateDecode >>\nstream\n" +
      "garbage bytes\nendstream") == null)
    assert(extract("%PDF-1.4\n<< >>\nstream\nno terminator ever") == null)
    assert(extract("%PDF-1.4\nempty body\n%%EOF") == "")
    assert(extract(pdfWithRaw("0 0 100 100 re f").replace(
      "<< /Length", "<< /Filter /DCTDecode /Length")) == "")
  }

  test("UTF-16BE literal string: FE FF BOM decodes real non-latin text " +
      "(r20, VERDICT r19 #3)") {
    val BOM = "\uFEFF"
    val txt = "日本語の見出しです。"
    val view = new String((BOM + txt).getBytes("UTF-16BE"), "ISO-8859-1")
    val got = extract(pdfWithRaw("BT (" + view + ") Tj ET"))
    assert(got == txt)
  }

  test("UTF-16BE hex string decodes; BOM-less hex stays skipped") {
    val got = extract(pdfWithRaw(
      "BT <FEFF00480065006C006C006F0021> Tj <48656C6C6F> Tj " +
        "(tail.) Tj ET"))
    assert(got == "Hello!tail.")
  }

  test("/Length framing survives literal 'endstream' bytes inside the " +
      "data (r20, ADVICE r19)") {
    val got = extract(pdfWithRaw(
      "BT (Before line.) Tj T* (endstream inside data.) Tj ET"))
    assert(got == "Before line.\nendstream inside data.")
  }

  test("indirect /Length (N G R) falls back to the endstream scan") {
    val content = "BT (Indirect ok.) Tj ET"
    val pdf = "%PDF-1.4\n4 0 obj\n<< /Length 5 0 R >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF"
    assert(extract(pdf) == "Indirect ok.")
  }

  test("per-stream degradation: one bad Flate stream skips, the good " +
      "stream still extracts (r20, ADVICE r19)") {
    val good = "BT (Survivor text.) Tj ET"
    val pdf = "%PDF-1.4\n1 0 obj\n<< /Length 7 /Filter /FlateDecode >>\n" +
      "stream\ngarbage\nendstream\nendobj\n2 0 obj\n<< /Length " +
      good.length + " >>\nstream\n" + good +
      "\nendstream\nendobj\n%%EOF"
    assert(extract(pdf) == "Survivor text.")
  }

  test("property: any latin1 text round-trips through an escaped " +
      "literal string (200 seeded trials)") {
    val rnd = new scala.util.Random(20)
    val pool = (' ' to '~').mkString + "()\\\n\t" + "áéÿ×÷"
    (1 to 200).foreach { _ =>
      val raw = Seq.fill(rnd.nextInt(60))(
        pool(rnd.nextInt(pool.length))).mkString
      // the §7.3.4.2 escapes a writer must apply; everything else is raw
      val esc = raw.replace("\\", "\\\\")
        .replace("(", "\\(").replace(")", "\\)")
      val got = extract(pdfWithRaw("BT (" + esc + ") Tj ET"))
      val want = raw.replaceAll("[\r\n]+$", "") // framing-trim contract
      assert(got == want, s"raw=${raw.map(_.toInt).mkString(",")}")
    }
  }

  test("property: any BMP text round-trips through a UTF-16BE hex " +
      "string (200 seeded trials)") {
    val rnd = new scala.util.Random(21)
    // surrogate-free pools across the scripts the engine routes
    val pools = Seq(
      ('a' to 'z').mkString, "àâçéèêëîïôùûüÿ",
      "日本語の見出しですページ第二行中文内容",
      "αβγδεζηθικλμνξο", "אבגדהוזחטיכלמנ", "ابتثجحخدذرزسشص",
      "कखगघङचछजझञटठडढण", "0123456789 .,!?")
    (1 to 200).foreach { _ =>
      val raw = Seq.fill(1 + rnd.nextInt(40)) {
        val p = pools(rnd.nextInt(pools.length))
        p(rnd.nextInt(p.length))
      }.mkString
      val BOM = "\uFEFF"
      val hexStr = (BOM + raw).getBytes("UTF-16BE")
        .map(b => f"${b & 0xFF}%02X").mkString
      val got = extract(pdfWithRaw("BT <" + hexStr + "> Tj ET"))
      assert(got == raw.replaceAll("[\r\n]+$", ""))
    }
  }

  test("property: %PDF--prefixed random bytes never throw (200 seeded " +
      "trials)") {
    val rnd = new scala.util.Random(19)
    (1 to 200).foreach { _ =>
      val tail = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(tail)
      val bytes = "%PDF-".getBytes("ISO-8859-1") ++ tail
      PdfToText.compute(bytes) // null or string — must not throw
    }
  }
}
