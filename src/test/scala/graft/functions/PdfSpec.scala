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
