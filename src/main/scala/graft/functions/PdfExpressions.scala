package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JDK PDF text extraction (r19, VERDICT r18 #3): the
  * `application/pdf` route out of [[graft.ops.HttpOps.sniffMediaType]]
  * — PDFs are a meaningful, high-quality slice of a real crawl, and
  * until now the x162 sniff detected them only to DROP the document.
  *
  * How PDF text actually travels (ISO 32000-1): page content lives in
  * CONTENT STREAMS — `<< /Length … /Filter /FlateDecode >> stream …
  * endstream` objects whose decoded bytes are a sequence of graphics
  * operators, among them the TEXT-SHOWING operators `Tj` / `'` / `"`
  * (one literal string each) and `TJ` (an array of strings with
  * inter-glyph kerning numbers). FlateDecode is zlib (RFC 1950) — the
  * same `java.util.zip.Inflater` kernel the repo's deflate tier
  * already uses — so the common case needs no external jar.
  *
  * Extraction walk (both tiers strict, the never-throw contract):
  *
  *  1. signature: input must start `%PDF-`, else NULL (not a PDF);
  *  2. stream scan: each `stream` keyword (preceded by `>>` or
  *     whitespace, followed by the spec's EOL) up to its `endstream`;
  *     the governing dictionary is the BALANCED `<< … >>` immediately
  *     before the keyword. `/FlateDecode` streams inflate (zlib, raw
  *     retry — the InflateToString discipline, shared size cap);
  *     filterless streams are taken raw; any OTHER filter
  *     (DCTDecode images, LZW, crypt) skips the stream — images are
  *     not text;
  *  3. operator walk over each decoded stream: literal strings
  *     `(…)` (balanced parens, the `\( \) \\ \n \r \t \b \f`
  *     escapes, octal `\ddd`, escaped-EOL continuation) buffer as
  *     pending; `Tj`/`TJ` emit pending strings; `'`/`"` emit a line
  *     break then the string; `Td`/`TD`/`T*`/`ET` emit a line break;
  *     any other operator clears pending (strings in non-text roles
  *     never leak into the output). TJ kerning numbers are ignored —
  *     spacing inside a PDF comes from the strings themselves.
  *
  * Deliberate fidelity bounds (documented, the heuristic-tier rule):
  * bytes map to chars as latin1 (exact for Standard/WinAnsi-encoded
  * latin text — the overwhelmingly common case; subsetted fonts with
  * custom CMaps need the font's ToUnicode table, a full PDF reader's
  * job); hex strings `<…>` are skipped (they are CMap-coded in
  * practice — emitting them would be mojibake, worse than absence);
  * xref tables are not consulted (the stream scan sees every content
  * stream regardless); object streams (`/Type /ObjStm`, themselves
  * compressed containers of other objects) are not unpacked.
  *
  * Never-throw contract: non-PDF input, a `stream` with no
  * `endstream`, an unbalanced dictionary, a declared-Flate stream
  * that does not inflate, or a decompressed size past the shared cap
  * → NULL (the honest malformed-document miss, auditable as a row);
  * a well-formed PDF with no text operators → the empty string
  * (a real answer: "this PDF has no extractable text").
  */
case class PdfToText(child: Expression) extends ViewCodecExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "pdf_to_text"
  override protected def acceptedType: DataType =
    org.apache.spark.sql.types.BinaryType
  override protected def nullValueJava: String = "UTF8String"
  override protected def computeCall(c: String): String =
    s"graft.functions.PdfToText.compute($c)"
  override protected def nullSafeEval(input: Any): Any =
    PdfToText.compute(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): PdfToText =
    copy(child = newChild)
}

object PdfToText {
  /** zlib inflate with the raw-deflate retry and the shared size cap —
    * the [[InflateToString]] arms over byte slices.
    */
  private def inflate(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    def arm(nowrap: Boolean): Array[Byte] =
      try {
        val in = new java.util.zip.InflaterInputStream(
          new java.io.ByteArrayInputStream(bytes, off, len),
          new java.util.zip.Inflater(nowrap))
        val out = GunzipToString.drain(in)
        in.close()
        out
      } catch { case _: java.io.IOException => null }
    if (len <= 0) return null
    val zlib = arm(nowrap = false)
    if (zlib != null) zlib else arm(nowrap = true)
  }

  /** The balanced `<< … >>` dictionary ending nearest before `pos`,
    * or null when none balances — walked backwards counting nested
    * dict delimiters.
    */
  private def dictBefore(s: String, pos: Int): String = {
    var k = pos - 1
    // skip whitespace between `>>` and `stream`
    while (k >= 0 && Character.isWhitespace(s.charAt(k))) k -= 1
    if (k < 1 || s.charAt(k) != '>' || s.charAt(k - 1) != '>') return null
    val end = k + 1
    var depth = 1
    k -= 2
    while (k >= 1 && depth > 0) {
      if (s.charAt(k) == '>' && s.charAt(k - 1) == '>') { depth += 1; k -= 2 }
      else if (s.charAt(k) == '<' && s.charAt(k - 1) == '<') {
        depth -= 1
        if (depth == 0) return s.substring(k - 1, end)
        k -= 2
      }
      else k -= 1
    }
    null
  }

  /** One literal PDF string starting at the `(` at `i`; returns
    * (decoded, indexAfterClose) or null on an unterminated string.
    */
  private def literalString(s: String, i: Int): (String, Int) = {
    val out = new java.lang.StringBuilder
    var k = i + 1
    var depth = 1
    while (k < s.length) {
      val c = s.charAt(k)
      if (c == '\\' && k + 1 < s.length) {
        val e = s.charAt(k + 1)
        e match {
          case 'n' => out.append('\n'); k += 2
          case 'r' => out.append('\r'); k += 2
          case 't' => out.append('\t'); k += 2
          case 'b' => out.append('\b'); k += 2
          case 'f' => out.append('\f'); k += 2
          case '(' => out.append('('); k += 2
          case ')' => out.append(')'); k += 2
          case '\\' => out.append('\\'); k += 2
          case '\r' => // escaped EOL = continuation (swallow \r\n or \r)
            k += (if (k + 2 < s.length && s.charAt(k + 2) == '\n') 3 else 2)
          case '\n' => k += 2
          case d if d >= '0' && d <= '7' => // octal, 1-3 digits
            var v = 0; var n = 0; var j = k + 1
            while (n < 3 && j < s.length &&
                s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); n += 1; j += 1
            }
            out.append((v & 0xFF).toChar); k = j
          case other => out.append(other); k += 2 // spec: drop the \
        }
      } else if (c == '(') { depth += 1; out.append(c); k += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth == 0) return (out.toString, k + 1)
        out.append(c); k += 1
      }
      else { out.append(c); k += 1 }
    }
    null // unterminated
  }

  /** Text-showing walk over ONE decoded content stream (see the
    * expression scaladoc for the operator policy). Appends to `out`.
    */
  private def extractOps(stream: String, out: java.lang.StringBuilder): Unit = {
    val pending = new scala.collection.mutable.ArrayBuffer[String](4)
    def break(): Unit =
      if (out.length > 0 && out.charAt(out.length - 1) != '\n')
        out.append('\n')
    def flush(): Unit = { pending.foreach(out.append(_)); pending.clear() }
    var k = 0
    while (k < stream.length) {
      val c = stream.charAt(k)
      if (c == '(') {
        literalString(stream, k) match {
          case null => k = stream.length // unterminated: stop this stream
          case (str, next) => pending += str; k = next
        }
      } else if (c == '<') {
        // hex string (skipped — see fidelity bounds) or dict delimiter
        if (k + 1 < stream.length && stream.charAt(k + 1) == '<') k += 2
        else {
          val close = stream.indexOf('>', k + 1)
          k = if (close < 0) stream.length else close + 1
        }
      } else if (c == '\'') { break(); flush(); k += 1 }
      else if (c == '"') { break(); flush(); k += 1 }
      else if (c == '/') { // name token: skip (never an operator)
        k += 1
        while (k < stream.length && !Character.isWhitespace(stream.charAt(k))
            && "()<>[]{}/%".indexOf(stream.charAt(k)) < 0) k += 1
      } else if (Character.isLetter(c) || c == '*') {
        val start = k
        while (k < stream.length && (Character.isLetter(stream.charAt(k))
            || stream.charAt(k) == '*')) k += 1
        stream.substring(start, k) match {
          case "Tj" | "TJ" => flush()
          case "Td" | "TD" | "T*" | "ET" => break(); pending.clear()
          case _ => pending.clear() // strings in a non-text role
        }
      } else k += 1 // numbers, [, ], whitespace, delimiters
    }
  }

  def compute(bytes: Array[Byte]): UTF8String = {
    val s = Latin1View.toView(bytes)
    if (!s.startsWith("%PDF-")) return null
    val out = new java.lang.StringBuilder
    var idx = 0
    var i = s.indexOf("stream", idx)
    while (i >= 0) {
      // the keyword, not a substring (endstream / "streaming" text):
      // preceded by dict-close or whitespace, followed by the EOL the
      // spec requires
      val precedes = i > 0 &&
        (s.charAt(i - 1) == '>' || Character.isWhitespace(s.charAt(i - 1)))
      var j = i + 6
      val eolOk = j < s.length && (s.charAt(j) == '\n' ||
        (s.charAt(j) == '\r' && j + 1 < s.length && s.charAt(j + 1) == '\n'))
      if (precedes && eolOk) {
        j += (if (s.charAt(j) == '\r') 2 else 1)
        val end = s.indexOf("endstream", j)
        if (end < 0) return null // malformed: unterminated stream
        var dataEnd = end
        // strip the EOL before `endstream` (it belongs to the framing)
        if (dataEnd > j && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
        if (dataEnd > j && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
        val dict = dictBefore(s, i)
        if (dict == null) return null // malformed: no governing dict
        if (dict.contains("/FlateDecode")) {
          val raw = inflate(bytes, j, dataEnd - j)
          if (raw == null) return null // declared Flate, does not inflate
          extractOps(Latin1View.toView(raw), out)
        } else if (!dict.contains("/Filter")) {
          extractOps(s.substring(j, dataEnd), out)
        } // other filters: not text — skip
        idx = end + 9
      } else idx = i + 6
      i = s.indexOf("stream", idx)
    }
    // trailing framing newlines are noise; interior structure is real
    var n = out.length
    while (n > 0 && (out.charAt(n - 1) == '\n' || out.charAt(n - 1) == '\r'))
      n -= 1
    UTF8String.fromString(out.substring(0, n))
  }
}
