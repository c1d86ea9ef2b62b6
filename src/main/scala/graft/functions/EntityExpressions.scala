package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML entity decoding as ONE single-pass Catalyst expression — the
  * entity stage of [[graft.ops.HtmlOps.htmlToText]].
  *
  * Why custom (the CanonicalizeUrl rationale): r15 decoded 7 named
  * entities as a replace-chain; adding numeric character references
  * (`&#8217;` / `&#x27;` — constant in real pages, VERDICT r15 missing
  * #2) as replaces would mean ~220 full-string passes per document.
  * One left-to-right pass decodes everything in O(n) and keeps the
  * plan at one node.
  *
  * Decode rules (each deliberate — the C4 regex-extractor tier, not a
  * browser):
  *
  *  - named: the 6-entry [[DecodeHtmlEntities.Named]] set (`&lt; &gt;
  *    &quot; &apos; &nbsp; &amp;`); `&nbsp;` decodes to a PLAIN space
  *    (extractor-tier whitespace normalization — a U+00A0 would evade
  *    the downstream `\s+` collapse and the space-split word counts);
  *  - numeric: `&#NNN;` (decimal, no leading zero, ≤7 digits) and
  *    `&#xHH;` (lowercase `x`, lowercase hex, no leading zero) for
  *    printable ASCII (32–126) plus the
  *    [[DecodeHtmlEntities.PunctCodepoints]] common-punctuation set;
  *    160 (no-break space) also decodes to a plain space;
  *  - everything else — unknown names, out-of-range codepoints,
  *    leading-zero or uppercase-hex forms, missing `;` — is left as
  *    literal text (documented bounds, provable through the oracle:
  *    the fixture plants an out-of-range and a leading-zero ref);
  *  - NON-RECURSIVE: the scan continues AFTER each replacement, so
  *    `&amp;lt;` decodes to the literal text `&lt;`, never to `<` —
  *    the double-decode class the r15 `&amp;`-last replace ordering
  *    guarded against, now structural.
  *
  * The DuckDB mirror reproduces the single-pass semantics with a
  * sentinel construction (mark numeric refs → run the named chain
  * with `&amp;` last → reconstruct marked refs), which is equivalent
  * because a marked ref can no longer feed the named replaces — the
  * same non-recursion guarantee. Sentinel bound: mirror-side only,
  * input text containing the U+0001/U+0002 marker chars would corrupt (the WarcOps
  * sentinel class; the kernel itself has no sentinel).
  */
case class DecodeHtmlEntities(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_html_entities"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    DecodeHtmlEntities.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |UTF8String ${ev.value} = null;
        """.stripMargin)
    else
      defineCodeGen(ctx, ev,
        c => s"graft.functions.DecodeHtmlEntities.compute($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DecodeHtmlEntities = copy(child = newChild)
}

object DecodeHtmlEntities {
  /** Named entities (name → replacement). `&amp;` needs no ordering
    * discipline here — the single pass is non-recursive by scan
    * position.
    */
  val Named: Seq[(String, String)] = Seq(
    "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "amp" -> "&")

  /** Common-punctuation codepoints decoded beyond printable ASCII —
    * the refs real pages actually carry (curly quotes, dashes,
    * ellipsis, ™ © ® ° · × • €). 160 (nbsp) decodes to a plain
    * space, see the class doc. ONE list: the DuckDB mirror membership
    * test interpolates it.
    */
  val PunctCodepoints: Seq[Int] = Seq(
    160, 169, 174, 176, 183, 215, 8211, 8212, 8216, 8217, 8220, 8221,
    8226, 8230, 8364, 8482)

  private val named = {
    val m = new java.util.HashMap[String, String]()
    Named.foreach { case (k, v) => m.put(k, v) }
    m
  }
  private val punct: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer]()
    PunctCodepoints.foreach(cp => s.add(cp))
    s
  }

  private def inRange(cp: Int): Boolean =
    (cp >= 32 && cp <= 126) || punct.contains(cp)

  /** Replacement for codepoint `cp`, assuming [[inRange]]. */
  private def charFor(cp: Int): String =
    if (cp == 160) " " else new String(Character.toChars(cp))

  // Longest named entity is 4 chars ("quot"/"apos"/"nbsp").
  private val MaxName = 4
  // ≤ 7 decimal digits / ≤ 6 hex digits (the mirror's regex bounds).
  private val MaxDec = 7
  private val MaxHex = 6

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    var i = s.indexOf('&')
    if (i < 0) return input
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (i >= 0) {
      sb.append(s, pos, i)
      val end = tryDecode(s, i, sb)
      if (end > 0) pos = end
      else { sb.append('&'); pos = i + 1 }
      i = s.indexOf('&', pos)
    }
    sb.append(s, pos, s.length)
    UTF8String.fromString(sb.toString)
  }

  /** Attempt to decode the entity starting at `i` (s(i) == '&');
    * appends the replacement to `sb` and returns the index AFTER the
    * `;` on success, -1 (nothing appended) otherwise.
    */
  private def tryDecode(s: String, i: Int, sb: java.lang.StringBuilder): Int = {
    val n = s.length
    if (i + 1 >= n) return -1
    if (s.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && s.charAt(j) == 'x') { hex = true; j += 1 }
      val start = j
      val maxDigits = if (hex) MaxHex else MaxDec
      var cp = 0
      var count = 0
      var ok = true
      while (ok && j < n && count < maxDigits) {
        val c = s.charAt(j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (hex && c >= 'a' && c <= 'f') c - 'a' + 10
          else -1
        if (d < 0) ok = false
        else { cp = cp * (if (hex) 16 else 10) + d; j += 1; count += 1 }
      }
      // no leading zero (the mirror regex's [1-9]/[1-9a-f] first char),
      // at least one digit, and a closing ';' right after the run
      if (count == 0 || s.charAt(start) == '0' ||
        j >= n || s.charAt(j) != ';') return -1
      if (!inRange(cp)) return -1
      sb.append(charFor(cp))
      j + 1
    } else {
      val limit = math.min(n, i + 1 + MaxName + 1)
      var sc = i + 1
      while (sc < limit && s.charAt(sc) != ';') sc += 1
      if (sc >= limit || sc >= n || s.charAt(sc) != ';') return -1
      val rep = named.get(s.substring(i + 1, sc))
      if (rep == null) return -1
      sb.append(rep)
      sc + 1
    }
  }
}
