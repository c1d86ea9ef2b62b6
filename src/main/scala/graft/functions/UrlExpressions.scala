package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization as ONE Catalyst expression.
  *
  * Why custom (the NGramExpressions rationale, but for plan SIZE rather
  * than eval speed): the column-composition form in
  * [[graft.ops.UrlOps.canonicalizeUrlColumns]] references its input
  * ~15 times, so every composition layer (resolve → canonicalize) and
  * every optimizer substitution (predicate pushdown re-inlines
  * key-derived filters below the projections) MULTIPLIES the tree —
  * the x137 plan carried a single Filter with 3,244 regexp nodes over
  * the exploded link stream, pushing generated code toward Janino's
  * method limits. As one expression node, composition and pushdown
  * each copy ONE call; `doGenCode` emits a static invocation so the
  * stage stays inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the column form — same Java-regex
  * steps, same empty→NULL points, same bytewise param sort
  * (UrlOpsSpec pins equivalence on every rule arm and a generator;
  * the x131–x138 DuckDB gates pin it against the second engine).
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonicalize_url"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType accepted alongside StringType (standard convention)
      case StringType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CanonicalizeUrl.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |UTF8String ${ev.value} = null;
        """.stripMargin)
    else {
      // compute() returns null for non-absolute input — nullSafeCodeGen
      // with an explicit null re-check (defineCodeGen assumes non-null
      // results)
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.CanonicalizeUrl.compute($c);
        |${ev.isNull} = (${ev.value} == null);
        """.stripMargin)
    }
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

/** eTLD+1 of a URL's canonical host, as ONE expression — the fused
  * `registeredDomain(host(url))` composition every link/frontier query
  * keys on (same plan-size rationale as [[CanonicalizeUrl]]: the
  * column composition re-inlines the host tree ~3× and the input ~9×
  * when pushdown substitutes it into a filter). NULL for non-absolute
  * input or an empty host; bit-equivalent to the column form
  * (UrlOpsSpec pins it on the same generator).
  *
  * `suffixes` is the multi-label public-suffix DATA the algorithm
  * (longest-known-suffix + 1 label) consults — defaulting to the
  * built-in [[RegisteredDomainOf.MultiLabelSuffixes]] subset, and
  * loadable from a real PSL file via `UrlOps.loadPsl` (r16; VERDICT
  * r15 #5: the data should ship without a source change). The set is
  * driver-held plan state shipped to executors as a codegen reference
  * object (the k-means-codebook legitimacy class — the full PSL is
  * ~9k rules, KBs, not a broadcast-worthy table).
  */
case class RegisteredDomainOf(
    child: Expression,
    suffixes: Seq[String] = RegisteredDomainOf.MultiLabelSuffixes.toSeq)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registered_domain_of"

  // built once per expression instance, serialized with the plan
  private val suffixSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    suffixes.foreach(s.add)
    s
  }

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
    RegisteredDomainOf.compute(input.asInstanceOf[UTF8String], suffixSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == NullType)
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |UTF8String ${ev.value} = null;
        """.stripMargin)
    else {
      // the suffix set rides the generated class as a reference object
      // (serialized to executors with the plan — a static registry
      // would exist only on the driver JVM)
      val setRef = ctx.addReferenceObj("suffixSet", suffixSet,
        "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.RegisteredDomainOf.compute($c, $setRef);
        |${ev.isNull} = (${ev.value} == null);
        """.stripMargin)
    }
  override protected def withNewChildInternal(newChild: Expression): RegisteredDomainOf =
    copy(child = newChild)
}

object RegisteredDomainOf {
  /** Multi-label public-suffix subset (mirrors UrlOps.MultiLabelSuffixes
    * — the ops constant delegates here, one list for both layers and
    * the DuckDB mirrors). The DEFAULT data; a deployment loads the
    * full PSL with `UrlOps.loadPsl` and passes it to the expression.
    */
  val MultiLabelSuffixes: Array[String] = Array(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.in", "co.nz", "com.br", "com.mx",
    "com.cn", "com.sg", "com.tr", "co.za", "com.hk")

  def compute(input: UTF8String,
              multiSet: java.util.HashSet[String]): UTF8String = {
    val host = CanonicalizeUrl.hostOf(input.toString)
    if (host == null) return null
    // last2: the `([^.]+\.[^.]+)$` extract — two trailing NONEMPTY
    // labels; no match → the host itself (dotless/degenerate hosts)
    val d2 = host.lastIndexOf('.')
    val last2ok = d2 > 0 && d2 < host.length - 1 &&
      host.charAt(d2 - 1) != '.'
    if (!last2ok) return UTF8String.fromString(host)
    val d1 = host.lastIndexOf('.', d2 - 1)
    val last2 = host.substring(d1 + 1)
    if (multiSet.contains(last2)) {
      // last3: three trailing nonempty labels, else fall back to last2
      val d0 = if (d1 <= 0) -2 else host.lastIndexOf('.', d1 - 1)
      val last3ok = d1 > 0 && d1 - 1 >= d0 + 1
      if (last3ok) return UTF8String.fromString(host.substring(d0 + 1))
    }
    UTF8String.fromString(last2)
  }
}

object CanonicalizeUrl {
  // the exact patterns of the column form (same java.util.regex engine
  // Spark's regexp_* expressions use)
  private val SchemeRe = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")

  /** Lowercase through the SAME path the column form's `lower()` takes
    * (`UTF8String.toLowerCase`): for ASCII it is a branchless byte map,
    * and for non-ASCII it falls back to whatever `String.toLowerCase`
    * does on THIS JVM — so kernel and column form stay bit-equivalent
    * per host by construction. `String.toLowerCase(Locale.ROOT)` here
    * (r15) was subtly different: on a Turkish-locale JVM a non-ASCII
    * host containing 'I' lowercased differently in the two forms
    * (ADVICE r15). Hosts are ASCII in practice (IDNs arrive
    * punycode-encoded), so both paths agree on real data; this keeps
    * the pinned equivalence locale-independent too.
    */
  private[functions] def lowerLikeColumn(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** Canonical host of an absolute URL (the column-form `host()` rules:
    * authority minus userinfo/port, lowercase, one trailing dot then
    * one leading `www.` stripped; null for non-absolute input or an
    * empty result). Shared by [[RegisteredDomainOf]].
    */
  private[functions] def hostOf(s: String): String = {
    val m = SchemeRe.matcher(s)
    if (!m.find() || m.start() != 0) return null
    var i = m.end()
    while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' &&
      s.charAt(i) != '#') i += 1
    val auth = s.substring(m.end(), i)
    val afterUser = auth.substring(auth.lastIndexOf('@') + 1)
    val colon = afterUser.indexOf(':')
    var host = lowerLikeColumn(
      if (colon < 0) afterUser else afterUser.substring(0, colon))
      
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) null else host
  }

  /** Exact tracking-param names (mirrors UrlOps.TrackingParams — the ops
    * constant delegates HERE so one list serves both layers and the
    * DuckDB mirror interpolation).
    */
  val TrackingParams: Array[String] =
    Array("fbclid", "gclid", "msclkid", "igshid", "mc_cid", "mc_eid")

  private val trackingSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TrackingParams.foreach(s.add)
    s
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val m = SchemeRe.matcher(s)
    if (!m.find() || m.start() != 0) return null // non-absolute → NULL
    val sch = lowerLikeColumn(m.group(1))
    val authEnd = {
      var i = m.end()
      while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' &&
        s.charAt(i) != '#') i += 1
      i
    }
    val auth = s.substring(m.end(), authEnd)
    // userinfo drop: longest @-free suffix (the `([^@]*)$` extract)
    val afterUser = auth.substring(auth.lastIndexOf('@') + 1)
    // bare host: before the first ':' (the `^([^:]*)` extract)
    val colon = afterUser.indexOf(':')
    var host = lowerLikeColumn(
      if (colon < 0) afterUser else afterUser.substring(0, colon))
      
    // ONE trailing dot, then ONE leading www. (regexp_replace with
    // anchored patterns can substitute at most once)
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) return null
    // port: all-digit suffix after the LAST ':' (the `:([0-9]+)$` find)
    val lastColon = afterUser.lastIndexOf(':')
    var port: String = null
    if (lastColon >= 0 && lastColon + 1 < afterUser.length) {
      val cand = afterUser.substring(lastColon + 1)
      var digits = true
      var i = 0
      while (i < cand.length && digits) {
        if (cand.charAt(i) < '0' || cand.charAt(i) > '9') digits = false
        i += 1
      }
      if (digits) port = cand
    }
    val keepPort = port != null &&
      !((sch == "http" && port == "80") || (sch == "https" && port == "443"))
    // raw path: from the authority end to the first '?' or '#'
    val pathEnd = {
      var i = authEnd
      while (i < s.length && s.charAt(i) != '?' && s.charAt(i) != '#') i += 1
      i
    }
    var path = s.substring(authEnd, pathEnd)
      .replaceAll("/{2,}", "/")
    if (path.endsWith("/")) path = path.substring(0, path.length - 1)
    // raw query: first '?' before any '#'
    val hashIdx = { val h = s.indexOf('#'); if (h < 0) s.length else h }
    val qIdx = {
      val q = s.indexOf('?')
      if (q >= 0 && q < hashIdx) q else -1
    }
    val rawQuery = if (qIdx < 0) "" else s.substring(qIdx + 1, hashIdx)
    // param filter + BYTEWISE sort (array_sort on UTF8String is binary)
    val parts = rawQuery.split("&", -1)
    val kept = new java.util.ArrayList[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !p.startsWith("utm_")) {
        val eq = p.indexOf('=')
        val name = if (eq < 0) p else p.substring(0, eq)
        if (!trackingSet.contains(name)) kept.add(UTF8String.fromString(p))
      }
      i += 1
    }
    kept.sort((a: UTF8String, b: UTF8String) => a.compareTo(b))
    val sb = new java.lang.StringBuilder(s.length)
    sb.append(sch).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (!kept.isEmpty) {
      sb.append('?')
      var k = 0
      while (k < kept.size()) {
        if (k > 0) sb.append('&')
        sb.append(kept.get(k).toString)
        k += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
