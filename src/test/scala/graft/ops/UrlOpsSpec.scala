package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization and registered-domain extraction: each canonical
  * rule at its edge, the NULL contract for non-absolute input, and the
  * suffix-list heuristic.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): Option[String] =
    Option(Seq(url).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .head().getString(0))

  private def reg(host: String): String =
    Seq(host).toDF("h")
      .select(UrlOps.registeredDomain(col("h")).as("r"))
      .head().getString(0)

  test("scheme and host lowercase; www, default port, fragment drop") {
    assert(canon("HTTP://WWW.Example.COM:80/Path#frag") ==
      Some("http://example.com/Path"))
    assert(canon("https://Shop.Example.co.uk:443/a") ==
      Some("https://shop.example.co.uk/a"))
  }

  test("non-default ports and path CASE are preserved") {
    assert(canon("http://example.org:8080/A/B") ==
      Some("http://example.org:8080/A/B"))
    assert(canon("https://example.org:80/x") ==
      Some("https://example.org:80/x")) // 80 is not https' default
  }

  test("userinfo and trailing host dot drop") {
    assert(canon("http://user:pw@example.net./p") ==
      Some("http://example.net/p"))
  }

  test("path slashes collapse and trailing slash drops; root becomes " +
      "empty path") {
    assert(canon("http://e.com//a///b/") == Some("http://e.com/a/b"))
    assert(canon("http://e.com/") == Some("http://e.com"))
  }

  test("query: tracking params drop, empties drop, survivors sort " +
      "bytewise, all-dropped query loses its '?'") {
    assert(canon("http://e.com/p?b=2&utm_source=x&a=1&fbclid=y&&z") ==
      Some("http://e.com/p?a=1&b=2&z"))
    assert(canon("http://e.com/p?utm_campaign=only") ==
      Some("http://e.com/p"))
    // bytewise sort: uppercase before lowercase; utm_ match is
    // case-sensitive (UTM=x is not a tracking param)
    assert(canon("http://e.com/p?b=1&UTM=x") ==
      Some("http://e.com/p?UTM=x&b=1"))
  }

  test("a '?' inside the fragment is not a query") {
    assert(canon("http://e.com/p#a?notquery=1") == Some("http://e.com/p"))
  }

  test("non-absolute input canonicalizes to NULL") {
    assert(canon("relative/path/only").isEmpty)
    assert(canon("example.com/no-scheme").isEmpty)
  }

  test("registered domain: eTLD+1, multi-label suffixes, dotless hosts") {
    assert(reg("news.example.com") == "example.com")
    assert(reg("a.b.shop.example.co.uk") == "example.co.uk")
    assert(reg("example.com.au") == "example.com.au")
    assert(reg("localhost") == "localhost")
    // exactly a multi-label suffix with nothing left: stays last-3 fallback
    assert(reg("co.uk") == "co.uk")
  }

  private def resolve(base: String, ref: String): Option[String] =
    Option(Seq((base, ref)).toDF("b", "r")
      .select(UrlOps.resolveUrl(col("b"), col("r")).as("u"))
      .head().getString(0))

  test("resolveUrl: absolute, protocol-relative, root-relative, " +
      "fragment, and path-relative arms") {
    val base = "https://s.example.com/dir/page/7"
    assert(resolve(base, "http://other.net/x") == Some("http://other.net/x"))
    assert(resolve(base, "//cdn.net/lib") == Some("https://cdn.net/lib"))
    assert(resolve(base, "/root/3") ==
      Some("https://s.example.com/root/3"))
    assert(resolve(base, "#top") == Some(base))
    assert(resolve(base, "") == Some(base))
    assert(resolve(base, "sub/1") ==
      Some("https://s.example.com/dir/page/sub/1"))
    // relative ref's own fragment is dropped before the join
    assert(resolve(base, "sub/1#sec") ==
      Some("https://s.example.com/dir/page/sub/1"))
    // base with an empty path: directory is empty, origin + / + ref
    assert(resolve("https://e.com", "a/b") == Some("https://e.com/a/b"))
    // query-only ref (pagination): keeps the FULL base path (RFC 3986
    // §5.3 — r15 routed this through the relative arm and dropped the
    // base's last segment, ADVICE r15)
    assert(resolve(base, "?page=2") ==
      Some("https://s.example.com/dir/page/7?page=2"))
    assert(resolve("https://e.com", "?q=1") == Some("https://e.com?q=1"))
  }

  test("resolveUrl: non-absolute base is NULL (loud provenance)") {
    assert(resolve("not-a-url", "/x").isEmpty)
  }

  test("kernel expression ≡ column-composition reference on every rule " +
      "arm and a URL-shaped generator") {
    val arms = Seq(
      "HTTP://WWW.Example.COM:80//a//b/7/?b=2&a=1&utm_term=9",
      "https://Shop.Example.co.uk:443/item/3?fbclid=x3",
      "http://user@Example.org:8080/p/5?z=1&y=2&Y=9#frag",
      "https://news.example.com./17/", "ftp://Files.Example.NET:21/pub/4",
      "relative/path/9", "https://blog.example.com.au/read?id=6&UTM=keep",
      "http://e.com//a///b/?x&&y=1", "https://e.com.", "http://:80/x",
      "http://e.com/p?", "http://e.com/p?utm_campaign=only", "", "#",
      "http://h/p?a=1&a=1&A=2", "scheme+x.y://Host.Dot./p//q/")
    val rnd = new scala.util.Random(7)
    val pieces = Seq("http://", "HTTPS://", "//", "www.", "e.com", ":80",
      ":8080", "/a", "//b", "?", "&", "utm_x=1", "fbclid=2", "#f", ".",
      "@u", ":", "了", "x=У")
    val fuzz = (1 to 300).map(_ =>
      (0 until rnd.nextInt(6)).map(_ => pieces(rnd.nextInt(pieces.size)))
        .mkString)
    val df = (arms ++ fuzz).toDF("u")
    val diff = df.select(
        UrlOps.canonicalizeUrl(col("u")).as("k"),
        UrlOps.canonicalizeUrlColumns(col("u")).as("c"))
      .filter(!(col("k") <=> col("c")))
    assert(diff.isEmpty, diff.collect().mkString("\n"))
    // the fused domain kernel vs the registeredDomain(host(u))
    // composition, same corpus + degenerate-host shapes
    val hostEdges = Seq("http://a..b/x", "http://.a.b/", "http://co.uk/",
      "https://x.CO.UK.", "http://a.b.c.co.jp/p", "http://localhost/",
      "http://a.b../", "http://@/x")
    val ddf = (arms ++ fuzz ++ hostEdges).toDF("u")
    val ddiff = ddf.select(
        UrlOps.domainOf(col("u")).as("k"),
        UrlOps.registeredDomain(UrlOps.host(col("u"))).as("c"))
      .filter(!(col("k") <=> col("c")))
    assert(ddiff.isEmpty, ddiff.collect().mkString("\n"))
  }

  test("canonicalization is a narrow map: no shuffle in the plan") {
    val df = Seq("http://e.com/a").toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // --- loadable PSL data (r16) ---------------------------------------------

  test("loadPsl: comments, blanks, case, wildcard/exception skip, dedup") {
    val p = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(p,
      "// comment header\n\nCO.KR // inline note\n  com.br  \ncom.br\n" +
        "*.ck\n!www.ck\nsinglelabel\nco.uk\n")
    val got = UrlOps.loadPsl(p.toString)
    // lowercased, trimmed, deduped; wildcard/exception/single-label
    // rules skipped (documented unsupported subset)
    assert(got == Seq("co.kr", "com.br", "co.uk"))
    java.nio.file.Files.delete(p)
  }

  test("loaded suffix set: kernel ≡ column form, and the built-in list " +
      "loaded from a file changes nothing") {
    val p = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(p,
      "// psl\n" + UrlOps.MultiLabelSuffixes.mkString("\n") + "\nco.kr\n")
    val loaded = UrlOps.loadPsl(p.toString)
    val urls = Seq("https://a.example.co.kr/x", "https://b.example.co.uk/y",
      "http://example.com/", "http://co.kr/", "relative").toDF("u")
    // kernel with the loaded set ≡ column composition with the same set
    val diff = urls.select(
        UrlOps.domainOf(col("u"), loaded).as("k"),
        UrlOps.registeredDomain(UrlOps.host(col("u")), loaded).as("c"))
      .filter(!(col("k") <=> col("c")))
    assert(diff.isEmpty, diff.collect().mkString("\n"))
    // the beyond-builtin entry actually takes effect
    val kr = urls.select(UrlOps.domainOf(col("u"), loaded).as("d"))
      .as[Option[String]].collect().toSeq
    assert(kr.head == Some("example.co.kr"))
    // a file holding exactly the built-in list reproduces the default
    val builtinLoaded = loaded.filterNot(_ == "co.kr")
    val same = urls.select(UrlOps.domainOf(col("u")).as("a"),
        UrlOps.domainOf(col("u"), builtinLoaded).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(same.isEmpty, same.collect().mkString("\n"))
    java.nio.file.Files.delete(p)
  }

  test("effectiveBase: <base href> overrides the page URL — absolute, " +
      "root-relative, and path-relative forms; first base wins; " +
      "absent is identity") {
    val page = "https://a.com/dir/page/7"
    def eb(html: String): String =
      Seq((page, html)).toDF("p", "h")
        .select(UrlOps.effectiveBase(col("p"),
          HtmlOps.baseHref(col("h"))))
        .head().getString(0)
    assert(eb("""<head><base href="https://cdn.x.io/a/"></head>""")
      == "https://cdn.x.io/a/")
    assert(eb("""<head><base href="/b/"></head>""") == "https://a.com/b/")
    assert(eb("""<head><base href="sub/"></head>""")
      == "https://a.com/dir/page/sub/")
    assert(eb("<head></head>") == page)
    // HTML5 §4.2.3: only the FIRST base element with an href counts
    assert(eb("""<base href="/one/"><base href="/two/">""")
      == "https://a.com/one/")
    // a relative link then resolves against the effective base
    val resolved = Seq((page, """<base href="https://cdn.x.io/a/">"""))
      .toDF("p", "h")
      .select(UrlOps.resolveUrl(UrlOps.effectiveBase(col("p"),
        HtmlOps.baseHref(col("h"))), lit("img/1.png")))
      .head().getString(0)
    assert(resolved == "https://cdn.x.io/a/img/1.png")
  }
}
