package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

import graft.SparkSpec

/** Multi-hop crawl iteration (CrawlOps.crawlFrontierIterate): hop-wise
  * discovery along a planted link chain, cumulative dedup (a back-link
  * never reschedules a crawled URL), robots admission inside the loop,
  * the per-domain politeness cap, and early stop on an empty hop.
  */
class CrawlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def page(url: String, hrefs: String*): (String, String) =
    url -> hrefs.map(h => s"""<a href="$h">x</a>""").mkString(
      "<html><body>", "", "</body></html>")

  private val emptyRules = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("reg_domain", StringType),
      StructField("is_allow", BooleanType),
      StructField("prefix", StringType))))

  private def crawl(pages: Seq[(String, String)], seeds: Seq[String],
                    maxHops: Int, rules: org.apache.spark.sql.DataFrame =
                      emptyRules, cap: Int = 4) =
    CrawlOps.crawlFrontierIterate(pages.toDF("canon_url", "html"),
        seeds.toDF("canon_url"), rules, maxHops, cap)
      .orderBy("hop", "canon_url")
      .select("hop", "canon_url", "fetched")
      .as[(Int, String, Boolean)].collect().toSeq

  test("a 3-hop chain discovers one page per hop; a back-link to the " +
      "seed never reschedules it") {
    val pages = Seq(
      page("https://a.com/1", "/2"),
      page("https://a.com/2", "/3"),
      page("https://a.com/3", "/4"),
      // /4 links BACK to /1 (crawled at hop 0) and to /2 (hop 1) —
      // cumulative dedup must drop both, ending the crawl early
      page("https://a.com/4", "/1", "/2"))
    assert(crawl(pages, Seq("https://a.com/1"), 5) == Seq(
      (1, "https://a.com/2", true),
      (2, "https://a.com/3", true),
      (3, "https://a.com/4", true)))
  }

  test("an unfetchable scheduled URL counts as crawled but feeds no links") {
    val pages = Seq(
      page("https://a.com/1", "/gone", "/2"),
      page("https://a.com/2", "/gone"))
    // /gone is scheduled (404-class) at hop 1 and must NOT be
    // rescheduled at hop 2 even though /2 links to it again
    assert(crawl(pages, Seq("https://a.com/1"), 3) == Seq(
      (1, "https://a.com/2", true),
      (1, "https://a.com/gone", false)))
  }

  test("per-domain politeness cap holds per hop, in canonical order") {
    val hub = page("https://a.com/hub",
      "/p1", "/p2", "/p3", "/p4", "/p5", "/p6")
    assert(crawl(Seq(hub), Seq("https://a.com/hub"), 1, cap = 3)
      .map(_._2) ==
      Seq("https://a.com/p1", "https://a.com/p2", "https://a.com/p3"))
  }

  test("robots admission applies inside the loop") {
    val pages = Seq(
      page("https://a.com/1", "/private/x", "/open/y"))
    val rules = Seq(("a.com", false, "/private"))
      .toDF("reg_domain", "is_allow", "prefix")
    assert(crawl(pages, Seq("https://a.com/1"), 2, rules).map(_._2) ==
      Seq("https://a.com/open/y"))
  }

  test("recrawlPriority: observed changes are an order statistic " +
      "(A→B→A = two changes), never-changing and single-capture URLs " +
      "score 0, rates floor integrally") {
    val caps = Seq(
      ("u1", "2020-01-01", "a"), ("u1", "2020-01-08", "b"),
      ("u1", "2020-01-15", "a"),                    // A→B→A: 2 changes
      ("u2", "2020-01-01", "x"), ("u2", "2020-01-31", "x"), // never
      ("u3", "2020-01-10", "y"),                    // single capture
      ("u4", "2020-01-01", "p"), ("u4", "2020-01-04", "q")  // 1 in 3d
    ).toDF("url", "capture_date", "digest")
    val out = CrawlOps.recrawlPriority(caps, "2020-02-15")
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // u1: 2 changes over 14 days → 1428 bp; stale 31d → 44268
    assert(out(0) == ("u1", 3L, 2L, 14L, 31L, 1428L, 44268L))
    // u2: stale 15d but 0 changes → priority 0
    assert(out(1) == ("u2", 2L, 0L, 30L, 15L, 0L, 0L))
    // u3: no change evidence → rate 0, priority 0 (span guards at 1)
    assert(out(2) == ("u3", 1L, 0L, 0L, 36L, 0L, 0L))
    // u4: 1 change / 3 days = 3333 bp; stale 42d → 139986
    assert(out(3) == ("u4", 2L, 1L, 3L, 42L, 3333L, 139986L))
  }

  test("recrawlPriority: a sitemap lastmod NEWER than the last capture " +
      "adds the one-observed-change bonus — rescuing the zero-score " +
      "classes; an older lastmod and absent rows change nothing") {
    val caps = Seq(
      ("u1", "2020-01-01", "x"), ("u1", "2020-01-31", "x"), // never changes
      ("u2", "2020-01-10", "y"),                            // single capture
      ("u3", "2020-01-01", "p"), ("u3", "2020-01-04", "q")  // 1 change
    ).toDF("url", "capture_date", "digest")
    val sm = Seq(("u1", "2020-02-10"), ("u2", "2020-01-05"))
      .toDF("url", "lastmod")
    val out = CrawlOps.recrawlPriority(caps, "2020-02-15",
        sitemapLastmod = sm)
      .orderBy("url").collect()
      .map(r => (r.getString(0), r.getLong(6), r.getBoolean(7)))
    assert(out(0) == ("u1", 10000L, true))   // 0 history + declared bonus
    assert(out(1) == ("u2", 0L, false))      // lastmod OLDER than capture
    assert(out(2) == ("u3", 139986L, false)) // no sitemap row: unchanged
  }

  test("a page's <base href> redirects its relative links (HTML5 " +
      "§4.2.3) — the next hop schedules against the base, not the " +
      "page path") {
    val withBase = "https://a.com/dir/1" ->
      ("<html><head><base href=\"https://cdn.b.net/lib/\"></head>" +
        "<body><a href=\"x/2\">r</a></body></html>")
    val got = crawl(Seq(withBase), Seq("https://a.com/dir/1"), 1)
    assert(got.map(_._2) == Seq("https://cdn.b.net/lib/x/2"))
  }

  private def crawlR(pages: Seq[(String, String)], seeds: Seq[String],
                     redirects: Seq[(String, String)], maxHops: Int,
                     rules: org.apache.spark.sql.DataFrame = emptyRules,
                     redirectCap: Int = 5) =
    CrawlOps.crawlFrontierIterate(pages.toDF("canon_url", "html"),
        seeds.toDF("canon_url"), rules, maxHops, perHostCap = 100,
        redirects = redirects.toDF("canon_url", "location"),
        redirectCap = redirectCap)
      .orderBy("hop", "canon_url")
      .select("hop", "canon_url", "fetched")
      .as[(Int, String, Boolean)].collect().toSeq

  test("redirects: a relative Location resolves against the redirect's " +
      "own URL and the target is scheduled on the next hop") {
    val got = crawlR(Seq(page("https://a.com/t/1")),
      Seq("https://a.com/r/1"),
      Seq("https://a.com/r/1" -> "/t/1"), maxHops = 3)
    assert(got == Seq((1, "https://a.com/t/1", true)))
  }

  test("redirects: the chain cap drops the tail (RFC 9110 §15.4) — a " +
      "3-step chain under cap 2 never schedules its final target") {
    val got = crawlR(Seq(page("https://a.com/t/1")),
      Seq("https://a.com/r/1"),
      Seq("https://a.com/r/1" -> "/c1/1",
        "https://a.com/c1/1" -> "/c2/1",
        "https://a.com/c2/1" -> "/t/1"),
      maxHops = 6, redirectCap = 2)
    // c1 (depth 1) and c2 (depth 2) schedule; /t/1 at depth 3 is cut
    assert(got == Seq((1, "https://a.com/c1/1", true),
      (2, "https://a.com/c2/1", true)))
  }

  test("redirects: a loop terminates through the crawled-set dedup, " +
      "not the cap — and content discovery resets the chain depth") {
    // r -> la -> r is a cycle back to the crawled seed
    val got = crawlR(Seq.empty[(String, String)],
      Seq("https://a.com/r/1"),
      Seq("https://a.com/r/1" -> "/la/1",
        "https://a.com/la/1" -> "/r/1"), maxHops = 6)
    assert(got == Seq((1, "https://a.com/la/1", true)))
    // a page at the END of a depth-2 chain links onward: the link's
    // depth is 0, so the next target is NOT cut by redirectCap 2
    val got2 = crawlR(Seq(page("https://a.com/t/1", "/next/1"),
        page("https://a.com/next/1")),
      Seq("https://a.com/r/1"),
      Seq("https://a.com/r/1" -> "/c1/1",
        "https://a.com/c1/1" -> "/t/1"),
      maxHops = 6, redirectCap = 2)
    assert(got2 == Seq((1, "https://a.com/c1/1", true),
      (2, "https://a.com/t/1", true),
      (3, "https://a.com/next/1", true)))
  }

  test("redirects: a cross-domain target is re-admitted against the " +
      "TARGET domain's robots rules") {
    import spark.implicits._
    val rules = Seq(("b.net", false, "/x"))
      .toDF("reg_domain", "is_allow", "prefix")
    val got = crawlR(Seq(page("https://a.com/t/1")),
      Seq("https://a.com/r/1", "https://a.com/r/2"),
      Seq("https://a.com/r/1" -> "https://cdn.b.net/x/1",
        "https://a.com/r/2" -> "https://cdn.b.net/ok/2"),
      maxHops = 2, rules = rules)
    // /x/1 disallowed on b.net; /ok/2 admitted (scheduled, unfetched)
    assert(got == Seq((1, "https://cdn.b.net/ok/2", false)))
  }
}
