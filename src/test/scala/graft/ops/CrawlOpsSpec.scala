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

  test("a page's <base href> redirects its relative links (HTML5 " +
      "§4.2.3) — the next hop schedules against the base, not the " +
      "page path") {
    val withBase = "https://a.com/dir/1" ->
      ("<html><head><base href=\"https://cdn.b.net/lib/\"></head>" +
        "<body><a href=\"x/2\">r</a></body></html>")
    val got = crawl(Seq(withBase), Seq("https://a.com/dir/1"), 1)
    assert(got.map(_._2) == Seq("https://cdn.b.net/lib/x/2"))
  }
}
