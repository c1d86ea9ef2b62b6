package graft.ops

import graft.SparkSpec

/** Sitemap discovery (SitemapOps): robots `Sitemap:` directive
  * extraction (group-independent, case-insensitive, comment-stripped),
  * urlset parsing with optional lastmod/priority, XML entity
  * un-escaping in locs, and the two-level sitemapindex form.
  */
class SitemapOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sitemapUrls: directives found anywhere, key case-insensitive, " +
      "comments stripped, group lines ignored") {
    val robots = Seq(
      ("a.com",
        "User-agent: *\nDisallow: /x\n" +
          "Sitemap: https://a.com/sitemap.xml\n" +
          "SITEMAP:   https://a.com/extra.xml   # the mirror\n" +
          "User-agent: bot\nAllow: /"),
      ("b.com", "Disallow: /\n# Sitemap: https://b.com/hidden.xml"),
      ("c.com", "User-agent: *\nAllow: /")
    ).toDF("reg_domain", "robots_txt")
    val got = SitemapOps.sitemapUrls(robots)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      "a.com" -> "https://a.com/sitemap.xml",
      "a.com" -> "https://a.com/extra.xml"))
  }

  test("parseUrlset: loc required, lastmod/priority optional, " +
      "entities un-escaped, whitespace trimmed") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> https://a.com/p?x=1&amp;y=2 </loc>
        |  <lastmod>2020-01-05</lastmod><priority>0.8</priority></url>
        |<url><loc>https://a.com/q</loc></url>
        |<url><lastmod>2020-01-01</lastmod></url>
        |</urlset>""".stripMargin
    val got = SitemapOps.parseUrlset(
        Seq(("a.com", xml)).toDF("reg_domain", "xml"), Seq("reg_domain"))
      .collect()
      .map(r => (r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      ("https://a.com/p?x=1&y=2", Some("2020-01-05"), Some("0.8")),
      ("https://a.com/q", None, None)))
  }

  test("parseIndex: one row per referenced child sitemap") {
    val xml =
      """<sitemapindex>
        |<sitemap><loc>https://a.com/s1.xml</loc>
        |  <lastmod>2020-02-01</lastmod></sitemap>
        |<sitemap><loc>https://a.com/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = SitemapOps.parseIndex(
        Seq(("a.com", xml)).toDF("reg_domain", "xml"), Seq("reg_domain"))
      .collect().map(_.getString(1)).toSet
    assert(got == Set("https://a.com/s1.xml", "https://a.com/s2.xml"))
  }

  test("parseUrlset survives attribute-carrying and mixed-case tags") {
    val xml = "<URLSET><URL changefreq=\"daily\"><LOC>https://x.io/a" +
      "</LOC></URL><url><loc>https://x.io/b</loc></url></URLSET>"
    val got = SitemapOps.parseUrlset(
        Seq((1L, xml)).toDF("id", "xml"), Seq("id"))
      .collect().map(_.getString(1)).toSet
    assert(got == Set("https://x.io/a", "https://x.io/b"))
  }
}
