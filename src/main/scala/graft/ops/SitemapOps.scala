package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap discovery — the OTHER half of the crawl's URL-discovery
  * plane (sitemaps.org protocol, referenced from robots.txt via the
  * `Sitemap:` directive, RFC 9309 §2.2.4 "other records"): a site
  * publishes the URLs it WANTS crawled, with optional freshness
  * metadata, so a frontier scheduler merges sitemap entries with
  * link-graph discovery ([[CrawlOps]]) rather than relying on either
  * alone. No reference analog (engine capability, like the rest of
  * the first-mile tier).
  *
  * Fidelity bounds (each documented where it bites):
  *
  *  - XML is parsed at the [[WarcOps]]/[[HtmlOps]] regex tier — real
  *    sitemaps are machine-generated flat element lists, which this
  *    tier handles exactly; hand-authored XML exotica (CDATA, internal
  *    DTD entities, namespace-PREFIXED element names like `<sm:loc>`)
  *    are out of scope;
  *  - `<loc>` values un-escape the five XML predefined entities
  *    (`&amp; &lt; &gt; &quot; &apos;`, ampersand LAST — the
  *    sitemaps.org escaping table); numeric character references in a
  *    loc are legal XML but vanishingly rare in generated sitemaps and
  *    stay literal here.
  *
  * Scale shape: both parsers are a narrow regexp explode per sitemap
  * document (sitemap files are ≤50k URLs / 50 MB by protocol — each
  * row's work is bounded by spec); no shuffle is introduced before the
  * caller's own canonicalize/dedup stages. Zero UDFs.
  */
object SitemapOps {

  /** Un-escape the five XML predefined entities, `&amp;` last so an
    * escaped ampersand cannot re-trigger an earlier replace.
    */
  private def xmlUnescape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(c, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&apos;", "'"), "&amp;", "&")

  private def element(xml: Column, tag: String): Column =
    regexp_extract_all(xml,
      lit(s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>"), lit(0))

  private def child(elem: Column, tag: String): Column =
    trim(regexp_extract(elem,
      s"(?is)<$tag\\b[^>]*>\\s*(.*?)\\s*</$tag\\s*>", 1))

  /** Parse `<urlset>` documents: one output row per `<url>` entry with
    * a non-empty `<loc>`.
    *
    * Input: `keyCols... , xmlCol`. Output: keys + `(loc, lastmod,
    * priority)` — `lastmod`/`priority` null when the entry omits them
    * (both optional by protocol); `loc` un-escaped per the XML
    * predefined-entity table.
    */
  def parseUrlset(sitemaps: DataFrame, keyCols: Seq[String],
                  xmlCol: String = "xml"): DataFrame =
    sitemaps
      .select(keyCols.map(col) :+
        explode(element(col(xmlCol), "url")).as("__e"): _*)
      .select(keyCols.map(col) :+
        xmlUnescape(child(col("__e"), "loc")).as("loc") :+
        nullif(child(col("__e"), "lastmod"), lit("")).as("lastmod") :+
        nullif(child(col("__e"), "priority"), lit("")).as("priority"): _*)
      .filter(col("loc") =!= "")

  /** Parse `<sitemapindex>` documents (the two-level form large sites
    * publish): one output row per referenced child sitemap.
    *
    * Output: keys + `sitemap_loc`, un-escaped like [[parseUrlset]].
    */
  def parseIndex(indexes: DataFrame, keyCols: Seq[String],
                 xmlCol: String = "xml"): DataFrame =
    indexes
      .select(keyCols.map(col) :+
        explode(element(col(xmlCol), "sitemap")).as("__e"): _*)
      .select(keyCols.map(col) :+
        xmlUnescape(child(col("__e"), "loc")).as("sitemap_loc"): _*)
      .filter(col("sitemap_loc") =!= "")

  /** Extract `Sitemap:` directives from robots.txt bodies — the
    * discovery pointer RFC 9309 §2.2.4 carries outside any user-agent
    * group (so group segmentation does not apply; every such line on
    * the domain counts, comments stripped, key case-insensitive).
    *
    * Input: one row per domain — `(domainCol, textCol)`. Output:
    * `(reg_domain, sitemap_url)`, deduplicated.
    */
  def sitemapUrls(robots: DataFrame,
                  domainCol: String = "reg_domain",
                  textCol: String = "robots_txt"): DataFrame =
    robots
      .select(col(domainCol).as("reg_domain"),
        explode(split(col(textCol), "\n")).as("raw"))
      .select(col("reg_domain"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .select(col("reg_domain"),
        when(lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1))
            === "sitemap",
          trim(regexp_extract(col("line"),
            "^[A-Za-z-]+\\s*:\\s*(.*)$", 1))).as("sitemap_url"))
      .filter(col("sitemap_url").isNotNull && col("sitemap_url") =!= "")
      .distinct()
}
