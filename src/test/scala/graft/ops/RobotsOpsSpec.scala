package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 robots parsing and admission: group segmentation
  * (multi-agent headers; unknown directives END a header run),
  * exact-token-beats-star selection, the empty-Disallow idiom, comment
  * stripping, longest-match admission with Allow winning length ties,
  * `*`/trailing-`$` wildcard patterns (§2.2.3), and the no-rule /
  * no-robots allows.
  */
class RobotsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# comment line
      |User-agent: megabot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: helper
      |Disallow: /private
      |Allow: /private/ok
      |Disallow:
      |
      |User-agent: *
      |Disallow: /star""".stripMargin

  private def rules(agent: String, domains: (String, String)*) =
    RobotsOps.parseRules(
      domains.toSeq.toDF("reg_domain", "robots_txt"), agent)

  test("exact-token groups govern; star and other agents are ignored") {
    val r = rules("graftbot", "d.com" -> body)
      .as[(String, Boolean, String)].collect().toSet
    assert(r == Set(("d.com", false, "/private"),
      ("d.com", true, "/private/ok")))
  }

  test("multi-agent header: the second name in the group governs too") {
    val r = rules("HELPER", "d.com" -> body)
      .as[(String, Boolean, String)].collect().toSet
    assert(r.map(_._3) == Set("/private", "/private/ok"))
  }

  test("unknown agent falls back to the star group") {
    val r = rules("otherbot", "d.com" -> body)
      .as[(String, Boolean, String)].collect().toSet
    assert(r == Set(("d.com", false, "/star")))
  }

  test("domain without a star group and no exact match yields no rules") {
    val noStar = "User-agent: a\nDisallow: /x"
    assert(rules("b", "d.com" -> noStar).isEmpty)
  }

  private def flags(agent: String, body: String, paths: Seq[String]) = {
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, "d.com", p) }
      .toDF("id", "reg_domain", "match_path")
    RobotsOps.allowedFlags(urls,
        rules(agent, "d.com" -> body), Seq("id"))
      .orderBy("id").as[(Long, Boolean)].collect().map(_._2).toSeq
  }

  test("longest prefix wins; Allow wins a length tie; no match allows") {
    assert(flags("graftbot", body,
      Seq("/private/x", "/private/ok/y", "/elsewhere", "/")) ==
      Seq(false, true, true, true))
    // same-length tie: Allow beats Disallow (RFC 9309 §2.2.2)
    val tie = "User-agent: *\nDisallow: /a\nAllow: /a"
    assert(flags("any", tie, Seq("/a/x")) == Seq(true))
  }

  test("a URL whose domain has no robots row at all is allowed") {
    val urls = Seq((1L, "nothere.com", "/x"))
      .toDF("id", "reg_domain", "match_path")
    val f = RobotsOps.allowedFlags(urls,
      rules("graftbot", "d.com" -> body), Seq("id"))
    assert(f.as[(Long, Boolean)].collect().toSeq == Seq((1L, true)))
  }

  test("matchPath: path+query of the canonical URL; empty path is /") {
    val r = Seq("https://e.com/a/b?q=1", "https://e.com")
      .toDF("u").select(RobotsOps.matchPath(col("u")))
      .as[String].collect().toSeq
    assert(r == Seq("/a/b?q=1", "/"))
  }

  test("allowedUrls keeps exactly the admitted rows with all columns") {
    val urls = Seq((1L, "d.com", "/private/x", "extra1"),
        (2L, "d.com", "/free", "extra2"))
      .toDF("id", "reg_domain", "match_path", "payload")
    val kept = RobotsOps
      .allowedUrls(urls, rules("graftbot", "d.com" -> body), Seq("id"))
      .as[(Long, String, String, String)].collect().toSeq
    assert(kept == Seq((2L, "d.com", "/free", "extra2")))
  }

  // --- RFC 9309 §2.2.3 wildcard patterns (r16) -----------------------------

  test("mid-path * matches any run; trailing $ anchors to path end") {
    val b = "User-agent: *\nDisallow: /a\nAllow: /a/*/z\nDisallow: /a/b$"
    assert(flags("any", b,
      Seq("/a/x/z", "/a/x/zz", "/a/q", "/a/b", "/a/bc")) ==
      // /a/x/z and /a/x/zz: Allow /a/*/z (len 7) beats Disallow /a;
      // /a/b: Disallow /a/b$ (len 5) anchors exactly; /a/bc: the $ rule
      // does not match a longer path, Disallow /a stands
      Seq(true, true, false, false, false))
  }

  test("a mid-pattern $ is literal; regex metachars in rules are escaped") {
    val b = "User-agent: *\nDisallow: /p$q*x\nDisallow: /r.s*"
    // '$' not at the end is a literal char; '*' still wildcards
    assert(flags("any", b, Seq("/p$qAAx/t", "/pq/x")) == Seq(false, true))
    // '.' must not act as regex any-char (the rule has a '*', so it
    // takes the regex arm — the arm where escaping could go wrong)
    assert(flags("any", b, Seq("/r.s/t", "/rxs/t")) == Seq(false, true))
  }

  test("a wildcard rule and a literal rule tie on value length: Allow wins") {
    val b = "User-agent: *\nDisallow: /ab/c\nAllow: /ab/*"
    // both values are 5 chars; the wildcard Allow ties and wins
    assert(flags("any", b, Seq("/ab/c")) == Seq(true))
    // and the mirror-image tie (wildcard Disallow vs literal Allow)
    val b2 = "User-agent: *\nAllow: /ab/c\nDisallow: /ab/*"
    assert(flags("any", b2, Seq("/ab/c")) == Seq(true))
  }

  test("'Disallow: /$' blocks exactly the root; 'Allow: *' is everything") {
    val b = "User-agent: *\nDisallow: /$\nDisallow: /x\nAllow: *x"
    assert(flags("any", b, Seq("/", "/y", "/x")) == Seq(false, true, true))
  }

  // --- RFC 9309 group boundaries (r16, ADVICE r15) -------------------------

  test("an unknown directive between two User-agent lines ends the run") {
    val b = "User-agent: graftbot\nCrawl-delay: 3\n" +
      "User-agent: otherbot\nDisallow: /pub"
    // graftbot's group holds only the crawl-delay (no rules): /pub is
    // NOT bound to graftbot (a merged header would block it)
    assert(rules("graftbot", "d.com" -> b).isEmpty)
    assert(flags("graftbot", b, Seq("/pub/x")) == Seq(true))
    // otherbot still gets its own rule
    assert(flags("otherbot", b, Seq("/pub/x")) == Seq(false))
  }

  test("blank and comment-only lines do NOT end a User-agent run") {
    val b = "User-agent: graftbot\n\n# note\nUser-agent: helper\n" +
      "Disallow: /x"
    assert(flags("graftbot", b, Seq("/x/y")) == Seq(false))
    assert(flags("helper", b, Seq("/x/y")) == Seq(false))
  }

  private def delays(agent: String, domains: (String, String)*) =
    RobotsOps.crawlDelays(
        domains.toSeq.toDF("reg_domain", "robots_txt"), agent)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("crawlDelays: group-scoped, exact token beats star, fractional " +
      "seconds floor to ms") {
    val b = "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(delays("graftbot", "a.com" -> b) == Map("a.com" -> 1500L))
    assert(delays("other", "a.com" -> b) == Map("a.com" -> 10000L))
  }

  test("crawlDelays: non-numeric and negative values ignored; a domain " +
      "with no parseable governing delay is absent") {
    val b = "User-agent: *\nCrawl-delay: soon\n"
    val c = "User-agent: *\nCrawl-delay: -2\n"
    val d = "User-agent: *\nDisallow: /\n"
    assert(delays("graftbot", "a.com" -> b, "b.com" -> c,
      "c.com" -> d).isEmpty)
  }

  test("crawlDelays: duplicate directives in the governing set take " +
      "the MAXIMUM (the conservative politeness read, ADVICE r16); a " +
      "delay in a non-governing group does not leak") {
    val b = "User-agent: graftbot\nCrawl-delay: 5\n\n" +
      "User-agent: graftbot\nCrawl-delay: 2\n\n" +
      "User-agent: megabot\nCrawl-delay: 60\n"
    assert(delays("graftbot", "a.com" -> b) == Map("a.com" -> 5000L))
  }

  test("parseRules is unchanged by the shared-front refactor: the " +
      "Crawl-delay line still splits header runs and never becomes " +
      "a rule") {
    val b = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    val r = RobotsOps.parseRules(
        Seq(("a.com", b)).toDF("reg_domain", "robots_txt"), "a")
      .collect()
    assert(r.isEmpty) // the Disallow binds only agent b
  }
}
