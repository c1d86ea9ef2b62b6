package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 robots parsing and admission: group segmentation
  * (multi-agent headers), exact-token-beats-star selection, the
  * empty-Disallow idiom, comment stripping, longest-prefix admission
  * with Allow winning length ties, and the no-rule / no-robots allows.
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
}
