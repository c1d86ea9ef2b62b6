package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and URL admission — the politeness tier of the
  * first mile (REP, RFC 9309). A crawl (Common Crawl, RefinedWeb §3.1)
  * fetches nothing a domain's robots.txt disallows for its user-agent
  * token, so frontier construction runs every candidate URL through
  * these rules BEFORE scheduling; [[graft.ops.UrlOps]] produces the
  * canonical URLs and registered domains this tier keys on.
  *
  * No reference analog (engine capability, like the rest of the
  * first-mile tier).
  *
  * Semantics implemented (each deliberate, RFC 9309 / Google REP):
  *
  *  - lines split on newline; `#` comments stripped; directive names
  *    case-insensitive; values trimmed;
  *  - consecutive `User-agent:` lines form ONE group header (a rule
  *    block can be addressed to several agents); ANY other directive
  *    line between two `User-agent:` lines ENDS the header run — an
  *    unrecognized directive (`Crawl-delay:`, `Sitemap:`) splits the
  *    groups exactly as RFC 9309-style parsers (google/robotstxt) do
  *    (r15 segmented after filtering to known directives, silently
  *    merging such headers — ADVICE r15);
  *  - group selection per RFC 9309 §2.2.1 at token granularity: if any
  *    group on the domain names the crawler's exact token
  *    (case-insensitive), ONLY those groups govern it; otherwise the
  *    `*` groups do; a domain with neither allows everything;
  *  - `Allow`/`Disallow` values are path patterns; an empty value is
  *    no rule (the standard "Disallow:" = allow-all idiom);
  *  - pattern matching per RFC 9309 §2.2.3 ([[ruleMatches]]): a rule
  *    matches when its pattern matches a PREFIX of the URL's
  *    path+query, with `*` matching any character run and a trailing
  *    `$` anchoring the match to the END of the path (a mid-pattern
  *    `$` is literal, as in google/robotstxt); patterns without
  *    wildcards keep the plain starts-with fast path;
  *  - admission per URL: the longest matching rule VALUE (its raw
  *    character length, wildcards counted — the google/robotstxt
  *    priority) wins; on a length tie `Allow` wins; no matching rule
  *    = allowed (RFC 9309 §2.2.2).
  *
  * Scale shape: parsing is a per-domain explode + two window passes
  * partitioned by domain (robots bodies are KB-sized per domain — the
  * window partitions are tiny by construction); admission is one join
  * keyed on the registered domain (co-partitioned with the frontier's
  * own domain-keyed shuffles; AQE broadcasts the rule table when a
  * crawl's rule set is small) + one aggregate per URL key. Zero UDFs —
  * every step is codegen'd column expressions.
  */
object RobotsOps {

  /** Path + query of a canonical URL ([[UrlOps.canonicalizeUrl]] form),
    * the string robots rules match against; the empty path (a site
    * root) matches as "/".
    */
  def matchPath(canonUrl: Column): Column =
    coalesce(nullif(regexp_extract(canonUrl,
      "^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1), lit("")), lit("/"))

  /** Parse robots.txt bodies into the prefix rules governing ONE
    * crawler token.
    *
    * Input: one row per domain — `(domainCol, textCol)`. Output:
    * `(reg_domain, is_allow, prefix)` — only the rules from the groups
    * that govern `agent` (exact-token groups if any exist on the
    * domain, else the `*` groups), with empty-value rules dropped.
    */
  def parseRules(robots: DataFrame, agent: String,
                 domainCol: String = "reg_domain",
                 textCol: String = "robots_txt"): DataFrame =
    governingDirectives(robots, agent, domainCol, textCol)
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "")
      .select(col("reg_domain"),
        (col("directive") === "allow").as("is_allow"),
        col("value").as("prefix"))
      .distinct()

  /** `Crawl-delay` for ONE crawler token (the de-facto directive
    * Bing/Yandex honor — group-scoped like Allow/Disallow, so the same
    * RFC 9309 §2.2.1 group selection applies). Output: `(reg_domain,
    * delay_ms)` — the MAXIMUM delay among the governing groups' parsed
    * values (duplicate directives in one governing set are a publisher
    * error; taking the largest is the conservative politeness read —a
    * crawler that under-throttles on a publisher's typo is the
    * failure mode that gets it blocked; r17, ADVICE r16 — and equally
    * deterministic), in integral milliseconds (`floor(seconds × 1000)`
    * — fractional seconds are common in the wild; floor on the IEEE
    * product is the cross-engine basis-point convention). Non-numeric
    * values are ignored; a domain with no parseable governing delay is
    * absent (callers coalesce their own default slot spacing).
    */
  def crawlDelays(robots: DataFrame, agent: String,
                  domainCol: String = "reg_domain",
                  textCol: String = "robots_txt"): DataFrame =
    governingDirectives(robots, agent, domainCol, textCol)
      .filter(col("directive") === "crawl-delay")
      .withColumn("delay_ms",
        floor(expr("try_cast(value AS DOUBLE)") * 1000).cast("long"))
      .filter(col("delay_ms").isNotNull && col("delay_ms") >= 0)
      .groupBy("reg_domain")
      .agg(max(col("delay_ms")).as("delay_ms"))

  /** The shared parse front: line split, comment strip, directive
    * split, group segmentation (ANY directive line between two
    * User-agent lines ends a header run), and RFC 9309 §2.2.1 group
    * selection for `agent` — returning every non-UA directive row of
    * the governing groups as `(reg_domain, directive, value)`.
    */
  private def governingDirectives(robots: DataFrame, agent: String,
                                  domainCol: String,
                                  textCol: String): DataFrame = {
    val lines = robots
      .select(col(domainCol).as("reg_domain"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "raw")))
      .select(col("reg_domain"), col("line_no"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .select(col("reg_domain"), col("line_no"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1))
          .as("directive"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1))
          .as("value"))
      // EVERY directive-formed line participates in group segmentation
      // (so a Crawl-delay between two User-agent lines ends the header
      // run, per google/robotstxt)
      .filter(col("directive") =!= "")
    // Group ids: a user-agent line starts a new group unless the
    // previous directive line was also user-agent (multi-agent header).
    val wOrd = Window.partitionBy("reg_domain").orderBy("line_no")
    val grouped = lines
      .withColumn("is_ua", (col("directive") === "user-agent").cast("int"))
      .withColumn("new_grp",
        (col("is_ua") === 1 && lag(col("is_ua"), 1, 0).over(wOrd) === 0)
          .cast("long"))
      .withColumn("grp", sum(col("new_grp")).over(wOrd))
    // RFC 9309 §2.2.1 at token granularity: exact-token groups beat `*`
    // groups domain-wide.
    val uaGroups = grouped.filter(col("is_ua") === 1)
      .groupBy("reg_domain", "grp")
      .agg(
        max((lower(col("value")) === agent.toLowerCase).cast("int"))
          .as("grp_exact"),
        max((col("value") === "*").cast("int")).as("grp_star"))
    val domExact = uaGroups.groupBy("reg_domain")
      .agg(max(col("grp_exact")).as("dom_exact"))
    val governing = uaGroups.join(domExact, Seq("reg_domain"))
      .filter((col("dom_exact") === 1 && col("grp_exact") === 1) ||
        (col("dom_exact") === 0 && col("grp_star") === 1))
      .select("reg_domain", "grp")
    grouped.filter(col("is_ua") === 0)
      .join(governing, Seq("reg_domain", "grp"), "left_semi")
      .select(col("reg_domain"), col("directive"), col("value"))
  }

  /** RFC 9309 §2.2.3 rule-pattern match of `path` against a rule
    * `pattern` column: plain patterns are a starts-with (the fast
    * path — no per-row regex compile for the dominant rule class);
    * patterns containing `*` or ending in `$` compile to an anchored
    * regex (`*` → `.*`; a TRAILING `$` → end anchor; every other
    * regex metachar — including a mid-pattern `$` — escaped to its
    * literal self, the google/robotstxt reading). The DuckDB mirror
    * builds the same regex with the same escape set, and both engines
    * evaluate it with find-semantics over the `^`-anchored pattern, so
    * "pattern matches a prefix of path" is expressed identically.
    */
  private[graft] def ruleMatches(path: Column, pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored, pattern.substr(lit(1), length(pattern) - 1))
      .otherwise(pattern)
    val escaped = regexp_replace(body, "([.\\[\\]{}()+?^$|\\\\])", "\\\\$1")
    val re = concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    when(!pattern.contains("*") && !anchored, path.startsWith(pattern))
      .otherwise(regexp_like(path, re))
  }

  /** Rules collapsed to ONE `(domainCol, __rules)` array row per domain —
    * the shape [[allowedFlags]] joins against. Exposed (r21) so an
    * ITERATING caller (the crawl loops) can collapse + materialize the
    * rules ONCE instead of re-running the aggregation on every hop; pass
    * the result to [[allowedFlagsCollapsed]].
    */
  def collapseRules(rules: DataFrame,
                    domainCol: String = "reg_domain"): DataFrame =
    rules
      .groupBy(col("reg_domain").as(domainCol))
      .agg(collect_list(struct(col("prefix"), col("is_allow")))
        .as("__rules"))

  /** Per-URL admission flags against a [[parseRules]] table:
    * `(keyCols..., allowed)` — one row per input row (the caller's
    * `keyCols` must be unique — duplicate-key rows pass through
    * duplicated, r20). Longest matching rule wins ([[ruleMatches]]
    * pattern semantics, raw value length as priority); `Allow` wins
    * length ties; no match = allowed.
    */
  def allowedFlags(urls: DataFrame, rules: DataFrame,
                   keyCols: Seq[String],
                   domainCol: String = "reg_domain",
                   pathCol: String = "match_path"): DataFrame =
    // Rules collapse to ONE array row per domain BEFORE touching the URL
    // stream (r20): the old shape joined the raw rule rows (multiplying
    // every URL by its domain's rule count) and then groupBy'd the URL
    // key to pick the longest match — a corpus-sized shuffle per call,
    // paid once per hop inside the crawl loops. Aggregating the RULES
    // side (domain-count-sized — one tiny shuffle) and evaluating the
    // longest-match fold as array expressions makes admission a
    // domain-keyed join + narrow map: zero URL-keyed exchanges. Same
    // winner: max over matching rules of (raw value length, is_allow),
    // no match (or no domain row) = allowed — RFC 9309 §2.2.2.
    allowedFlagsCollapsed(urls, collapseRules(rules, domainCol), keyCols,
      domainCol, pathCol)

  /** [[allowedFlags]] over a PRE-COLLAPSED [[collapseRules]] table —
    * the iterating-caller entry point (r21, VERDICT r20 #4).
    */
  def allowedFlagsCollapsed(urls: DataFrame, ruleArr: DataFrame,
                            keyCols: Seq[String],
                            domainCol: String = "reg_domain",
                            pathCol: String = "match_path"): DataFrame =
    urls
      .select((keyCols :+ domainCol :+ pathCol).distinct.map(col): _*)
      .join(ruleArr, Seq(domainCol), "left")
      .withColumn("best", array_max(transform(
        filter(col("__rules"),
          r => ruleMatches(col(pathCol), r.getField("prefix"))),
        r => struct(length(r.getField("prefix")).as("l"),
          r.getField("is_allow").cast("int").as("a")))))
      .select(keyCols.map(col) :+
        (col("best").isNull || col("best.a") === 1).as("allowed"): _*)

  /** Convenience: the admitted subset of `urls` (all original columns),
    * via [[allowedFlags]] + a key join.
    */
  def allowedUrls(urls: DataFrame, rules: DataFrame, keyCols: Seq[String],
                  domainCol: String = "reg_domain",
                  pathCol: String = "match_path"): DataFrame =
    urls.join(
      allowedFlags(urls, rules, keyCols, domainCol, pathCol)
        .filter(col("allowed")).drop("allowed"),
      keyCols, "left_semi")
}
