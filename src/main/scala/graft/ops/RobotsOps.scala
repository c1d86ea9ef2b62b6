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
  *    block can be addressed to several agents);
  *  - group selection per RFC 9309 §2.2.1 at token granularity: if any
  *    group on the domain names the crawler's exact token
  *    (case-insensitive), ONLY those groups govern it; otherwise the
  *    `*` groups do; a domain with neither allows everything;
  *  - `Allow`/`Disallow` values are path prefixes; an empty value is
  *    no rule (the standard "Disallow:" = allow-all idiom);
  *  - admission per URL: the longest matching prefix wins; on a length
  *    tie `Allow` wins; no matching rule = allowed (RFC 9309 §2.2.2);
  *  - matching is against path + query of the canonical URL
  *    ([[matchPath]]), `$`/`*` wildcards NOT interpreted (documented
  *    subset: prefix matching is the normative core; wildcard support
  *    is a data-dependent extension a deployment adds to the same
  *    longest-match frame).
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
                 textCol: String = "robots_txt"): DataFrame = {
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
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
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
    grouped.filter(col("is_ua") === 0 && col("value") =!= "")
      .join(governing, Seq("reg_domain", "grp"), "left_semi")
      .select(col("reg_domain"),
        (col("directive") === "allow").as("is_allow"),
        col("value").as("prefix"))
      .distinct()
  }

  /** Per-URL admission flags against a [[parseRules]] table:
    * `(keyCols..., allowed)` — one row per input row (the caller's
    * `keyCols` must be unique). Longest matching prefix wins; `Allow`
    * wins length ties; no match = allowed.
    */
  def allowedFlags(urls: DataFrame, rules: DataFrame,
                   keyCols: Seq[String],
                   domainCol: String = "reg_domain",
                   pathCol: String = "match_path"): DataFrame = {
    val joined = urls
      .select((keyCols :+ domainCol :+ pathCol).distinct.map(col): _*)
      .join(rules.withColumnRenamed("reg_domain", domainCol),
        Seq(domainCol), "left")
      .withColumn("hit", col("prefix").isNotNull &&
        col(pathCol).startsWith(col("prefix")))
    joined.groupBy(keyCols.map(col): _*)
      .agg(max(when(col("hit"),
        struct(length(col("prefix")).as("l"),
          col("is_allow").cast("int").as("a")))).as("best"))
      .select(keyCols.map(col) :+
        (col("best").isNull || col("best.a") === 1).as("allowed"): _*)
  }

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
