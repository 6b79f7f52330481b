package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt compliance gate — the crawl pipeline's LEGAL front door
  * (RFC 9309, the Robots Exclusion Protocol; the reference engine delegates
  * ingest to other plugins, so compliance filtering is part of the source
  * surface this engine owns, next to [[Boilerplate.extractPageMeta]]'s
  * in-page `noindex` gate).
  *
  * Semantics implemented (RFC 9309 §2):
  *  - a GROUP is one or more consecutive `User-agent:` lines followed by
  *    its rules; rules above the first `User-agent` line belong to no
  *    group and never apply (§2.2.1);
  *  - group selection: if any group names our product token (exact,
  *    case-insensitive), exactly those groups apply and every `*` group is
  *    ignored; otherwise the `*` groups apply; multiple applicable groups'
  *    rules are COMBINED (§2.2.1);
  *  - rule matching starts at the first byte of the path+query, `*`
  *    matches any run, a trailing `$` anchors at end-of-path (§2.2.3);
  *    an empty Allow/Disallow value matches nothing;
  *  - precedence: the matching rule with the LONGEST path wins; on a
  *    length tie Allow wins; no matching rule (or no robots.txt, or no
  *    applicable group) means allowed (§2.2.2).
  *  - non-gate directives (`Crawl-delay`, `Sitemap`, ...) and `#`
  *    comments are ignored by the allow/disallow verdict; any directive
  *    line (not comments/blanks) ends a `User-agent` header run, so the
  *    gate and the [[crawlDelays]] parse share ONE group structure.
  *
  * Not implemented (documented divergence): percent-encoding
  * normalization of rule vs URL octets (§2.2.2's equivalence table) — the
  * gate compares the byte forms as crawled, the common production choice.
  *
  * ENGINE SHAPE — the whole precedence ladder collapses into one integer:
  * each rule becomes `rank = 2·len(path) + isAllow`, so "longest wins,
  * Allow breaks ties" is just `max(rank)` over the matching rules and the
  * verdict is `max % 2 = 1`. Rules compile once per domain into an array
  * of (LIKE pattern, rank) structs (`*` → `%`, trailing `$` → unanchored
  * tail removed, `%`/`_`/`!` escaped with `!`), and each page evaluates
  * `array_max(transform(filter(rules, path LIKE lp)))` IN-ROW. Pages
  * shuffle once, keyed by domain, carrying (doc_id, domain, path) — never
  * document text — and there is NO per-doc groupBy or window afterwards;
  * robots parsing windows only over robots.txt LINES (bounded: a robots
  * file is ~KBs). Per-page cost is O(#applicable rules · |path|), both
  * bounded by the protocol's own file-size expectations (RFC 9309 §2.5
  * caps parsing at 500 KiB).
  */
object Robots {

  /** path + query (fragment dropped) of an absolute URL, `/` when empty —
    * the string RFC 9309 rules match against. */
  def pathOf(url: Column): Column = {
    val p = regexp_extract(url, pathQueryRe, 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** path+query extractor (fragment excluded) — shared with the q115
    * oracle so operator and replay agree on the match target. */
  private[graft] val pathQueryRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"
  private[graft] val directiveKindRe = "^\\s*([A-Za-z-]+)\\s*:"
  private[graft] val directiveValRe = "^\\s*[A-Za-z-]+\\s*:\\s*(.*?)\\s*$"

  /** Parse robots.txt bodies into per-domain compiled rule arrays for one
    * product token: (domain, rules: array<struct<lp: string, rank: long>>)
    * with only the APPLICABLE groups' rules retained (specific groups if
    * any name `agent`, else the `*` groups). Domains whose robots.txt
    * yields no applicable non-empty rule drop out (a missing row means
    * "allowed", matching the gate's left-join contract). */
  def parseRules(robots: DataFrame, agent: String,
      domainCol: String = "domain", txtCol: String = "robots_txt"): DataFrame = {
    require(agent.nonEmpty && agent == agent.toLowerCase(java.util.Locale.ROOT),
      s"agent must be a non-empty lowercase product token, got '$agent'")
    val grouped = groupedDirectives(robots, domainCol, txtCol,
      Seq("user-agent", "allow", "disallow"))
    val applicable = applicableGroups(grouped, agent)
    // compile rules of the applicable groups: LIKE pattern + rank
    val rules = grouped.filter(col("kind").isin("allow", "disallow") && col("val") =!= "")
      .join(applicable, Seq("domain", "gid"))
      .withColumn("__esc",
        expr("replace(replace(replace(val, '!', '!!'), '%', '!%'), '_', '!_')"))
      .withColumn("lp", translate(
        when(col("__esc").endsWith("$"),
          expr("substring(__esc, 1, length(__esc) - 1)"))
          .otherwise(concat(col("__esc"), lit("%"))), "*", "%"))
      .withColumn("rank", length(col("val")) * 2 +
        when(col("kind") === "allow", 1L).otherwise(0L))
    rules.groupBy("domain")
      .agg(collect_list(struct(col("lp"), col("rank"))).as("rules"))
  }

  /** robots.txt LINES of the requested directive kinds, with RFC 9309
    * group ids: comment-stripped, CR-tolerant (the \s* in the directive
    * regexes swallows a trailing \r), position-indexed; group id =
    * running count of agent-run STARTS (an agent line whose previous
    * DIRECTIVE line is not an agent line). Group ids are assigned over
    * the four GROUP-RELEVANT kinds ([[groupKinds]] — the isin pre-filter
    * below runs BEFORE the gid window) and the caller's `kinds` filters
    * only AFTERWARDS, so every consumer — the 3-kind gate and the
    * crawl-delay parse — sees the one group structure. The alternative
    * (gid over each caller's retained kinds) makes the two parses DISAGREE
    * whenever a dropped-kind line sits inside a multi-agent header run
    * ("User-agent: a\nCrawl-delay: 1\nUser-agent: b\n…"): the gate would
    * merge a and b into one run while the delay parse splits them. Real
    * robots.txt files do interleave Crawl-delay into header runs; with
    * the shared structure the delay above binds to group(a) and `b`
    * starts a fresh group in BOTH parses — the reading of a crawler that
    * honors Crawl-delay as a group rule (Bing/Yandex convention).
    *
    * Why groupKinds and not all `name:` lines: RFC 9309 §2.2.2
    * makes other records (Sitemap:, unknown directives) "independent of
    * any group" whose parsing "MUST NOT interfere" with group parsing —
    * so a `Sitemap:` line sitting between two consecutive `User-agent:`
    * header lines (common in real files) must NOT split the run the way
    * a rule line would.
    * Windows partition by domain over robots LINES only — bounded by the
    * file, not the corpus. */
  private[operators] val groupKinds: Seq[String] =
    Seq("user-agent", "allow", "disallow", "crawl-delay")

  private def groupedDirectives(robots: DataFrame, domainCol: String,
      txtCol: String, kinds: Seq[String]): DataFrame = {
    val lines = robots.select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\n")).as(Seq("idx", "raw")))
      .withColumn("cl", regexp_replace(col("raw"), "#.*$", ""))
      .withColumn("kind", lower(regexp_extract(col("cl"), directiveKindRe, 1)))
      .withColumn("val", regexp_extract(col("cl"), directiveValRe, 1))
      .filter(col("kind").isin(groupKinds: _*))
    val wo = Window.partitionBy("domain").orderBy("idx")
    lines
      .withColumn("__ag", col("kind") === "user-agent")
      .withColumn("gid", sum(
        when(col("__ag") && !coalesce(lag(col("__ag"), 1).over(wo), lit(false)), 1L)
          .otherwise(0L)).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("kind").isin(kinds: _*))
  }

  /** Group selection per RFC 9309 §2.2.1: the groups naming `agent`
    * exactly if any do, else the `*` groups — domain-wide. */
  private def applicableGroups(grouped: DataFrame, agent: String): DataFrame =
    grouped.filter(col("__ag"))
      .select(col("domain"), col("gid"),
        (lower(col("val")) === agent).as("spec"))
      .filter(lower(col("val")) === agent || col("val") === "*")
      .withColumn("__ms", max(col("spec")).over(Window.partitionBy("domain")))
      .filter(col("spec") === col("__ms"))
      .select("domain", "gid").distinct()

  /** Per-domain politeness delay from the de-facto `Crawl-delay`
    * directive (not in RFC 9309, but honored by most non-Google crawlers
    * and present in a large share of real robots.txt files): integer
    * seconds from the APPLICABLE groups only — a `*` group's delay does
    * NOT apply when a specific group names `agent` (same shadowing as
    * the allow/disallow gate) — max across applicable groups when
    * several declare one (the conservative read), non-numeric values
    * ignored. Valid = 1-9 DIGITS: the digit cap rejects adversarial
    * robots files with absurd values BEFORE any cast, where Spark's
    * long-cast would silently null on overflow but an oracle's ::BIGINT
    * would error — and a delay cap of 10⁹ s (~31 years) loses nothing.
    * Emits (domain, crawl_delay) for domains with an explicit
    * valid delay ONLY; absence means "caller's default", matching
    * [[parseRules]]' missing-row contract. The allow/disallow gate
    * itself keeps ignoring `Crawl-delay` lines entirely, per RFC. */
  def crawlDelays(robots: DataFrame, agent: String,
      domainCol: String = "domain", txtCol: String = "robots_txt"): DataFrame = {
    require(agent.nonEmpty && agent == agent.toLowerCase(java.util.Locale.ROOT),
      s"agent must be a non-empty lowercase product token, got '$agent'")
    val grouped = groupedDirectives(robots, domainCol, txtCol,
      Seq("user-agent", "allow", "disallow", "crawl-delay"))
    grouped.filter(col("kind") === "crawl-delay" && col("val").rlike("^[0-9]{1,9}$"))
      .join(applicableGroups(grouped, agent), Seq("domain", "gid"))
      .groupBy("domain")
      .agg(max(col("val").cast("long")).as("crawl_delay"))
  }

  /** `Sitemap:` directive extraction — crawl DISCOVERY's entry point
    * (sitemaps.org protocol, referenced by RFC 9309 §2.3 as an allowed
    * other-record). Sitemap lines are GLOBAL by convention: they bind to
    * no User-agent group, so this is a flat line scan — comment-stripped
    * like every directive (a `#fragment` in a sitemap URL would be eaten,
    * but fragments are meaningless on a fetch URL and the gate already
    * strips them from page URLs). Emits (domain, sitemap_url), one row
    * per declared sitemap; the allow/disallow and delay parses keep
    * ignoring these lines. */
  def sitemapUrls(robots: DataFrame, domainCol: String = "domain",
      txtCol: String = "robots_txt"): DataFrame =
    robots.select(col(domainCol).as("domain"),
        explode(split(col(txtCol), "\n")).as("raw"))
      .withColumn("cl", regexp_replace(col("raw"), "#.*$", ""))
      .filter(lower(regexp_extract(col("cl"), directiveKindRe, 1)) === "sitemap")
      .select(col("domain"),
        regexp_extract(col("cl"), directiveValRe, 1).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Per-page robots verdict: (doc_id, domain, path, allowed). `pages`
    * needs (doc_id, urlCol); `robots` needs (domain, robots_txt) with
    * domain in [[UrlOps.domainOf]] form (lowercased registered host).
    * Join back on doc_id for the full rows (the [[UrlOps.domainCap]]
    * convention). */
  def robotsGate(pages: DataFrame, robots: DataFrame, agent: String,
      urlCol: String = "url"): DataFrame = {
    val ruleSets = parseRules(robots, agent)
    pages.select(col("doc_id"), UrlOps.domainOf(col(urlCol)).as("domain"),
        pathOf(col(urlCol)).as("path"))
      .join(ruleSets, Seq("domain"), "left")
      .withColumn("__mr", expr(
        "array_max(transform(filter(rules, q -> path LIKE q.lp ESCAPE '!'), q -> q.rank))"))
      .select(col("doc_id"), col("domain"), col("path"),
        coalesce(col("__mr") % 2 === 1, lit(true)).as("allowed"))
  }
}
