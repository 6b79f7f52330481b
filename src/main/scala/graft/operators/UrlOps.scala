package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene operators — the stage a web-corpus pipeline runs before any
  * text operator (C4, RefinedWeb, Gopher all dedup and cap by URL/domain
  * before content dedup ever sees a byte):
  *
  *  - URL NORMALIZATION: strip the fragment, drop tracking parameters
  *    (utm_*, fbclid, gclid), lowercase scheme and host (NOT the path —
  *    paths are case-sensitive), strip default ports (:80 http / :443
  *    https, non-default ports kept). Two raw variants of one resource
  *    normalize to the same string.
  *  - URL DEDUP: exact-dedup on the normalized URL — [[Dedup.exact]]'s
  *    hash-shuffle contract with normalization in front.
  *  - DOMAIN CAP: at most `maxPerDomain` documents per registered host, the
  *    anti-over-representation stage; selection is deterministic md5-hash
  *    order so reruns keep identical rows (the [[Sampling]] convention).
  *
  * All normalization is a chain of engine-portable regexes (Java ∩ RE2
  * syntax, no capture-group replacements — Java spells them `$1`, RE2
  * `\1`, so the chain avoids them entirely and the SAME pattern strings
  * drive operator and oracle). Pure projection; the only shuffles are the
  * dedup groupBy and the cap's per-domain window.
  *
  * 100 TB shape: normalization is map-side codegen'd regex work; URL dedup
  * shuffles (url, doc_id) only — never document text; the domain cap's
  * window partitions by domain and prunes with WindowGroupLimit, and a
  * pathologically hot domain is exactly what the cap REMOVES (output per
  * domain is bounded by `maxPerDomain`, so the post-cap skew is gone by
  * construction — the straggler only sorts one domain's rows, same
  * exposure as any per-entity window in this package).
  */
object UrlOps {

  /** Tracking parameters stripped by normalization (alternation used
    * inside the removal regexes; extend as crawl profiles require). */
  private[graft] val trackingParams: String = "(utm_[a-zA-Z0-9]+|fbclid|gclid)"

  private[graft] val schemeRe: String = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private[graft] val restRe: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$"

  /** Optional `user:pass@` userinfo, captured VERBATIM (empty when absent).
    * Userinfo is case-sensitive per RFC 3986 §3.2.1 — lowercasing it would
    * fold `http://Alice@a.com/` and `http://alice@a.com/` into one
    * canonical URL and dedup would drop a genuinely distinct resource — so
    * normalization re-attaches it unchanged and lowercases only the
    * host:port that follows. */
  private[graft] val userinfoRe: String = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#@]*@)?"

  /** host:port AFTER the optional userinfo — the only authority piece
    * normalization lowercases (host names are case-insensitive per RFC
    * 3986 §3.2.2). */
  private[graft] val hostPortRe: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)"

  /** Registered host: userinfo (`user:pass@`) skipped via an optional
    * non-capturing group — RE2 has no lookbehind, but greedy-optional
    * does the job — then host chars up to port/path/query. Without the
    * skip, `http://alice@host.com/x` would "cap" by the domain `alice`. */
  private[graft] val bareHostRe: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]*)"

  /** Adds `norm_url` (and keeps every input column). A string with no
    * `scheme://` prefix (relative links, garbage rows in a crawl) passes
    * through with only the fragment/tracking strip — never mangled into
    * a phantom `://` — so downstream dedup still groups it sanely.
    *
    * Implementation is the [[graft.functions.NormalizeUrl]] codegen
    * expression, not a column-expression chain: as columns, the final
    * CASE/concat referenced the ~15-regex strip tree about a dozen
    * times, and predicate pushdown + join keys re-inlined all of it —
    * composed over a derived-URL fixture the fused codegen method blew
    * past the JVM's 64 KB limit and the whole stage ran interpreted
    * (r13 decomposition; BENCH_NOTES). One compact expression keeps
    * every consumer inside whole-stage codegen and runs the chain once
    * per row. Semantics are byte-identical — the oracles still replay
    * the regex chain in SQL. */
  def withNormalizedUrl(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs.withColumn("norm_url",
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.NormalizeUrl(
          org.apache.spark.sql.GraftColumnBridge.expression(col(urlCol)))))

  /** Registered host (lowercased, port excluded) — the domain-cap key. */
  def domainOf(url: Column): Column = lower(regexp_extract(url, bareHostRe, 1))

  /** Exact dedup on the NORMALIZED URL: one row per distinct normalized
    * URL, smallest doc_id as keeper, duplicate count — [[Dedup.exact]]'s
    * shape with normalization in front. The shuffle carries (norm_url,
    * doc_id) only. */
  def urlDedup(docs: DataFrame, urlCol: String = "url"): DataFrame =
    withNormalizedUrl(docs, urlCol)
      .groupBy("norm_url")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Domain-level quality gate — the aggregation step the RefinedWeb/DCLM
    * family applies ABOVE per-document filtering: a domain whose documents
    * average below threshold is dropped wholesale (content farms score
    * uniformly low; boilerplate-heavy hosts drag their own mean down).
    * Joins per-doc scores to domains, then aggregates INTEGER-EXACTLY:
    * scores convert to micro-units (round(score·10⁶) — exact on the
    * scorers' 6-decimal-rounded outputs), so the per-domain mean is a
    * bigint division with NO float-sum order dependence across partitions
    * or engines (the q113 integer-PageRank policy). Emits one row per
    * domain: (domain, n_docs, n_keep, avg_quality_micro, domain_keep).
    *
    * 100 TB shape: one shuffle keyed by domain carrying (domain, micro)
    * after a map-side partial aggregate — never text; hot domains
    * pre-aggregate map-side (sum/count combine), so no skew trap. Both
    * division operands are non-negative in practice (score sums at the
    * threshold operating point); `div` truncation vs floor differences
    * would only surface on negative domain TOTALS, which the scorer's
    * weight floor (−0.2 per doc) makes unreachable at the 0.4 gate. */
  def domainQualityGate(scores: DataFrame, urls: DataFrame,
      scoreCol: String = "quality_score", urlCol: String = "url",
      thresholdMicro: Long = 400000L): DataFrame = {
    val micro = round(col(scoreCol) * lit(1000000.0), 0).cast("long")
    scores.join(urls.select(col("doc_id"), domainOf(col(urlCol)).as("domain")), "doc_id")
      .select(col("domain"), micro.as("__m"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__m") >= thresholdMicro, 1L).otherwise(0L)).as("n_keep"),
        sum(col("__m")).as("__s"))
      .select(col("domain"), col("n_docs"), col("n_keep"),
        expr("__s div n_docs").as("avg_quality_micro"))
      .withColumn("domain_keep", col("avg_quality_micro") >= thresholdMicro)
  }

  /** Domain blocklist screening (the UT1-blacklist convention RefinedWeb
    * applies before any content filter): a page is blocked when its
    * registered host equals a blocklist entry OR sits under one
    * (`ads.example.com` matches entry `example.com` — suffix-at-label-
    * boundary, so `notexample.com` does NOT). Returns (doc_id, domain,
    * blocked).
    *
    * ENGINE SHAPE: each host expands to its ≤ ~6 label suffixes (`a.b.c`
    * → `c`, `b.c`, `a.b.c` — bounded by DNS label depth, not data), which
    * equi-join the blocklist on the suffix string. Only (doc_id, suffix)
    * rows ever shuffle — never text — and the blocklist side aggregates to
    * DISTINCT blocked doc_ids before the final id-keyed left join, which
    * AQE broadcasts whenever the blocked set is small (the common case).
    * Blocklists at UT1 scale (millions of domains) stay a DataFrame —
    * never a literal array. */
  def domainBlocklist(pages: DataFrame, blocked: DataFrame,
      urlCol: String = "url", blockedCol: String = "domain"): DataFrame = {
    val withDomain = pages.select(col("doc_id"), domainOf(col(urlCol)).as("domain"))
    val suffixes = withDomain
      .select(col("doc_id"), explode(expr(
        """transform(split(domain, '\\.'),
          |  (x, i) -> array_join(slice(split(domain, '\\.'), i + 1,
          |                             size(split(domain, '\\.')) - i), '.'))"""
          .stripMargin)).as("suffix"))
    val blockedIds = suffixes
      .join(blocked.select(lower(col(blockedCol)).as("suffix")), Seq("suffix"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("__b", lit(true))
    withDomain.join(blockedIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("__b"), lit(false)).as("blocked"))
  }

  /** Keep at most `maxPerDomain` documents per domain, selected in
    * deterministic md5(doc_id) order (ties broken by doc_id) — the
    * over-representation cap. Returns (doc_id, domain) for the survivors;
    * join back on doc_id for the full rows. */
  def domainCap(docs: DataFrame, urlCol: String = "url",
      maxPerDomain: Int = 1000): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), domainOf(col(urlCol)).as("domain"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerDomain)
      .select("doc_id", "domain")
  }

  /** URL path (between authority and `?`/`#`) — feeds the trap signals. */
  private[graft] val pathRe: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]*([^?#]*)"

  /** Crawl-trap detection — the frontier's self-defence against infinite
    * URL spaces (Heritrix's "path-repetition" and "excessive-path-depth"
    * filters plus the session-id/calendar template heuristic every
    * production crawler carries):
    *
    *   - `depth`           — non-empty path segments > `maxDepth` (a
    *                         30-deep URL is a generator, not content)
    *   - `max_seg_repeat`  — one segment appearing ≥ `maxRepeats` times
    *                         (the /a/b/a/b/a/b relative-link loop)
    *   - `n_params`        — query parameters > `maxParams` (faceted-
    *                         search explosion)
    *   - `n_template_urls` — DISTINCT urls sharing this url's digit-masked
    *                         template (all digit runs → `0`) ≥
    *                         `templateThreshold`: one page generator
    *                         stamping out unbounded session-id / calendar
    *                         variants. Unlike the three in-row signals
    *                         this one needs corpus evidence — a single
    *                         deep archive page is fine; 50 000 urls that
    *                         differ only in digits are a trap.
    *
    * `is_trap` ORs the four. Per-row signals are shuffle-free in-row HOF
    * folds over the split path (O(k²) on k = segments per URL — k is tens
    * at worst); the template census is one partial-aggregated
    * count-distinct groupBy on the template key plus an equi-join back —
    * both data-scale safe, no windows, no driver state. */
  def crawlTraps(pages: DataFrame, urlCol: String = "url",
      maxDepth: Int = 8, maxRepeats: Int = 3, maxParams: Int = 5,
      templateThreshold: Long = 40L): DataFrame = {
    require(maxDepth > 0 && maxRepeats > 1 && maxParams > 0 && templateThreshold > 1,
      "trap thresholds must be positive (maxRepeats/templateThreshold > 1)")
    val segs = filter(split(regexp_extract(col(urlCol), pathRe, 1), "/"),
      s => s =!= "")
    // fragment strips FIRST: per RFC 3986 a '?' inside the fragment is
    // fragment text, not a query — matching the first '?' anywhere would
    // count '#sec?x=1&…' as parameters and trap a benign page
    val q = regexp_extract(regexp_replace(col(urlCol), "#.*$", ""),
      "\\?(.*)$", 1)
    val withSignals = pages.select(
      col("doc_id"), col(urlCol),
      regexp_replace(col(urlCol), "[0-9]+", "0").as("__tpl"),
      size(segs).as("depth"),
      coalesce(
        array_max(transform(segs, s => size(filter(segs, x => x === s)))),
        lit(0)).as("max_seg_repeat"),
      when(q === "", 0).otherwise(size(split(q, "&"))).as("n_params"))
    val census = withSignals.groupBy("__tpl")
      .agg(count_distinct(col(urlCol)).as("n_template_urls"))
    withSignals.join(census, "__tpl")
      .withColumn("is_trap",
        col("depth") > maxDepth ||
          col("max_seg_repeat") >= maxRepeats ||
          col("n_params") > maxParams ||
          col("n_template_urls") >= templateThreshold)
      .select("doc_id", "depth", "max_seg_repeat", "n_params",
        "n_template_urls", "is_trap")
  }
}
