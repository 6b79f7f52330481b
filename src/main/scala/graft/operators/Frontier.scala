package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier fetch scheduling — the step between the compliance gate
  * ([[Robots.robotsGate]] ∧ [[UrlOps.domainBlocklist]]) and actually
  * spending fetches: assign every candidate URL a per-domain sequence
  * number and a fetch time honoring per-domain politeness delay (the
  * Heritrix/Nutch per-host queue convention: one in-flight fetch per
  * domain, `crawl_delay` seconds between them; delay from robots.txt's
  * de-facto `Crawl-delay` directive via [[Robots.crawlDelays]], default
  * 1 s).
  *
  * ENGINE SHAPE — per-domain sequencing is the textbook skew trap: a
  * naive `row_number() over (partition by domain)` serializes a hot
  * domain (a 100 M-page host at 100 TB) onto ONE reducer. The schedule
  * therefore ranks in two exact levels, the q118/q48 family of
  * distributed prefix tricks:
  *  1. each row salts into one of `salts` sub-queues by an md5-derived
  *     bucket and ranks LOCALLY within (domain, salt) — the hot domain
  *     spreads over `salts` reducers;
  *  2. per-(domain, salt) COUNTS (≤ `salts` rows per domain, data-scale
  *     no more) prefix-sum per domain into salt offsets, and
  *     `seq = offset + local_rank - 1`.
  * The result is exactly `row_number() over (partition by domain order by
  * salt, md5(doc_id), doc_id) - 1` — a deterministic pseudo-random
  * fairness order — without any per-domain single-reducer window over
  * data-scale rows. Shuffles carry (doc_id, domain, salt) only; text
  * never enters. The delay join keys on domain against the robots-derived
  * delay table (AQE broadcasts it — one row per domain WITH an explicit
  * delay, far smaller than the frontier).
  */
object Frontier {

  /** `<loc>` entry: optional whitespace inside the element, content
    * capped at the next `<` so Java regex and RE2 degrade identically on
    * malformed nesting. Tag names stay case-sensitive (lowercase per the
    * sitemaps.org schema). */
  private[graft] val locRe: String = "<loc>\\s*([^<]*?)\\s*</loc>"

  /** Root element: `urlset` (page URLs) vs `sitemapindex` (nested
    * sitemap refs). Anything else is a malformed body. */
  private[graft] val rootRe: String = "<\\s*(urlset|sitemapindex)[\\s>]"

  /** Parse sitemap XML bodies (domain, xmlCol) into discovered
    * locations: (domain, kind, loc) with kind `url` for a `<urlset>`
    * body and `sitemap` for a `<sitemapindex>` body (nested refs a
    * crawler fetches next). Locations entity-decode with the shared
    * [[Boilerplate.entities]] table (the protocol REQUIRES `&`→`&amp;`
    * escaping inside `<loc>`). Bodies with neither root yield zero rows
    * — the quarantine-by-omission contract (detect them by anti-joining
    * declared sitemaps against the output, as the q129 fixture pins).
    * Pure per-row regex work, no shuffle — a sitemap body is ≤ 50 MB /
    * 50k URLs by protocol cap, comfortable per-row. */
  def sitemapLocs(sitemaps: DataFrame, xmlCol: String = "sitemap_xml"): DataFrame = {
    val root = lower(regexp_extract(col(xmlCol), rootRe, 1))
    val decoded = (c: Column) => Boilerplate.entities.foldLeft(c) {
      case (acc, (e, ch)) => regexp_replace(acc, lit(e), lit(ch))
    }
    sitemaps
      .withColumn("__kind", when(root === "sitemapindex", lit("sitemap"))
        .when(root === "urlset", lit("url")))
      .filter(col("__kind").isNotNull)
      .select(col("domain"), col("__kind").as("kind"),
        explode(transform(regexp_extract_all(col(xmlCol), lit(locRe), lit(1)),
          decoded)).as("loc"))
      .filter(col("loc") =!= "")
  }

  /** Schedule `pages` (doc_id, urlCol): → (doc_id, domain, seq,
    * fetch_at) with `seq` the 0-based per-domain fetch order and
    * `fetch_at = seq · delay(domain)` seconds from crawl start.
    * `delays` is (domain, crawl_delay) as [[Robots.crawlDelays]] emits —
    * domains absent there use `defaultDelaySec`. */
  def fetchSchedule(pages: DataFrame, delays: DataFrame,
      urlCol: String = "url", defaultDelaySec: Long = 1L,
      salts: Int = 16): DataFrame = {
    require(defaultDelaySec >= 0,
      s"defaultDelaySec must be >= 0, got $defaultDelaySec")
    require(salts >= 1 && salts <= 4096, s"salts must be in [1, 4096], got $salts")
    val keyed = pages
      .select(col("doc_id"), UrlOps.domainOf(col(urlCol)).as("domain"))
      .withColumn("__m", md5(col("doc_id").cast("string")))
      .withColumn("__salt",
        (conv(substring(col("__m"), 1, 4), 16, 10).cast("int") % salts).cast("int"))
    // the sub-queue count rides the SAME (domain, salt) partitioning as
    // the rank window (count needs no order, row_number adds the sort) —
    // so the offsets branch below forks ABOVE the one exchange and
    // ReuseExchange serves it from the rank's shuffle files: the whole
    // upstream (often a robots gate + joins) runs ONCE, not once per
    // branch (a groupBy-based count would build a second, non-reusable
    // exchange over partial aggregates)
    val w = Window.partitionBy("domain", "__salt")
    val local = keyed
      .withColumn("__rn", row_number().over(w.orderBy(col("__m"), col("doc_id"))))
      .withColumn("__c", count(lit(1)).over(w))
    // salt offsets: distinct collapses to ≤ salts rows per domain before
    // the per-domain window, so THAT window's partitions are bounded by
    // construction — never by the data
    val offsets = local.select("domain", "__salt", "__c").distinct()
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy("domain").orderBy("__salt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("domain", "__salt", "__off")
    local.join(offsets, Seq("domain", "__salt"))
      .join(delays.select(col("domain"),
        col("crawl_delay").cast("long").as("__d")), Seq("domain"), "left")
      .select(col("doc_id"), col("domain"),
        (col("__off") + col("__rn") - 1).as("seq"),
        ((col("__off") + col("__rn") - 1) *
          coalesce(col("__d"), lit(defaultDelaySec))).as("fetch_at"))
  }
}
