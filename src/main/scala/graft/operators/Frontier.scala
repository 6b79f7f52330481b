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

  /** Resolve a SITEMAP TREE — the sitemaps.org protocol's real shape:
    * large sites publish a `<sitemapindex>` whose `<loc>` entries point at
    * child sitemap FILES (possibly further indexes), and only the leaf
    * `<urlset>` files carry page URLs. Starting from `roots`
    * (sitemap_url — the robots `Sitemap:` declarations), each level joins
    * the frontier against the URL-KEYED fetched-sitemap table, parses
    * with [[sitemapLocs]], collects `url` locs, and advances on `sitemap`
    * locs. `maxDepth` bounds the walk (the protocol nests rarely past 2;
    * the bound also makes index CYCLES harmless — a loop just burns
    * depth, it cannot hang the job). A referenced child absent from
    * `sitemaps` (fetch failed / not yet crawled) contributes nothing —
    * the join simply finds no body. Returns DISTINCT (domain, loc) page
    * URLs.
    *
    * ENGINE SHAPE: the loop unrolls lazily into `maxDepth` join+parse
    * levels — plan depth ∝ maxDepth (≤ 3), every join an equi-join on the
    * sitemap URL, parse map-side; no iteration state on the driver. */
  def resolveSitemapTree(sitemaps: DataFrame, roots: DataFrame,
      maxDepth: Int = 3, urlCol: String = "sitemap_url",
      xmlCol: String = "sitemap_xml"): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 8,
      s"maxDepth must be in [1, 8], got $maxDepth")
    var frontier = roots.select(col(urlCol)).distinct()
    var pages: Option[DataFrame] = None
    for (_ <- 0 until maxDepth) {
      val locs = sitemapLocs(sitemaps.join(frontier, urlCol), xmlCol)
      val urls = locs.filter(col("kind") === "url").select("domain", "loc")
      pages = Some(pages.fold(urls)(_ unionByName urls))
      frontier = locs.filter(col("kind") === "sitemap")
        .select(col("loc").as(urlCol)).distinct()
    }
    pages.get.distinct()
  }

  /** Schedule `pages` (doc_id, urlCol): → (doc_id, domain, seq,
    * fetch_at) with `seq` the 0-based per-domain fetch order and
    * `fetch_at = seq · delay(domain)` seconds from crawl start.
    * `delays` is (domain, crawl_delay) as [[Robots.crawlDelays]] emits —
    * domains absent there use `defaultDelaySec`. */
  def fetchSchedule(pages: DataFrame, delays: DataFrame,
      urlCol: String = "url", defaultDelaySec: Long = 1L,
      salts: Int = 16): DataFrame =
    scheduleCore(pages, delays, urlCol, defaultDelaySec, salts, priorityCol = None)

  /** VALUE-ORDERED fetch schedule (the Nutch/Heritrix priority frontier):
    * like [[fetchSchedule]], but each domain's queue drains in
    * `priorityCol`-DESCENDING order (authority from [[LinkGraph.pageRank]]
    * / [[LinkGraph.urlAuthority]], OPIC cash, freshness debt, …) with the
    * md5 fairness order breaking ties — order key (priority DESC, salt,
    * md5, doc_id), exactly `row_number() over (partition by domain)` on
    * that key. Output adds the priority column: (doc_id, domain,
    * priorityCol, seq, fetch_at).
    *
    * ENGINE SHAPE — same two exact levels as [[fetchSchedule]], with the
    * priority joining the PARTITION key of the local level: rows rank
    * within (domain, priority, salt) and the per-domain prefix sum runs
    * over the ≤ |distinct priorities| × salts count rows ordered
    * (priority DESC, salt). The hot-domain escape therefore survives any
    * priority whose value set is COARSE relative to the domain's queue —
    * the realistic frontier case (integer authority scores at domain or
    * site-section granularity produce massive ties; the md5 order
    * randomizes within them). A continuous per-URL score would make the
    * offsets table data-scale — band such scores (quantile or log2
    * buckets, the q118 pattern) before scheduling on them.
    * `priorityCol` must be non-null — coalesce upstream (both engines
    * would otherwise need matching null-ordering conventions). */
  def fetchSchedulePrioritized(pages: DataFrame, delays: DataFrame,
      priorityCol: String, urlCol: String = "url", defaultDelaySec: Long = 1L,
      salts: Int = 16): DataFrame =
    scheduleCore(pages, delays, urlCol, defaultDelaySec, salts,
      priorityCol = Some(priorityCol))

  private def scheduleCore(pages: DataFrame, delays: DataFrame,
      urlCol: String, defaultDelaySec: Long, salts: Int,
      priorityCol: Option[String]): DataFrame = {
    require(defaultDelaySec >= 0,
      s"defaultDelaySec must be >= 0, got $defaultDelaySec")
    require(salts >= 1 && salts <= 4096, s"salts must be in [1, 4096], got $salts")
    val pCols = priorityCol.toSeq
    val keyed = pages
      .select(col("doc_id") +: UrlOps.domainOf(col(urlCol)).as("domain") +:
        pCols.map(col): _*)
      .withColumn("__m", md5(col("doc_id").cast("string")))
      .withColumn("__salt",
        (conv(substring(col("__m"), 1, 4), 16, 10).cast("int") % salts).cast("int"))
    // the sub-queue count rides the SAME (domain[, priority], salt)
    // partitioning as the rank window (count needs no order, row_number
    // adds the sort) — so the offsets branch below forks ABOVE the one
    // exchange and ReuseExchange serves it from the rank's shuffle files:
    // the whole upstream (often a robots gate + joins) runs ONCE, not
    // once per branch (a groupBy-based count would build a second,
    // non-reusable exchange over partial aggregates)
    val partKeys = "domain" +: pCols :+ "__salt"
    val w = Window.partitionBy(partKeys.map(col): _*)
    val local = keyed
      .withColumn("__rn", row_number().over(w.orderBy(col("__m"), col("doc_id"))))
      .withColumn("__c", count(lit(1)).over(w))
    // salt offsets: distinct collapses to ≤ |priorities|·salts rows per
    // domain before the per-domain window, so THAT window's partitions
    // are bounded by construction (coarse-priority contract above) —
    // never by the data. Prefix order (priority DESC, salt) makes
    // off + local_rank ≡ row_number over (domain ORDER BY priority DESC,
    // salt, md5, doc_id) — the collapsed single window the oracle replays.
    val offsets = local.select(partKeys.head, partKeys.tail :+ "__c": _*).distinct()
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy("domain")
          .orderBy(pCols.map(col(_).desc) :+ col("__salt").asc: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(partKeys.head, partKeys.tail :+ "__off": _*)
    local.join(offsets, partKeys)
      .join(delays.select(col("domain"),
        col("crawl_delay").cast("long").as("__d")), Seq("domain"), "left")
      .select(col("doc_id") +: col("domain") +: pCols.map(col) :+
        (col("__off") + col("__rn") - 1).as("seq") :+
        ((col("__off") + col("__rn") - 1) *
          coalesce(col("__d"), lit(defaultDelaySec))).as("fetch_at"): _*)
  }

  /** Adaptive REVISIT scheduling — the freshness half of a continuous
    * crawl planner (the classic multiplicative policy: Cho &
    * Garcia-Molina 2003's uniform-vs-proportional result motivates
    * adapting the interval to each page's observed change rate; Heritrix
    * and commercial crawlers ship exactly this double-on-unchanged /
    * halve-on-changed rule). Compare two snapshots by content hash, then
    * per URL:
    *  - unchanged → interval doubles (capped at `maxSec`);
    *  - changed   → interval halves (floored at `minSec`);
    *  - added     → `initialSec` (first observation, no history);
    *  - removed   → dropped from the schedule.
    * `intervals` is (idCol, interval_sec) from the previous cycle — URLs
    * absent there (first revisit) start from `initialSec`. Output:
    * (idCol, status, interval_sec, next_fetch_at = nowSec + interval_sec).
    * `nowSec` is the cycle's clock, supplied by the caller — the operator
    * stays a pure function. ALL arithmetic is integer (`div 2`, `* 2`,
    * clamp), so the schedule replays bit-for-bit in any engine.
    *
    * ENGINE SHAPE — the [[TextAnalysis.corpusDiff]] posture: both
    * snapshots project to (id, md5) BEFORE the full-outer join, so the
    * shuffles carry 16-byte hashes, never text — and then COLLAPSE to one
    * row per URL (min hash; a snapshot is logically url → content, so
    * duplicate fetches of one URL reduce deterministically instead of
    * multiplying through the join: with d duplicates per side the raw join
    * fans d², which the r9 stress probe measured as 113 M rows and a 60×
    * super-linear wall on the 10× fixture). The intervals store collapses
    * the same way to min(interval) — the most conservative (soonest)
    * revisit when a store ships conflicting rows. The joins are then
    * structurally 1:1 per URL at ANY duplication level. No windows, no
    * driver state. */
  def recrawlSchedule(oldSnap: DataFrame, newSnap: DataFrame,
      intervals: DataFrame, nowSec: Long, idCol: String = "url",
      textCol: String = "text", initialSec: Long = 3600L,
      minSec: Long = 300L, maxSec: Long = 86400L): DataFrame = {
    require(minSec >= 1, s"minSec must be >= 1, got $minSec")
    require(maxSec >= minSec, s"maxSec must be >= minSec, got $maxSec")
    require(initialSec >= minSec && initialSec <= maxSec,
      s"initialSec must be in [minSec, maxSec], got $initialSec")
    val o = oldSnap.select(col(idCol).as("__oid"), md5(col(textCol)).as("__oh"))
      .groupBy("__oid").agg(min("__oh").as("__oh"))
    val n = newSnap.select(col(idCol).as("__nid"), md5(col(textCol)).as("__nh"))
      .groupBy("__nid").agg(min("__nh").as("__nh"))
    val status = when(col("__oh").isNull, lit("added"))
      .when(col("__oh") =!= col("__nh"), lit("changed"))
      .otherwise(lit("unchanged"))
    // previous interval, clamped into [minSec, maxSec] first so a
    // corrupted store can't push the update rule out of range
    val prev = greatest(lit(minSec),
      least(lit(maxSec), coalesce(col("__prev"), lit(initialSec))))
    val interval = when(col("__status") === "added", lit(initialSec))
      .when(col("__status") === "changed",
        greatest(lit(minSec), expr("__pc div 2")))
      .otherwise(least(lit(maxSec), col("__pc") * 2))
    o.join(n, col("__oid") === col("__nid"), "full_outer")
      .filter(col("__nh").isNotNull) // removed URLs leave the schedule
      .select(col("__nid").as(idCol), status.as("__status"))
      .join(intervals.select(col(idCol),
          col("interval_sec").cast("long").as("__prev"))
        .groupBy(idCol).agg(min("__prev").as("__prev")), Seq(idCol), "left")
      .withColumn("__pc", prev)
      .select(col(idCol), col("__status").as("status"),
        interval.as("interval_sec"),
        (lit(nowSec) + interval).as("next_fetch_at"))
  }
}
