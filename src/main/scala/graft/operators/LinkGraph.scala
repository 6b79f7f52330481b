package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators — the domain-authority signal a crawl-curation
  * pipeline derives from the crawl itself (Common Crawl publishes exactly
  * this: host/domain-level rank from the hyperlink graph; quality filters
  * and crawl frontiers consume it alongside the content-side scores):
  *
  *  - OUTLINK EXTRACTION: every absolute http(s) anchor target on a page.
  *    One codegen'd regexp_extract_all + explode — no UDF, no shuffle;
  *    at 100 TB this is the map-side pass over raw pages that feeds the
  *    (vastly smaller) edge aggregation. Relative links, `mailto:`, and
  *    `javascript:` targets never match by construction of the pattern.
  *  - DOMAIN EDGES: distinct (src_domain, dst_domain) pairs, self-loops
  *    dropped. The shuffle carries two short host strings per link — page
  *    text/html never leaves the map side, and `distinct` collapses the
  *    per-page fan-out map-side (partial aggregate) before the exchange.
  *  - PAGERANK: fixed-iteration power method over the domain edge list —
  *    the classic damped formulation (Page et al. 1999, unnormalized:
  *    every node starts at 1, r' = (1-d) + d·Σ r(u)/out(u)) computed
  *    ENTIRELY in integer micro-units (rank ×1e6 as BIGINT, `div` for
  *    every division) so each iteration is bit-exact and summation-order
  *    free in any engine — the same policy as the PQ ADC distances.
  *    Dangling domains (no surviving out-edges) keep receiving rank but
  *    contribute none — the standard simplified variant; at domain
  *    granularity the dangling mass is small and the RANKING is what
  *    downstream consumes.
  *
  * 100 TB shape: each iteration is one shuffle-on-src join (edges ⋈ ranks
  * ⋈ outdegree) plus one aggregate-on-dst — both partial-aggregate
  * map-side; the iterate is (domain, long) pairs, millions of rows where
  * the corpus has billions of pages. The edge list and the iterate are
  * localCheckpoint'ed (the `Dedup.connectedComponents` posture), so the
  * page-scale extraction runs exactly one job however many rounds follow.
  * Skew: a mega-hub domain concentrates its IN-edges on one reducer key,
  * but the aggregated payload per key is one long — the hot key costs a
  * merge of partial sums, not a data pileup.
  */
object LinkGraph {

  /** Absolute http(s) anchor-target pattern, Java ∩ RE2 (inline `(?is)`
    * flags, no lookaround, no capture-group replacement): `<a ... href="
    * http(s)://...">` in any case, group 1 = the URL up to the closing
    * quote. Single-step (tag + attribute together) is safe here because
    * only `href` is wanted and only in its quoted absolute form — the
    * two-step tag-then-attribute dance `Boilerplate.extractPageMeta` does
    * is for attribute-order independence among MULTIPLE attributes. */
  private[graft] val absAnchorHrefRe: String =
    """(?is)<a\b[^>]*\bhref\s*=\s*"(https?://[^"]*)""""

  /** One row per absolute-href anchor: (idCol, urlCol, href). */
  def extractOutlinks(pages: DataFrame, idCol: String = "doc_id",
      urlCol: String = "url", htmlCol: String = "html"): DataFrame =
    pages.select(col(idCol), col(urlCol),
      explode(regexp_extract_all(coalesce(col(htmlCol), lit("")),
        lit(absAnchorHrefRe), lit(1))).as("href"))

  /** [[absAnchorHrefRe]] extended with the anchor's VISIBLE TEXT:
    * group 1 = href, group 2 = the text run. `([^<]*)</a>` keeps Java and
    * RE2 identical and means an anchor whose body contains nested markup
    * (`<a ...><b>x</b></a>`) does NOT match — a documented skip, the same
    * in both engines, acceptable for a signal that wants short labels. */
  private[graft] val absAnchorPairRe: String =
    """(?is)<a\b[^>]*\bhref\s*=\s*"(https?://[^"]*)"[^>]*>([^<]*)</a>"""

  /** ANCHOR-TEXT aggregation — the oldest off-page relevance/quality
    * signal (how the linking web DESCRIBES a target; search engines have
    * indexed anchor text since Brin & Page 1998 §2.2, and crawl curation
    * uses it to label/score pages the crawler has not fetched yet):
    * per NORMALIZED target URL ([[UrlOps.withNormalizedUrl]], so
    * case/port/tracking variants pool their signals), the total in-link
    * count, the distinct anchor-phrase count, and the dominant phrase
    * (highest count; ties break to the lexicographically smallest — an
    * argmax AGGREGATE, no per-URL window, the [[Dedup.exactBest]] shape).
    * Returns (dst_url, n_links, n_anchors, top_anchor, top_count).
    *
    * 100 TB shape: extraction is the map-side regex pass over raw pages;
    * the first shuffle carries (dst_url, anchor) pairs — html never
    * moves — with map-side combine collapsing the hot (popular-target,
    * common-phrase) keys; the second aggregates the far smaller
    * per-(url, phrase) table to one row per target. */
  def anchorSignals(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val html = coalesce(col(htmlCol), lit(""))
    val pairs = pages.select(
      explode(zip_with(
        regexp_extract_all(html, lit(absAnchorPairRe), lit(1)),
        regexp_extract_all(html, lit(absAnchorPairRe), lit(2)),
        (h, t) => struct(h.as("href"), t.as("anchor")))).as("z"))
      .select(col("z.href").as("url"), trim(col("z.anchor")).as("anchor"))
    UrlOps.withNormalizedUrl(pairs, "url")
      .select(col("norm_url").as("dst_url"), col("anchor"))
      .groupBy("dst_url", "anchor").agg(count(lit(1)).as("__c"))
      .groupBy("dst_url")
      .agg(sum("__c").as("n_links"),
        count(lit(1)).as("n_anchors"),
        min(struct((-col("__c")).as("nc"), col("anchor").as("a"))).as("__m"))
      .select(col("dst_url"), col("n_links"), col("n_anchors"),
        col("__m.a").as("top_anchor"), (-col("__m.nc")).as("top_count"))
  }

  /** Distinct domain→domain edges from an outlink table; self-loops and
    * unparseable (empty) hosts dropped. */
  def domainEdges(links: DataFrame, srcUrlCol: String = "url",
      dstUrlCol: String = "href"): DataFrame =
    links.select(UrlOps.domainOf(col(srcUrlCol)).as("src_domain"),
        UrlOps.domainOf(col(dstUrlCol)).as("dst_domain"))
      .filter(col("src_domain") =!= col("dst_domain") &&
        col("src_domain") =!= "" && col("dst_domain") =!= "")
      .distinct()

  /** Per-URL in-link authority — the signal a value-ordered frontier
    * ([[Frontier.fetchSchedulePrioritized]]) keys on for NEWLY DISCOVERED
    * URLs, which have no content yet: a candidate inherits the summed
    * [[pageRank]] of the DISTINCT domains linking to it (the
    * OPIC/Nutch-scoring-filter convention, at domain granularity so the
    * sum stays integer-exact in micro-units). `links` is an outlink table
    * ([[extractOutlinks]] output or its normalized projection);
    * `dstUrlCol` names the target-URL column (pass the normalized URL so
    * case/port/tracking variants of one resource pool their authority).
    * Returns (dstUrlCol, authority_e6).
    *
    * 100 TB shape: distinct (src_domain, url) collapses the per-page link
    * fan-out map-side before any join; the rank join keys on src_domain
    * against the domain-scale rank table (AQE broadcasts it); the final
    * aggregate is partial — a mega-cited URL costs a merge of partial
    * sums, not a pileup. */
  def urlAuthority(links: DataFrame, ranks: DataFrame,
      dstUrlCol: String = "href", srcUrlCol: String = "url"): DataFrame =
    links.select(UrlOps.domainOf(col(srcUrlCol)).as("src_domain"),
        col(dstUrlCol))
      .filter(col("src_domain") =!= "" && col(dstUrlCol) =!= "")
      .distinct()
      .join(ranks.select(col("domain").as("src_domain"),
        col("rank_e6")), "src_domain")
      .groupBy(dstUrlCol).agg(sum(col("rank_e6")).as("authority_e6"))

  /** Fixed-iteration integer-exact PageRank; returns (domain, rank_e6)
    * with rank in micro-units. `dampingPct` is the damping factor in
    * percent (85 = the canonical 0.85) so the update rule
    * `(100-dampingPct)·10⁴ + (dampingPct·Σ⌊r/out⌋) div 100` never leaves
    * BIGINT arithmetic.
    *
    * The edge list (with its out-degree fused on), the node set, and the
    * RESULT are `localCheckpoint`ed — the [[Dedup.connectedComponents]]
    * posture for the inputs: a lazy iterate over un-truncated inputs would
    * nest the upstream plan per round (measured: a 5-iteration lazy build
    * re-planned the html extraction 22×), while the leaves make the
    * extraction pipeline run exactly ONE job. The rounds themselves compose
    * lazily over those leaves (linear plan growth, bounded by the
    * iterations cap) and materialize once at the end — one job for the
    * whole power walk instead of one per round (r21). */
  def pageRank(edges: DataFrame, iterations: Int = 5,
      dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    val base = (100L - dampingPct) * 10000L
    val e = edges.select(col("src_domain").as("u"), col("dst_domain").as("v"))
      .localCheckpoint()
    // r21: the out-degree rides each edge row — joined ONCE here instead of
    // a per-round (edges ⋈ ranks) ⋈ outdegree join; at any scale outdeg is
    // a per-edge constant, so materializing it beside the edge costs 8
    // bytes/edge and deletes one exchange from every iteration.
    // r22 (guide §2.6): eod and nodes both derive from the pinned edge
    // leaf and are independent of each other — materialize them
    // concurrently instead of as two sequential checkpoint jobs
    val fEod = scala.concurrent.Future(
      e.join(e.groupBy("u").agg(count(lit(1)).as("outdeg")), "u")
        .localCheckpoint())(scala.concurrent.ExecutionContext.global)
    val nodes = e.select(col("u").as("domain"))
      .union(e.select(col("v").as("domain"))).distinct().localCheckpoint()
    val eod = scala.concurrent.Await.result(fEod,
      scala.concurrent.duration.Duration.Inf)
    Dedup.releaseLocalCheckpoint(e) // eod/nodes are leaves; e is dead weight
    // r21: the rounds COMPOSE LAZILY over the three leaves and materialize
    // once at the end — the per-round localCheckpoint (and its driver
    // action) existed to truncate a plan that still nested the page-scale
    // extraction (measured 22× re-planning before the leaves); with eod and
    // nodes as leaves the iterate's plan grows LINEARLY (two joins + one
    // aggregate per round), so `iterations` bounded at 100 keeps planning
    // trivial and the whole power walk runs as ONE job instead of one per
    // round.
    var ranks = nodes.select(col("domain"), lit(1000000L).as("rank_e6"))
    for (_ <- 1 to iterations) {
      // distinct names per role so every join reference resolves uniquely
      val prev = ranks.select(col("domain").as("pr_domain"),
        col("rank_e6").as("pr_rank"))
      val contrib = eod.join(prev, col("u") === col("pr_domain"))
        .select(col("v"), expr("pr_rank div outdeg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("s"))
        .select(col("v").as("c_domain"), col("s"))
      ranks = nodes.join(contrib, col("domain") === col("c_domain"), "left")
        .select(col("domain"),
          expr(s"CAST($base AS BIGINT) + (CAST($dampingPct AS BIGINT) * " +
            "coalesce(s, CAST(0 AS BIGINT))) div 100").as("rank_e6"))
    }
    // the result is its own leaf — the working tables' storage can go now
    val out = ranks.localCheckpoint()
    Seq(eod, nodes).foreach(Dedup.releaseLocalCheckpoint)
    out
  }
}
