package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Robots

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val agent = "graftbot"

  private def verdicts(robotsTxt: String, paths: String*): Seq[Boolean] = {
    val pages = paths.zipWithIndex
      .map { case (p, i) => (i.toLong, s"http://a.com$p") }.toDF("doc_id", "url")
    val robots = Seq(("a.com", robotsTxt)).toDF("domain", "robots_txt")
    Robots.robotsGate(pages, robots, agent)
      .orderBy("doc_id").collect().map(_.getAs[Boolean]("allowed")).toSeq
  }

  test("longest match wins; Allow wins length ties; no match allows") {
    val txt = "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /c/d\nAllow: /c/d"
    assert(verdicts(txt, "/a/x", "/a/b/x", "/z", "/c/d/e") ==
      Seq(false, true, true, true))
  }

  test("specific-agent group shadows every '*' group; groups combine") {
    val txt = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nDisallow: /\n\n" +
      "User-agent: GraftBot\nDisallow: /y" // case-insensitive token, combined
    assert(verdicts(txt, "/x/1", "/y/1", "/z") == Seq(false, false, true))
  }

  test("multi-agent group header applies to every named token") {
    val txt = "User-agent: otherbot\nUser-agent: graftbot\nDisallow: /p\n\n" +
      "User-agent: *\nDisallow: /q"
    // the shared group is specific for us; the '*' group is shadowed
    assert(verdicts(txt, "/p/1", "/q/1") == Seq(false, true))
  }

  test("wildcard * and end-anchor $; LIKE metachars stay literal") {
    val txt = "User-agent: *\nDisallow: /*?utm_\nDisallow: /exact$\nDisallow: /p%q_r"
    assert(verdicts(txt,
      "/a/1?utm_source=x", // * spans path, then literal ?utm_
      "/a/1?id=1",         // no utm → allowed
      "/exact",            // $ anchored exact hit
      "/exact/sub",        // $ prevents the prefix match
      "/p%q_r/z",          // % and _ are literal octets, not LIKE wildcards
      "/pXqYr"             // would match if _/% leaked through as wildcards
    ) == Seq(false, true, false, true, false, true))
  }

  test("rules above the first User-agent line never apply; empty values match nothing") {
    val txt = "Disallow: /\nUser-agent: graftbot\nDisallow:\nAllow: /ok\n\n" +
      "User-agent: *\nDisallow: /"
    // orphan Disallow ignored; empty Disallow ignored; '*' group shadowed
    assert(verdicts(txt, "/anything", "/ok/1") == Seq(true, true))
  }

  test("comments, unknown directives, CRLF, and directive case are tolerated") {
    val txt = "# site robots\r\nUSER-AGENT: *\r\nCrawl-delay: 10\r\n" +
      "DISALLOW: /a # trailing comment\r\nsitemap: http://a.com/s.xml\r\nallow: /a/b\r\n"
    assert(verdicts(txt, "/a/1", "/a/b/1", "/z") == Seq(false, true, true))
  }

  test("missing robots row, no applicable group, and query-string matching") {
    val pages = Seq(
      (0L, "http://a.com/p?x=1"), (1L, "http://noindex.net/p"),
      (2L, "http://b.com/p")).toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p?x"),
      ("b.com", "User-agent: someoneelse\nDisallow: /")).toDF("domain", "robots_txt")
    val r = Robots.robotsGate(pages, robots, agent)
      .orderBy("doc_id").collect().map(_.getAs[Boolean]("allowed")).toSeq
    // query string is part of the match target; absent domain and
    // non-matching-agent-only files both mean allowed
    assert(r == Seq(false, true, true))
  }

  test("path extraction: bare host maps to '/', fragment excluded") {
    val pages = Seq((0L, "http://a.com"), (1L, "http://a.com/x#frag"))
      .toDF("doc_id", "url")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /x$")).toDF("domain", "robots_txt")
    val out = Robots.robotsGate(pages, robots, agent).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("path")).toSeq == Seq("/", "/x"))
    // the fragment never reaches the matcher, so the $ anchor still fires
    assert(out.map(_.getAs[Boolean]("allowed")).toSeq == Seq(true, false))
  }

  private def delays(entries: (String, String)*): Map[String, Long] =
    Robots.crawlDelays(entries.toSeq.toDF("domain", "robots_txt"), agent)
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Long]("crawl_delay"))
      .toMap

  test("crawlDelays: group-scoped, '*' shadowed by specific, max of several") {
    val m = delays(
      // delay inside the specific group applies
      ("a.com", "User-agent: graftbot\nCrawl-delay: 10\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 3\nDisallow: /"),
      // specific group WITHOUT a delay shadows the '*' group's delay
      ("b.com", "User-agent: graftbot\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 3\nDisallow: /"),
      // no specific group → the '*' delay applies; two applicable '*'
      // groups → max
      ("c.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 5\nDisallow: /y"),
      // non-numeric, empty, and overflow-length values are ignored;
      // CRLF + case tolerated
      ("d.com", "USER-AGENT: *\r\nCRAWL-DELAY: soon\r\nCrawl-delay:\r\n" +
        "Crawl-delay: 99999999999999999999\r\nDisallow: /"),
      // an orphan delay above the first User-agent line never applies
      ("e.com", "Crawl-delay: 9\nUser-agent: *\nDisallow: /"))
    assert(m == Map("a.com" -> 10L, "c.com" -> 5L))
  }

  test("a dropped-kind line splits a header run identically in BOTH parses") {
    // Crawl-delay interleaved into a multi-agent header run: group ids
    // are assigned over ALL directive lines, so `b`'s User-agent starts a
    // FRESH group in the gate parse too — the delay binds to the '*'
    // group only, and graftbot's group carries only its own rule. The
    // regression was the 3-kind gate merging the run (both agents sharing
    // Disallow: /g) while the 4-kind delay parse split it.
    val txt = "User-agent: *\nCrawl-delay: 4\nUser-agent: graftbot\nDisallow: /g"
    // graftbot's own group exists → '*' group (and its delay) shadowed
    assert(delays(("a.com", txt)) == Map.empty)
    // the gate: graftbot group = {Disallow: /g} only; '*'s delay line is
    // ignored by the verdict; /g blocked, / allowed
    assert(verdicts(txt, "/g", "/") == Seq(false, true))
    // same body for a crawler with NO specific group: '*' group applies
    // with its delay, and its rule set is EMPTY (the Disallow belongs to
    // graftbot's group) → everything allowed, delay 4
    val other = Seq(("a.com", txt)).toDF("domain", "robots_txt")
    val pages = Seq((0L, "http://a.com/g")).toDF("doc_id", "url")
    assert(Robots.robotsGate(pages, other, "otherbot")
      .collect().map(_.getAs[Boolean]("allowed")).toSeq == Seq(true))
    assert(Robots.crawlDelays(other, "otherbot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a.com" -> 4L))
  }

  test("sitemapUrls: global extraction, case/CRLF tolerant, comments stripped") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /\nSitemap: http://a.com/s1.xml\n" +
        "SITEMAP: http://a.com/s2.xml # mirror\r\nSitemap:\nsitemapx: http://no.xml"),
      ("b.com", "User-agent: *\nAllow: /")).toDF("domain", "robots_txt")
    val r = Robots.sitemapUrls(robots).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // empty value and non-sitemap directives drop; group position is moot
    assert(r == Set(("a.com", "http://a.com/s1.xml"), ("a.com", "http://a.com/s2.xml")))
  }
}
