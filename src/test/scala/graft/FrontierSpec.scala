package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Frontier

class FrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages(n: Int, domains: Int) =
    (0 until n).map(i => (i.toLong, s"http://d${i % domains}.com/p/$i"))
      .toDF("doc_id", "url")

  private val noDelays =
    Seq.empty[(String, Long)].toDF("domain", "crawl_delay")

  /** The naive schedule the two-level rank must equal exactly: one
    * per-domain window over (salt, md5, doc_id). */
  private def naive(df: org.apache.spark.sql.DataFrame, salts: Int) = {
    val m = md5(col("doc_id").cast("string"))
    val salt = conv(substring(m, 1, 4), 16, 10).cast("int") % salts
    df.select(col("doc_id"),
        graft.operators.UrlOps.domainOf(col("url")).as("domain"),
        m.as("m"), salt.as("salt"))
      .withColumn("seq", row_number().over(
        Window.partitionBy("domain").orderBy(col("salt"), col("m"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("domain"), col("seq").cast("long"))
  }

  test("two-level salted rank equals the naive per-domain rank, skew included") {
    // one hot domain (¾ of rows) + a tail; several salt settings so every
    // offset path (empty salts, single-salt domains) exercises
    val df = (0 until 400).map { i =>
      val d = if (i % 4 != 3) 0 else 1 + i % 7
      (i.toLong, s"http://host$d.com/p/$i")
    }.toDF("doc_id", "url")
    for (salts <- Seq(1, 3, 16)) {
      val got = Frontier.fetchSchedule(df, noDelays, salts = salts)
        .select("doc_id", "domain", "seq")
      assert(got.except(naive(df, salts)).isEmpty &&
        naive(df, salts).except(got).isEmpty, s"salts=$salts")
    }
  }

  test("seq is a dense 0..n-1 permutation per domain; rerun-deterministic") {
    val df = pages(200, 5)
    val out = Frontier.fetchSchedule(df, noDelays)
    val perDomain = out.groupBy("domain")
      .agg(count(lit(1)).as("n"), min("seq").as("mn"), max("seq").as("mx"),
        count_distinct(col("seq")).as("nd"))
      .collect()
    assert(perDomain.length == 5)
    perDomain.foreach { r =>
      assert(r.getAs[Long]("mn") == 0L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("nd") == r.getAs[Long]("n"))
    }
    val again = Frontier.fetchSchedule(df.repartition(7), noDelays)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("fetch_at = seq × delay, defaulting where no explicit delay") {
    val df = pages(60, 3) // d0, d1, d2
    val out = Frontier.fetchSchedule(df,
        Seq(("d1.com", 5L)).toDF("domain", "crawl_delay"), defaultDelaySec = 2L)
      .collect()
    out.foreach { r =>
      val mult = if (r.getAs[String]("domain") == "d1.com") 5L else 2L
      assert(r.getAs[Long]("fetch_at") == r.getAs[Long]("seq") * mult)
    }
  }

  test("argument validation") {
    intercept[IllegalArgumentException](
      Frontier.fetchSchedule(pages(2, 1), noDelays, salts = 0))
    intercept[IllegalArgumentException](
      Frontier.fetchSchedule(pages(2, 1), noDelays, defaultDelaySec = -1L))
  }

  /** The collapsed window the prioritized schedule must equal: one
    * per-domain row_number over (priority DESC, salt, md5, doc_id). */
  private def naivePrioritized(df: org.apache.spark.sql.DataFrame, salts: Int) = {
    val m = md5(col("doc_id").cast("string"))
    val salt = conv(substring(m, 1, 4), 16, 10).cast("int") % salts
    df.select(col("doc_id"),
        graft.operators.UrlOps.domainOf(col("url")).as("domain"),
        col("priority"), m.as("m"), salt.as("salt"))
      .withColumn("seq", row_number().over(
        Window.partitionBy("domain")
          .orderBy(col("priority").desc, col("salt"), col("m"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("domain"), col("priority"), col("seq").cast("long"))
  }

  test("prioritized schedule equals the collapsed priority-desc window, ties + skew") {
    // hot domain with heavy priority TIES (the coarse-score contract) and
    // a tail of distinct priorities; several salt settings
    val df = (0 until 400).map { i =>
      val d = if (i % 4 != 3) 0 else 1 + i % 7
      (i.toLong, s"http://host$d.com/p/$i", (i % 3).toLong * 1000000L)
    }.toDF("doc_id", "url", "priority")
    for (salts <- Seq(1, 3, 16)) {
      val got = Frontier.fetchSchedulePrioritized(df, noDelays, "priority", salts = salts)
        .select("doc_id", "domain", "priority", "seq")
      val want = naivePrioritized(df, salts)
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"salts=$salts")
    }
  }

  test("prioritized schedule: higher priority drains strictly before lower") {
    val df = (0 until 90).map(i =>
      (i.toLong, s"http://d${i % 3}.com/p/$i", (i % 2).toLong)).toDF("doc_id", "url", "priority")
    val out = Frontier.fetchSchedulePrioritized(df, noDelays, "priority").collect()
    val byDomain = out.groupBy(_.getAs[String]("domain"))
    byDomain.values.foreach { rows =>
      val hiMax = rows.filter(_.getAs[Long]("priority") == 1L).map(_.getAs[Long]("seq")).max
      val loMin = rows.filter(_.getAs[Long]("priority") == 0L).map(_.getAs[Long]("seq")).min
      assert(hiMax < loMin)
    }
  }

  test("recrawlSchedule: status classification and the double/halve/clamp rule") {
    val old = Seq(("u1", "a"), ("u2", "b"), ("u3", "c"), ("u4", "d"), ("u5", "e"))
      .toDF("url", "text")
    val neu = Seq(("u1", "a"), ("u2", "B"), ("u4", "d"), ("u5", "E"), ("u6", "f"))
      .toDF("url", "text") // u3 removed, u2/u5 changed, u6 added
    val iv = Seq(("u1", 400L), ("u2", 1000L), ("u5", 500L)).toDF("url", "interval_sec")
    val out = Frontier.recrawlSchedule(old, neu, iv, nowSec = 1000000L,
        initialSec = 600L, minSec = 300L, maxSec = 700L)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("status"), r.getAs[Long]("interval_sec"),
          r.getAs[Long]("next_fetch_at")))).toMap
    assert(out.keySet == Set("u1", "u2", "u4", "u5", "u6")) // u3 gone
    assert(out("u1") == (("unchanged", 700L, 1000700L))) // 400*2=800 → max-clamp 700
    assert(out("u2") == (("changed", 350L, 1000350L)))   // prev 1000 pre-clamped to 700 → 350
    assert(out("u4") == (("unchanged", 700L, 1000700L))) // no history → 600*2=1200 → 700
    assert(out("u5") == (("changed", 300L, 1000300L)))   // 500/2=250 → min-clamp 300
    assert(out("u6") == (("added", 600L, 1000600L)))     // first observation
  }

  test("recrawlSchedule argument validation") {
    val d = Seq(("u", "t")).toDF("url", "text")
    val iv = Seq.empty[(String, Long)].toDF("url", "interval_sec")
    intercept[IllegalArgumentException](
      Frontier.recrawlSchedule(d, d, iv, 0L, minSec = 0L))
    intercept[IllegalArgumentException](
      Frontier.recrawlSchedule(d, d, iv, 0L, minSec = 500L, maxSec = 400L))
    intercept[IllegalArgumentException](
      Frontier.recrawlSchedule(d, d, iv, 0L, initialSec = 100L, minSec = 300L))
  }

  test("sitemapLocs: urlset vs sitemapindex kinds, entities, whitespace, malformed") {
    val fx = Seq(
      ("a.com", "<?xml version=\"1.0\"?><urlset xmlns=\"x\">" +
        "<url><loc> http://a.com/p?x=1&amp;y=2 </loc></url>" +
        "<url><loc>\nhttp://a.com/q\n</loc></url><url><loc></loc></url></urlset>"),
      ("b.com", "<sitemapindex><sitemap><loc>http://b.com/s1.xml</loc></sitemap></sitemapindex>"),
      ("c.com", "<html>not xml</html>"))
      .toDF("domain", "sitemap_xml")
    val r = Frontier.sitemapLocs(fx).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(r == Set(
      ("a.com", "url", "http://a.com/p?x=1&y=2"), // entity-decoded, trimmed
      ("a.com", "url", "http://a.com/q"),         // newline-wrapped loc
      ("b.com", "sitemap", "http://b.com/s1.xml"))) // nested ref; c.com quarantined
  }

  test("resolveSitemapTree: depth bound, missing child, orphan, and a cycle stay harmless") {
    val st = Seq(
      // root index → leaf + cycle back to itself + missing child
      ("http://a.com/root.xml", "a.com",
        "<sitemapindex><sitemap><loc>http://a.com/leaf.xml</loc></sitemap>" +
          "<sitemap><loc>http://a.com/root.xml</loc></sitemap>" +
          "<sitemap><loc>http://a.com/gone.xml</loc></sitemap></sitemapindex>"),
      ("http://a.com/leaf.xml", "a.com",
        "<urlset><url><loc>http://a.com/u1</loc></url></urlset>"),
      // deep chain: idx → idx2 → leaf2 (leaf2 resolves only at depth 3)
      ("http://b.com/root.xml", "b.com",
        "<sitemapindex><sitemap><loc>http://b.com/idx2.xml</loc></sitemap></sitemapindex>"),
      ("http://b.com/idx2.xml", "b.com",
        "<sitemapindex><sitemap><loc>http://b.com/leaf2.xml</loc></sitemap></sitemapindex>"),
      ("http://b.com/leaf2.xml", "b.com",
        "<urlset><url><loc>http://b.com/u2</loc></url></urlset>"),
      ("http://c.com/orphan.xml", "c.com",
        "<urlset><url><loc>http://c.com/u3</loc></url></urlset>")
    ).toDF("sitemap_url", "domain", "sitemap_xml")
    val roots = Seq("http://a.com/root.xml", "http://b.com/root.xml").toDF("sitemap_url")
    def locs(depth: Int) = Frontier.resolveSitemapTree(st, roots, maxDepth = depth)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the self-cycle on a.com/root.xml re-parses it each level but can
    // never add pages; gone.xml joins nothing; the orphan is unreachable
    assert(locs(3) == Set(("a.com", "http://a.com/u1"), ("b.com", "http://b.com/u2")))
    assert(locs(2) == Set(("a.com", "http://a.com/u1"))) // leaf2 beyond depth 2
  }
}
