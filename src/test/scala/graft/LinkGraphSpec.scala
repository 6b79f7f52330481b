package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LinkGraph

class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("outlink extraction: absolute http(s) only, any case, null-safe") {
    val pages = Seq(
      (1L, "http://a.com/p",
        """<a href="http://b.com/x">one</a> <A HREF="HTTPS://C.com/y?q=1">two</A>
          |<a class="z" href="http://d.com/">attrs before</a>
          |<a href="/rel">rel</a> <a href="mailto:u@e.com">mail</a>
          |<a href="javascript:void(0)">js</a> <a href='http://squote.com/'>sq</a>""".stripMargin),
      (2L, "http://a.com/q", null)
    ).toDF("doc_id", "url", "html")
    val hrefs = LinkGraph.extractOutlinks(pages)
      .select("href").collect().map(_.getString(0)).sorted.toSeq
    // single-quoted href deliberately NOT matched — the pattern pins the
    // double-quoted form the fixtures emit (documented contract)
    assert(hrefs == Seq("HTTPS://C.com/y?q=1", "http://b.com/x", "http://d.com/"))
  }

  test("domain edges: dedup, self-loop drop, case-folded hosts, empty-host drop") {
    val links = Seq(
      ("http://a.com/1", "http://b.com/x"),
      ("http://a.com/2", "http://B.COM/y"),      // same domain pair → one edge
      ("http://a.com/3", "https://a.com/self"),  // self-loop (scheme ignored)
      ("http://a.com/4", "not a url"),           // unparseable host → dropped
      ("http://b.com/5", "http://a.com/z")
    ).toDF("url", "href")
    val edges = LinkGraph.domainEdges(links)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(edges == Seq(("a.com", "b.com"), ("b.com", "a.com")))
  }

  test("urlAuthority: distinct-domain sums, variant pooling, empty drops") {
    val links = Seq(
      ("http://a.com/1", "http://t.com/x"),  // a → x
      ("http://a.com/2", "http://t.com/x"),  // a again → still counted once
      ("http://b.com/1", "http://t.com/x"),  // b → x
      ("http://b.com/2", "http://t.com/y"),  // b → y
      ("not a url", "http://t.com/y")        // empty src host → dropped
    ).toDF("url", "href")
    val ranks = Seq(("a.com", 1000000L), ("b.com", 250000L))
      .toDF("domain", "rank_e6")
    val got = LinkGraph.urlAuthority(links, ranks)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map(
      "http://t.com/x" -> 1250000L, // a + b, a's duplicate link collapsed
      "http://t.com/y" -> 250000L)) // b only; the empty-src row contributed nothing
  }

  test("pageRank: hand-computed 2-iteration values, dangling-safe, deterministic") {
    // a→b, a→c, b→c, c→a; out: a=2, b=1, c=1.  r0 = 1e6 each.
    // iter1 sums: b←500000, c←500000+1000000, a←1000000
    //   a = 150000 + 85·1000000 div 100 = 1000000
    //   b = 150000 + 85·500000  div 100 = 575000
    //   c = 150000 + 85·1500000 div 100 = 1425000
    // iter2: a ← c = 1425000 → 150000 + 1211250 = 1361250
    //        b ← a/2 = 500000 → 575000
    //        c ← 500000 + 575000 = 1075000 → 150000 + 913750 = 1063750
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))
      .toDF("src_domain", "dst_domain")
    def run() = LinkGraph.pageRank(edges, iterations = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val got = run()
    assert(got == Seq(("a", 1361250L), ("b", 575000L), ("c", 1063750L)))
    assert(got == run(), "integer ranks must be run-deterministic")

    // dangling receiver: d has no out-edges; its rank accrues but its mass
    // is never redistributed (simplified variant) — and it must not NaN,
    // null, or drop out of the node set
    val withDangling = edges.union(Seq(("a", "d")).toDF("src_domain", "dst_domain"))
    val r = LinkGraph.pageRank(withDangling, iterations = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(r.keySet == Set("a", "b", "c", "d") && r.values.forall(_ >= 150000L))
  }
}
