package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Boilerplate

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(html: String) =
    Boilerplate.extractMainText(Seq((0L, html)).toDF("doc_id", "html"))
      .collect().head

  test("keeps the long low-link paragraph, drops nav/footer/short blocks") {
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">About us here</a></nav>" +
      "<h1>Title</h1>" +
      "<p>This is the long main article paragraph with plenty of text.</p>" +
      "<footer><a href=\"/t\">Terms of Service</a> <a href=\"/p\">Privacy Policy</a> (c) Corp</footer>" +
      "</body></html>"
    val r = run(html)
    assert(r.getString(1) == "This is the long main article paragraph with plenty of text.")
    assert(r.getLong(3) == 1L) // n_content_blocks
    assert(r.getLong(2) >= 3L) // nav, h1, p, footer all non-empty
  }

  test("inline tags inside a paragraph become word boundaries, not glue") {
    val html = "<p>The quick <b>brown</b> fox jumps over the lazy dog now</p>"
    assert(run(html).getString(1) == "The quick brown fox jumps over the lazy dog now")
  }

  test("a long but link-saturated block is boilerplate") {
    val html = "<p>Plain article text that is easily long enough to keep here.</p>" +
      "<div><a href=\"/a\">A very long related-links anchor text one</a> " +
      "<a href=\"/b\">another very long related anchor text two</a></div>"
    val r = run(html)
    assert(r.getLong(3) == 1L)
    assert(r.getString(1).startsWith("Plain article"))
  }

  test("link density is rational-compared: exactly at the threshold keeps") {
    // text chars 100, anchor chars 33 → 33*100 <= 100*33 holds (kept)
    val word = "x" * 33
    val pad = "y" * 66 // + one space = 100 visible chars
    val html = s"<p><a href=\"/\">$word</a> $pad</p>"
    val r = run(html)
    assert(r.getLong(3) == 1L, "block at exactly maxLinkPercent must be kept")
  }

  test("HTML entities decode in the visible text, &amp; last (no double decode)") {
    val html = "<p>Fish &amp; chips &lt;tasty&gt; &quot;very&quot; " +
      "it&#39;s literally &amp;lt; here with plenty of padding text</p>"
    val got = run(html).getString(1)
    assert(got == "Fish & chips <tasty> \"very\" it's literally &lt; here " +
      "with plenty of padding text")
  }

  test("nbsp entities collapse with neighboring spaces; anchors measure decoded chars") {
    // anchor text '&nbsp;x&nbsp;' decodes+trims to 1 visible char, so a
    // raw-length density computation would misclassify this long block
    val pad = "enough plain article text to clear the length threshold"
    val html = s"<p>a&nbsp; b $pad <a href=\"/\">&nbsp;x&nbsp;</a></p>"
    val r = run(html)
    assert(r.getString(1) == s"a b $pad x")
    assert(r.getLong(3) == 1L, "block must stay content with decoded link chars")
  }

  test("pages with no content blocks yield an empty main_text") {
    val r = run("<nav><a href=\"/\">Home</a></nav>")
    assert(r.getString(1) == "")
    assert(r.getLong(3) == 0L)
  }

  test("script/style bodies and comments are invisible — never content") {
    val js = "var config = {key: \"value\", tracking: true, retries: 3};"
    val css = ".article { margin: 0 auto; padding: 2em; color: #333; }"
    val html = s"<script type=\"text/javascript\">$js</script>" +
      s"<style>$css</style><!-- served by cache-03 -->" +
      "<p>The actual article text which is clearly long enough to keep.</p>"
    val r = run(html)
    assert(r.getString(1) == "The actual article text which is clearly long enough to keep.")
    assert(r.getLong(3) == 1L, "only the paragraph is content")
  }

  test("an UNCLOSED script on a truncated page never leaks into main_text") {
    val html = "<p>The article text itself which is long enough to survive.</p>" +
      "<script>var leaked = \"this javascript has no closing tag"
    val r = run(html)
    assert(r.getString(1) == "The article text itself which is long enough to survive.")
    assert(!r.getString(1).contains("leaked"))
    // same for an unterminated comment
    val r2 = run("<p>Enough plain article text to clear the length bar.</p><!-- cut off")
    assert(r2.getString(1) == "Enough plain article text to clear the length bar.")
  }

  test("multi-line script payloads strip across newlines") {
    val html = "<script>\nvar a = 1;\nvar b = 2;\nvar c = a + b;\n</script>" +
      "<p>Real text far away from any javascript and long enough too.</p>"
    assert(run(html).getString(1) ==
      "Real text far away from any javascript and long enough too.")
  }

  test("newline-indented markup collapses to single spaces in main_text") {
    val html = "<p>\n  First line\n  second line\n  third line of the article text\n</p>"
    val r = run(html)
    assert(r.getString(1) == "First line second line third line of the article text")
  }

  test("a NULL page reads as an empty page, never a null-propagating row") {
    val r = Boilerplate.extractMainText(
      Seq((0L, null: String)).toDF("doc_id", "html")).collect().head
    assert(r.getString(1) == "")
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
  }

  test("BlockStats expression == the pure-Catalyst HOF reference, bit for bit") {
    // the r22 codegen'd block scorer must reproduce the r21 HOF formulation
    // on every nasty shape: entity chains, unterminated script, anchors
    // with uncollapsed newlines (trim is space-only — the newline COUNTS),
    // supplementary code points (length = code points, not UTF-16 units),
    // threshold-edge densities, empty and null pages
    val pages = Seq(
      "<p>This is the long main article paragraph with plenty of text.</p>" +
        "<nav><a href=\"/\">Home</a></nav>",
      "<p>Fish &amp; chips &lt;tasty&gt; &quot;v&quot; it&#39;s &amp;lt; padded out</p>",
      "<div><a href=\"/a\">\n anchor text \n with newlines \n</a> plus body text here</div>",
      "<p>emoji 🎉🎊 counts as one code point each — padding padding padding</p>",
      "<script>var x = '<p>not text</p>';", // unterminated script
      "<p>" + ("z" * 30) + "</p><td><a href='/'>" + ("q" * 40) + "</a></td>",
      "<p>&nbsp;&nbsp;only nbsp entities&nbsp;&nbsp; padded to length here okay</p>",
      "", // empty page
      null.asInstanceOf[String] // failed fetch
    )
    val df = pages.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("doc_id", "html")
    for ((minC, maxP) <- Seq((25, 33), (5, 0), (1, 100))) {
      val ref = Boilerplate.extractMainTextReference(df, "html", minC, maxP)
        .collect().map(_.toSeq).toSeq
      for (codegen <- Seq(true, false)) {
        val key = "spark.sql.codegen.factoryMode"
        spark.conf.set(key, if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
        try {
          val got = Boilerplate.extractMainText(df, "html", minC, maxP)
            .collect().map(_.toSeq).toSeq
          assert(got == ref, s"codegen=$codegen min=$minC maxPct=$maxP")
        } finally spark.conf.set(key, "FALLBACK")
      }
    }
  }

  test("parameter validation rejects nonsense thresholds") {
    val df = Seq((0L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException] {
      Boilerplate.extractMainText(df, maxLinkPercent = 101)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.extractMainText(df, minTextChars = -1)
    }
  }

  private def meta(html: String) =
    Boilerplate.extractPageMeta(Seq((0L, html)).toDF("doc_id", "html"))
      .collect().head

  test("page meta: title/description decode entities, canonical extracted") {
    val r = meta("<html><head><title>\n  News &amp; Views </title>" +
      "<meta charset=\"utf-8\">" +
      "<meta content=\"Daily &quot;news&quot;\" name=\"description\">" +
      "<link href=\"http://ex.com/canon\" rel=\"canonical\">" +
      "</head><body></body></html>")
    assert(r.getAs[String]("page_title") == "News & Views")
    // attribute order reversed (content before name) still matches
    assert(r.getAs[String]("meta_description") == "Daily \"news\"")
    assert(r.getAs[String]("canonical_url") == "http://ex.com/canon")
    assert(!r.getAs[Boolean]("robots_noindex"))
  }

  test("page meta: missing fields are null, not empty strings") {
    val r = meta("<html><head></head><body><p>no head metadata</p></body></html>")
    assert(r.isNullAt(r.fieldIndex("page_title")))
    assert(r.isNullAt(r.fieldIndex("meta_description")))
    assert(r.isNullAt(r.fieldIndex("canonical_url")))
    assert(!r.getAs[Boolean]("robots_noindex"))
    // null page behaves like an empty page
    val n = Boilerplate.extractPageMeta(
      Seq((0L, null: String)).toDF("doc_id", "html")).collect().head
    assert(n.isNullAt(n.fieldIndex("page_title")) && !n.getAs[Boolean]("robots_noindex"))
  }

  test("page meta: robots noindex in any case/quote style; nofollow alone is not noindex") {
    assert(meta("<META NAME='robots' CONTENT=\"NOINDEX, nofollow\">")
      .getAs[Boolean]("robots_noindex"))
    assert(meta("<meta name=\"robots\" content=\"index, follow\">")
      .getAs[Boolean]("robots_noindex") == false)
    assert(meta("<meta name=\"robots\" content=\"nofollow\">")
      .getAs[Boolean]("robots_noindex") == false)
    // a DIFFERENT meta tag containing the word noindex must not trigger
    assert(meta("<meta name=\"description\" content=\"about noindex pages\">")
      .getAs[Boolean]("robots_noindex") == false)
  }
}
