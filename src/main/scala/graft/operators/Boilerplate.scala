package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate removal — the stage a web-corpus pipeline runs before
  * ANY other text operator: strip navigation, sidebars, footers, and other
  * chrome from raw HTML and keep the main article text.
  *
  * The heuristic is the published jusText/trafilatura family (Pomikálek
  * 2011; boilerpipe, Kohlschütter et al. WSDM 2010): segment the page into
  * blocks at block-level tag boundaries, score each block by TEXT LENGTH
  * and LINK DENSITY (fraction of the block's visible characters that sit
  * inside anchor tags), and keep long low-link-density blocks — navigation
  * and footers are short and link-saturated, article paragraphs are long
  * and link-sparse. This is the length/density core of those classifiers
  * without the language-model and context-smoothing refinements.
  *
  * 100 TB shape: a PURE PROJECTION — block split, per-block scoring, and
  * reassembly all happen inside one whole-stage-codegen'd row transform
  * (split + higher-order `transform`/`filter`/`aggregate` + `array_join`);
  * no UDF, no explode, no shuffle, nothing driver-side. The scan stays
  * columnar and every executor core streams pages independently, which is
  * exactly what you want for the first pass over a crawl.
  *
  * Determinism: integer-rational link-density comparison
  * (`link_chars * 100 <= text_chars * maxLinkPercent`) — no floating
  * point, so a SQL oracle reproduces the decision bit for bit.
  */
object Boilerplate {

  /** Block-level boundary tags (HTML5 flow-content set): a page splits
    * into scoreable text blocks at every open/close occurrence. `\b` stops
    * `p` from swallowing `<pre>` etc. */
  private[graft] val blockTagRe: String =
    """</?(?:p|div|li|ul|ol|nav|footer|header|aside|h[1-6]|table|tr|td|br|section|article)\b[^>]*>"""

  /** Any remaining (inline) tag — removed before scoring so `<b>`/`<i>`/`<a>`
    * markup never counts as text. */
  private[graft] val anyTagRe: String = "<[^>]*>"

  /** Invisible-content elements whose BODIES must go before any scoring:
    * script and style payloads are not text (leaving them in would let a
    * config blob or CSS rule pass the length filter and corrupt
    * main_text), and comments are invisible by definition. `(?s)` because
    * real payloads span lines; `.*?` non-greedy to the matching close tag;
    * no backreferences (RE2 has none), so script and style are separate
    * passes. */
  private[graft] val scriptRe: String = """(?si)<script\b[^>]*>.*?</script\s*>"""
  private[graft] val styleRe: String = """(?si)<style\b[^>]*>.*?</style\s*>"""
  private[graft] val commentRe: String = "(?s)<!--.*?-->"

  /** UNTERMINATED invisible elements — a truncated fetch can cut a page
    * mid-script, and the non-greedy pair patterns above never match an
    * unclosed element, so its body would leak into main_text as "visible
    * text". After the pair passes, any surviving open tag means
    * unterminated: everything from it to end-of-page is invisible. */
  private[graft] val openScriptRe: String = """(?si)<script\b[^>]*>.*$"""
  private[graft] val openStyleRe: String = """(?si)<style\b[^>]*>.*$"""
  private[graft] val openCommentRe: String = "(?s)<!--.*$"

  private def stripInvisible(h: Column): Column =
    Seq(scriptRe, styleRe, commentRe, openScriptRe, openStyleRe, openCommentRe)
      .foldLeft(h)((acc, re) => regexp_replace(acc, lit(re), lit(" ")))

  /** Anchor text capture: `[^<]*` (not `.*?`) so Java regex and RE2 agree
    * and nested-tag anchors degrade identically in both engines. */
  private[graft] val anchorTextRe: String = """<a\b[^>]*>([^<]*)</a>"""

  /** The HTML character entities a crawl actually carries (the XML five +
    * nbsp + the numeric apostrophe), in decode order: `&amp;` LAST, so
    * `&amp;lt;` decodes to the literal text `&lt;` and never double-decodes
    * into a phantom `<`. Patterns and replacements are regex-literal in
    * both Java regex and RE2, so the SAME pairs drive operator and oracle. */
  private[graft] val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    entities.foldLeft(c) { case (acc, (e, ch)) =>
      regexp_replace(acc, lit(e), lit(ch))
    }

  /** Visible text of one raw block: inline tags → space, entities decoded
    * (nbsp becomes a plain space BEFORE the collapse so it merges with its
    * neighbors), runs of WHITESPACE collapsed to one space (real HTML is
    * newline-indented — `\s+`, not `' +'`, or the indentation would count
    * toward minTextChars and leak into main_text), trimmed. */
  private def blockText(b: Column): Column =
    trim(regexp_replace(
      decodeEntities(regexp_replace(b, lit(anyTagRe), lit(" "))),
      lit("""\s+"""), lit(" ")))

  /** Total anchor-text characters of one raw block (entity-decoded and
    * trimmed per anchor, so link density is measured in the same units as
    * [[blockText]]'s visible characters). Empty-anchor pages sum to 0. */
  private def linkChars(b: Column): Column =
    aggregate(
      transform(regexp_extract_all(b, lit(anchorTextRe), lit(1)),
        a => length(trim(decodeEntities(a)))),
      lit(0), (acc, x) => acc + x)

  /** Extract main text from an HTML column.
    *
    * A block is CONTENT iff its visible text has ≥ `minTextChars`
    * characters AND `link_chars * 100 <= text_chars * maxLinkPercent`.
    * Output per page: `main_text` (content blocks joined by one space, in
    * document order), `n_blocks` (non-empty text blocks), `n_content_blocks`,
    * `n_content_chars`, `n_text_chars` — the last two give the boilerplate
    * fraction downstream quality filters cut on.
    *
    * Defaults (25 chars, 33%) are the jusText short/near-good boundary
    * ballpark; both are exposed because crawl profiles differ. */
  def extractMainText(docs: DataFrame, htmlCol: String = "html",
      minTextChars: Int = 25, maxLinkPercent: Int = 33): DataFrame = {
    require(minTextChars >= 0, s"minTextChars must be >= 0, got $minTextChars")
    require(maxLinkPercent >= 0 && maxLinkPercent <= 100,
      s"maxLinkPercent must be in [0, 100], got $maxLinkPercent")
    // r22: the per-block scoring loop (inline-tag strip, entity decode,
    // whitespace collapse, anchor extract/measure, density test, reassembly)
    // is ONE codegen'd expression — graft.functions.BlockStats — instead of
    // interpreted transform/filter/aggregate HOFs; BoilerplateSpec pins
    // bit-parity against the HOF formulation under CODEGEN_ONLY and
    // NO_CODEGEN. Script/style/comment bodies still go FIRST (invisible
    // content must not reach scoring; stripInvisible stays a codegen'd
    // built-in chain), and a NULL page (failed fetch rows in a crawl) reads
    // as an empty page: main_text "", every count 0 — never a null row.
    //
    // The struct is FENCED (graft.functions.OptimizerFence, the r21
    // posture): pipelines gate on main_text-derived counts (q96/q104 keep
    // docs with ≥ 30 words), and without the fence predicate pushdown
    // would re-inline the whole strip/split/score chain into a scan-level
    // Filter — and CollapseProject would duplicate the struct once per
    // field reference below. Values unchanged.
    val stats = graft.functions.BoilerplateFunctions.block_stats(
      stripInvisible(coalesce(col(htmlCol), lit(""))), minTextChars, maxLinkPercent)
    docs.withColumn("__s", graft.functions.OptimizerFence.fence(stats))
      .select(
        col("doc_id"),
        col("__s").getField("main_text").as("main_text"),
        col("__s").getField("n_blocks").as("n_blocks"),
        col("__s").getField("n_content_blocks").as("n_content_blocks"),
        col("__s").getField("n_content_chars").as("n_content_chars"),
        col("__s").getField("n_text_chars").as("n_text_chars"))
  }

  /** The pre-r22 pure-Catalyst block-scoring formulation, kept as the
    * parity REFERENCE for [[graft.functions.BlockStats]] (BoilerplateSpec
    * pins the two bit-equal on every fixture page; the r21 plans carried
    * this exact expression tree). Not called by any query path. */
  private[graft] def extractMainTextReference(docs: DataFrame, htmlCol: String = "html",
      minTextChars: Int = 25, maxLinkPercent: Int = 33): DataFrame = {
    val stats = transform(
      split(stripInvisible(coalesce(col(htmlCol), lit(""))), blockTagRe),
      b => struct(blockText(b).as("t"), linkChars(b).as("l")))
    val withStats = docs.withColumn("__blocks", stats)
    // LONG arithmetic: a pathological multi-megabyte block would overflow
    // `l * 100` in Int and sneak a link-saturated megablock past the filter
    val content = filter(col("__blocks"), s =>
      length(s.getField("t")) >= minTextChars &&
        s.getField("l").cast("long") * lit(100L) <=
          length(s.getField("t")).cast("long") * lit(maxLinkPercent.toLong))
    val nonempty = filter(col("__blocks"), s => length(s.getField("t")) > 0)
    val chars = (blocks: Column) =>
      aggregate(transform(blocks, s => length(s.getField("t"))), lit(0), (acc, x) => acc + x)
    withStats.select(
      col("doc_id"),
      array_join(transform(content, s => s.getField("t")), " ").as("main_text"),
      size(nonempty).cast("long").as("n_blocks"),
      size(content).cast("long").as("n_content_blocks"),
      chars(content).cast("long").as("n_content_chars"),
      chars(nonempty).cast("long").as("n_text_chars"))
  }

  // ------------------------------------------------------------- page meta

  /** `<title>` body. `[^<]*` (not `.*?`) so Java and RE2 agree on pages
    * where the title is unterminated. */
  private[graft] val titleRe: String = """(?si)<title[^>]*>([^<]*)</title>"""

  /** The whole `<meta name="NAME" ...>` tag, either quote style on the
    * name; `[^>]*` on both sides so attribute ORDER does not matter. */
  private[graft] def metaTagRe(name: String): String =
    s"""(?si)<meta\\b[^>]*name\\s*=\\s*["']$name["'][^>]*>"""

  private[graft] val linkCanonicalRe: String =
    """(?si)<link\b[^>]*rel\s*=\s*["']canonical["'][^>]*>"""

  /** Attribute VALUE inside an already-extracted tag. Double-quoted
    * attributes only (the dominant form; single-quoted values fall back to
    * null rather than mis-slicing) — documented contract. */
  private[graft] val contentAttrRe: String = """(?si)content\s*=\s*"([^"]*)""""
  private[graft] val hrefAttrRe: String = """(?si)href\s*=\s*"([^"]*)""""

  /** Page-level metadata a crawl pipeline filters and joins on BEFORE
    * extracting body text: `page_title` and `meta_description`
    * (entity-decoded, whitespace-collapsed, null when absent),
    * `canonical_url` (the page's own dedup hint — feeds
    * [[UrlOps.urlDedup]] in place of the fetch URL when present), and
    * `robots_noindex` (the compliance gate: pages that opt out of
    * indexing are dropped before any text enters the corpus).
    *
    * Same 100 TB shape as [[extractMainText]]: a pure codegen'd projection
    * — two-step regex (extract the tag, then the attribute) instead of one
    * mega-pattern so attribute order never matters, every pattern
    * Java∩RE2-portable (no backreferences). Missing fields are NULL, not
    * "": both engines' no-match empty string is normalized through
    * nullif/when so the null contract is engine-independent. */
  def extractPageMeta(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val html = coalesce(col(htmlCol), lit(""))
    val clean = (c: Column) =>
      trim(regexp_replace(decodeEntities(c), lit("""\s+"""), lit(" ")))
    val nonEmpty = (c: Column) => when(length(c) > 0, c)
    val descTag = regexp_extract(html, metaTagRe("description"), 0)
    val robotsTag = regexp_extract(html, metaTagRe("robots"), 0)
    val canonTag = regexp_extract(html, linkCanonicalRe, 0)
    docs.select(
      col("doc_id"),
      nonEmpty(clean(regexp_extract(html, titleRe, 1))).as("page_title"),
      nonEmpty(clean(regexp_extract(descTag, contentAttrRe, 1))).as("meta_description"),
      nonEmpty(regexp_extract(canonTag, hrefAttrRe, 1)).as("canonical_url"),
      regexp_extract(robotsTag, contentAttrRe, 1).rlike("(?i)noindex")
        .as("robots_noindex"))
  }
}
