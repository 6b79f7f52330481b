package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The whole jusText-style block-scoring loop of
  * [[graft.operators.Boilerplate.extractMainText]] as ONE codegen'd
  * expression: split the (already script/style/comment-stripped) page at
  * block-tag boundaries, compute each block's visible text and anchor-text
  * length, keep long low-link-density blocks, and return
  * (main_text, n_blocks, n_content_blocks, n_content_chars, n_text_chars)
  * in a single struct.
  *
  * Why custom: the Catalyst spelling runs the per-block work — one inline
  * tag strip, six sequential entity replaces, a whitespace collapse, a
  * trim, and an anchor-extract/trim/length fold — inside
  * `transform`/`filter`/`aggregate` higher-order functions, which never
  * participate in whole-stage codegen: every block re-entered the
  * interpreted evaluator and materialized intermediate strings per regex
  * step. This runs the identical pipeline (the SAME java.util.regex
  * patterns, the SAME sequential entity order, space-only trim, code-point
  * lengths, Int accumulation then widen — BoilerplateSpec pins parity
  * against the HOF formulation under CODEGEN_ONLY and NO_CODEGEN) in one
  * compiled method per page.
  *
  * Value contract, replicated bit for bit:
  *  - blocks = Pattern(blockTagRe).split(page, -1)  (Spark `split` keeps
  *    trailing empties — limit -1);
  *  - t = trimSpaces(collapse(\s+ → " ")(decodeEntities(anyTag → " ")));
  *  - l = Σ_anchors codePoints(trimSpaces(decodeEntities(group1)));
  *    anchor text is NOT whitespace-collapsed (exactly the HOF), and trim
  *    removes ASCII 0x20 ONLY (Spark's StringTrim);
  *  - lengths are CODE POINTS (Spark `length`), accumulated in Int exactly
  *    like the `aggregate(..., lit(0), _+_)` fold, widened to long at the
  *    end (same wrap-then-cast behavior on pathological inputs);
  *  - content iff codePoints(t) >= minTextChars AND l·100 ≤ len(t)·maxPct
  *    in LONG arithmetic; main_text = content blocks joined by one space
  *    in document order. */
case class BlockStats(child: Expression, minTextChars: Int, maxLinkPercent: Int)
  extends UnaryExpression {

  require(minTextChars >= 0, s"minTextChars must be >= 0, got $minTextChars")
  require(maxLinkPercent >= 0 && maxLinkPercent <= 100,
    s"maxLinkPercent must be in [0, 100], got $maxLinkPercent")

  override def dataType: DataType = BlockStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"block_stats expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    BlockStats.compute(input.asInstanceOf[UTF8String], minTextChars, maxLinkPercent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BlockStats.compute($a, $minTextChars, $maxLinkPercent);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlockStats {
  val schema: StructType = StructType(Seq(
    StructField("main_text", StringType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_content_blocks", LongType, nullable = false),
    StructField("n_content_chars", LongType, nullable = false),
    StructField("n_text_chars", LongType, nullable = false)))

  // the patterns are THE SAME strings the Catalyst formulation compiled
  // (same java.util.regex engine, default flags), built once per JVM
  private lazy val blockTag = Pattern.compile(graft.operators.Boilerplate.blockTagRe)
  private lazy val anyTag = Pattern.compile(graft.operators.Boilerplate.anyTagRe)
  private lazy val anchor = Pattern.compile(graft.operators.Boilerplate.anchorTextRe)
  private lazy val wsRun = Pattern.compile("""\s+""")
  private lazy val entities: Seq[(String, String)] = graft.operators.Boilerplate.entities

  /** The six-entity sequential decode — literal replaces in the exact
    * order of the Catalyst fold (`&amp;` last so `&amp;lt;` decodes to the
    * literal `&lt;`, never a phantom `<`). */
  private def decode(s: String): String =
    entities.foldLeft(s) { case (acc, (e, ch)) => acc.replace(e, ch) }

  /** Spark's StringTrim: leading/trailing ASCII space (0x20) ONLY. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }

  /** Spark's `length` on strings: code points, not UTF-16 units. */
  private def cp(s: String): Int = s.codePointCount(0, s.length)

  /** Shared by interpreted eval and generated code. */
  def compute(page: UTF8String, minTextChars: Int, maxLinkPercent: Int): InternalRow = {
    val blocks = blockTag.split(page.toString, -1)
    var nBlocks = 0
    var nContent = 0
    var contentChars = 0 // Int on purpose: the HOF fold accumulated Int
    var textChars = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      val t = trimSpaces(wsRun.matcher(
        decode(anyTag.matcher(b).replaceAll(" "))).replaceAll(" "))
      val tLen = cp(t)
      if (tLen > 0) { nBlocks += 1; textChars += tLen }
      if (tLen >= minTextChars) {
        // link chars are only CONSUMED by the density test, so computing
        // them only for length-qualified blocks changes no output value
        var l = 0
        val m = anchor.matcher(b)
        while (m.find()) l += cp(trimSpaces(decode(m.group(1))))
        if (l.toLong * 100L <= tLen.toLong * maxLinkPercent.toLong) {
          nContent += 1
          contentChars += tLen
          if (sb.length() > 0) sb.append(' ')
          sb.append(t)
        }
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), nBlocks.toLong,
      nContent.toLong, contentChars.toLong, textChars.toLong)
  }
}

object BoilerplateFunctions {
  /** Column API for [[BlockStats]]. */
  def block_stats(strippedPage: Column, minTextChars: Int, maxLinkPercent: Int): Column =
    GraftColumnBridge.column(BlockStats(
      GraftColumnBridge.expression(strippedPage), minTextChars, maxLinkPercent))
}
