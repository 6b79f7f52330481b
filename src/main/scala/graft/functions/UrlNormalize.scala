package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL normalization as ONE compact expression — semantically identical
  * to the [[graft.operators.UrlOps]] regex chain (strip fragment, drop
  * tracking params from the query string only, lowercase scheme and
  * host:port — userinfo and path verbatim — strip default ports), and
  * the oracles keep replaying that exact chain in SQL.
  *
  * Why custom: as a column-expression chain the normalization inlines a
  * ~15-regex tree into EVERY reference — the final CASE/concat references
  * its parts ~12x, and predicate pushdown plus join keys re-inline the
  * whole thing again. Composed over a derived-URL fixture, the fused
  * whole-stage-codegen method grew past the JVM's 64 KB limit and the
  * entire stage silently fell back to interpreted execution (r13
  * decomposition of the q129/q130/q133/q135 family; 21 CodeGenerator
  * failures per bench run). As a single expression the generated code is
  * one static call per reference — the stage stays inside codegen no
  * matter what Catalyst composes around it, and each row runs the regex
  * chain once instead of a dozen duplicated copies.
  *
  * The compiled [[Pattern]]s are JVM-static (executor-side singletons) —
  * the same semantics Spark's own RegExpReplace/RegExpExtract have, with
  * identical no-match conventions (empty string, null optional group →
  * empty) and Spark's `lower` (UTF8String.toLowerCase) for the
  * case-insensitive parts.
  */
case class NormalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_norm_url expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeUrl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormalizeUrl.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeUrl {
  import graft.operators.UrlOps.{trackingParams, schemeRe, userinfoRe, hostPortRe, restRe}

  private val frag = Pattern.compile("#.*$")
  private val queryStrip = Pattern.compile("\\?.*$")
  private val queryExtract = Pattern.compile("\\?(.*)$")
  private val trackMid = Pattern.compile("&" + trackingParams + "=[^&]*")
  private val trackLead = Pattern.compile("^" + trackingParams + "=[^&]*&")
  private val trackOnly = Pattern.compile("^" + trackingParams + "=[^&]*$")
  private val scheme = Pattern.compile(schemeRe)
  private val userinfo = Pattern.compile(userinfoRe)
  private val hostPort = Pattern.compile(hostPortRe)
  private val rest = Pattern.compile(restRe)
  private val port80 = Pattern.compile(":80$")
  private val port443 = Pattern.compile(":443$")

  /** Spark RegExpExtract convention: first match's group, "" when the
    * pattern misses or the optional group is absent. */
  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Spark `lower` semantics (UTF8String.toLowerCase), not Java's. */
  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** Shared by interpreted eval and generated code. */
  def compute(u: UTF8String): UTF8String = {
    val nf = frag.matcher(u.toString).replaceAll("")
    val base = queryStrip.matcher(nf).replaceAll("")
    val q = trackOnly.matcher(
      trackLead.matcher(
        trackMid.matcher(extract(queryExtract, nf)).replaceAll(""))
        .replaceAll(""))
      .replaceAll("")
    val u2 = if (q.isEmpty) base else base + "?" + q
    val sch = lower(extract(scheme, u2))
    if (sch.isEmpty) return UTF8String.fromString(u2)
    val ui = extract(userinfo, u2)
    val host0 = lower(extract(hostPort, u2))
    val host =
      if (sch == "http") port80.matcher(host0).replaceAll("")
      else if (sch == "https") port443.matcher(host0).replaceAll("")
      else host0
    UTF8String.fromString(sch + "://" + ui + host + extract(rest, u2))
  }
}
