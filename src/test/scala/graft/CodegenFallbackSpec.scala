package graft

import org.scalatest.funsuite.AnyFunSuite

/** The silent-codegen-fallback tripwire (BENCH_NOTES r13: 21 interpreted-mode
  * fallbacks per bench run went unnoticed until stderr was read by hand):
  * the counter's matching + wiring, then the repo's BIGGEST inlined
  * expression chains pinned at ZERO fallbacks — the 64 KB
  * generated-method-limit audit the r13 verdict ordered. The pinned set is
  * the chains most likely to blow the limit when composed: the NormalizeUrl
  * family that DID blow it in r13 (q129/q133/q135), Boilerplate
  * .extractMainText's HOF pipeline and redactPii's regex chain via their
  * heaviest capstone consumers (q109/q123/q154), the q102 quality-score
  * chain, and the composite q126. */
class CodegenFallbackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("matches the three Spark fallback signatures and nothing else") {
    val wsc = "org.apache.spark.sql.execution.WholeStageCodegenExec"
    val cg = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
    val proj = "org.apache.spark.sql.catalyst.expressions.UnsafeProjection"
    assert(CodegenFallbackCounter.matches(wsc,
      "Whole-stage codegen disabled for plan (id=3):\n *(3) Project"))
    // the interpreter fallback logs under the concrete subclass of
    // CodeGeneratorWithInterpretedFallback — no "codegen" in the name
    assert(CodegenFallbackCounter.matches(proj,
      "Expr codegen error and falling back to interpreter mode"))
    assert(CodegenFallbackCounter.matches(cg,
      "failed to compile: org.codehaus.commons.compiler.InternalCompilerException"))
    // the generic phrase is LOGGER-GATED: a non-codegen component saying
    // "failed to compile" must not inflate the bench count
    assert(!CodegenFallbackCounter.matches("graft.SomeOtherComponent",
      "failed to compile: scala template"))
    assert(!CodegenFallbackCounter.matches(null,
      "failed to compile: no logger attribution"))
    assert(!CodegenFallbackCounter.matches(cg, null))
    assert(!CodegenFallbackCounter.matches(cg, "Stage 3 contains a task of very large size"))
    assert(!CodegenFallbackCounter.matches(cg, "compile succeeded"))
  }

  test("installed appender counts a matching root-logger event end-to-end") {
    CodegenFallbackCounter.install()
    CodegenFallbackCounter.install() // idempotent: second install must not double-count
    CodegenFallbackCounter.reset()
    val log = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
    log.error("failed to compile: synthetic tripwire probe\n(full class body)")
    assert(CodegenFallbackCounter.count == 1L)
    assert(CodegenFallbackCounter.firstSample.exists(
      _.startsWith("failed to compile: synthetic tripwire probe")))
    log.info("failed to compile: below-threshold level must not count")
    log.error("an unrelated error must not count")
    // the generic phrase from a NON-codegen logger must not count either
    org.apache.logging.log4j.LogManager.getLogger("graft.NotTheCompiler")
      .error("failed to compile: foreign component, must not count")
    assert(CodegenFallbackCounter.count == 1L)
    CodegenFallbackCounter.reset()
    assert(CodegenFallbackCounter.count == 0L && CodegenFallbackCounter.firstSample.isEmpty)
  }

  test("the streaming fixtures' widest expression chains stay codegen'd (q201/q203)") {
    // r14 verdict task: the streaming queries run the same expression
    // machinery PLUS state encoders — pin the two widest column chains
    // (NormalizeUrl in the streamed projection, md5 content dedup) at
    // zero fallbacks. dropFixture forces the staged stream to actually
    // RUN under the armed counter instead of reading a cached sink.
    //
    // ASSUMES SEQUENTIAL SUITE EXECUTION (r15 ADVICE): the root log
    // level is mutated process-globally and the fixture drop/rebuild is
    // not guarded against a concurrent reader of the same fixture key;
    // the count assertion below is delta-based, but firstSample in the
    // failure message could still attribute a concurrent suite's
    // fallback. sbt runs suites in one forked JVM sequentially
    // (Test / fork := true, no parallel setting) — revisit if that
    // changes.
    CodegenFallbackCounter.install()
    val prevLevel = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel.toString
    spark.sparkContext.setLogLevel("WARN")
    try {
      Seq("stream_q201" -> "q201_streaming_url_dedup",
          "stream_q203" -> "q203_streaming_exact_dedup",
          // r16: the stream-stream join chain (two filtered projections
          // + symmetric hash join + unix_micros outputs)
          "stream_q212" -> "q212_streaming_click_attribution").foreach {
        case (fixture, q) =>
          SparkEntry.dropFixture(fixture, dir)
          val before = CodegenFallbackCounter.count
          SparkEntry.queries(q)(spark, dir).count()
          assert(CodegenFallbackCounter.count - before == 0L,
            s"$q triggered a codegen fallback: ${CodegenFallbackCounter.firstSample}")
      }
    } finally spark.sparkContext.setLogLevel(prevLevel)
  }

  test("the big inlined expression chains stay inside the 64 KB codegen limit") {
    CodegenFallbackCounter.install()
    // WARN is where WholeStageCodegenExec logs its fallback; the suite's
    // default level may sit above it. Restored in the finally — suites
    // share one SparkContext, so the level is not this test's to keep.
    val prevLevel = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel.toString
    spark.sparkContext.setLogLevel("WARN")
    CodegenFallbackCounter.reset()
    try runChainAudit()
    finally spark.sparkContext.setLogLevel(prevLevel)
  }

  private def runChainAudit(): Unit = {
    val chainHeavy = Seq(
      "q102_quality_score", // the widest scalar score chain
      "q109_crawl_frontdoor", // extractMainText + redactPii + score compose
      "q123_crawl_gate_compose", // full crawl gate: traps + caps + normalize
      "q126_domain_quality", // multi-family composite
      "q129_sitemap_discovery", // NormalizeUrl family
      "q133_priority_frontier", // normalize → domain → salted rank
      "q135_crawl_loop", // the family member that fell back in r13
      "q154_curation_scorecard") // boilerplate HOF pipeline at its heaviest
    val missing = chainHeavy.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"pinned queries renamed? $missing")
    chainHeavy.foreach { q =>
      // DELTA-based: the counter is process-global and suites share one
      // SparkContext, so a concurrent suite's genuine fallback while this
      // audit holds the level at WARN must flake someone else's pin, not
      // this one (r14 ADVICE)
      val before = CodegenFallbackCounter.count
      SparkEntry.queries(q)(spark, dir).count()
      assert(CodegenFallbackCounter.count - before == 0L,
        s"$q triggered a codegen fallback: ${CodegenFallbackCounter.firstSample}")
    }
    spark.catalog.clearCache()
  }
}
