package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CodeAnalysis

class CodeAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lic(texts: String*): Seq[(String, String, Boolean)] =
    CodeAnalysis.detectLicense(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .orderBy("doc_id")
      .select("license", "detection", "permissive").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq

  test("detectLicense: SPDX tag wins over a conflicting phrase") {
    assert(lic(
      "SPDX-License-Identifier: Apache-2.0\nGNU General Public License text") ==
      Seq(("Apache-2.0", "spdx", true)))
  }

  test("detectLicense: phrase priority order — MIT phrase beats GPL phrase") {
    assert(lic(
      "Permission is hereby granted, free of charge. " +
        "GNU General Public License.") == Seq(("MIT", "phrase", true)))
    // GPL alone: matched, not permissive
    assert(lic("This is under the GNU General Public License.") ==
      Seq(("GPL-3.0-only", "phrase", false)))
  }

  test("detectLicense: unknown SPDX id is reported but not permissive") {
    assert(lic("SPDX-License-Identifier: LGPL-2.1-or-later\ncode") ==
      Seq(("LGPL-2.1-or-later", "spdx", false)))
  }

  test("detectLicense: no evidence and null text both map to none") {
    assert(lic("plain prose about licensing nothing") ==
      Seq(("none", "none", false)))
    val out = CodeAnalysis.detectLicense(
      Seq((0L, null: String)).toDF("doc_id", "text")).collect()
    assert(out.map(r => (r.getString(1), r.getString(2), r.getBoolean(3))).toSeq ==
      Seq(("none", "none", false)))
  }

  test("codeScore: hand-computed counts and micro score on a snippet") {
    // 2 lines: "a = b;" (6 ch, ends ';') and "  x();" (6 ch, indented, ends ';')
    val text = "a = b;\n  x();"
    val row = CodeAnalysis.codeScore(Seq((0L, text)).toDF("doc_id", "text"))
      .collect().head
    // symbols: '=' ';' in line 1; '(' ')' ';' in line 2 => 5; chars = 13
    assert(row.getAs[Long]("n_symbols") == 5L)
    assert(row.getAs[Long]("n_lines") == 2L)
    assert(row.getAs[Long]("n_indented") == 1L)
    assert(row.getAs[Long]("n_punct_end") == 2L)
    // 4*(5000000/13=384615) + 2*(1000000/2=500000) + 2*(2000000/2=1000000)
    assert(row.getAs[Long]("score_e6") == 4L * 384615 + 2L * 500000 + 2L * 1000000)
    assert(row.getAs[Boolean]("is_code"))
  }

  test("codeScore: empty and null text score zero prose") {
    val rows = CodeAnalysis.codeScore(
      Seq((0L, ""), (1L, null: String)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_lines") == 1L) // split('') = [''] on both engines
      assert(r.getAs[Long]("score_e6") == 0L)
      assert(!r.getAs[Boolean]("is_code"))
    }
  }

  test("codeScore: the pinned q147 fixture snippet classifies as code") {
    val row = CodeAnalysis.codeScore(
      Seq((0L, SparkEntry.codeSnippet)).toDF("doc_id", "text")).collect().head
    assert(row.getAs[Boolean]("is_code"))
    // trailing \n yields a final empty line: 7 code lines + 1
    assert(row.getAs[Long]("n_lines") == 8L)
    assert(row.getAs[Long]("n_punct_end") == 7L)
  }

  test("notebookCells: parses nbformat JSON, joins line arrays, drops corrupt payloads") {
    val nb =
      """{"nbformat": 4, "cells": [
        |  {"cell_type": "markdown", "source": ["# title"]},
        |  {"cell_type": "code", "source": ["a = 1\n", "b = 2"]},
        |  {"cell_type": "code", "source": []}
        |]}""".stripMargin
    val fx = Seq(
      (1L, nb),
      (2L, "not json at all {{{"),                 // corrupt → zero rows
      (3L, """{"nbformat": 4}""")                  // no cells → zero rows
    ).toDF("doc_id", "text")
    val got = CodeAnalysis.notebookCells(fx).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(got.forall(_._1 == 1L))
    assert(got.toSet == Set(
      (1L, 0, "markdown", "# title"),
      (1L, 1, "code", "a = 1\nb = 2"),             // JSON \n → real newline, lines joined
      (1L, 2, "code", "")))                        // empty source array → empty string
  }

  test("notebookCells: plain-string source (nbformat multiline union) and absent source") {
    val nb =
      """{"cells": [
        |  {"cell_type": "code", "source": "x = 1\ny = 2"},
        |  {"cell_type": "code", "source": ["a\n", "b"]},
        |  {"cell_type": "raw"}
        |]}""".stripMargin
    val got = CodeAnalysis.notebookCells(Seq((7L, nb)).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(1), r.getString(2), Option(r.getString(3))))
    assert(got.toSet == Set(
      (0, "code", Some("x = 1\ny = 2")), // plain string carried through verbatim
      (1, "code", Some("a\nb")),         // array form still joined
      (2, "raw", None)))                 // absent source → null, not ""
  }
}
