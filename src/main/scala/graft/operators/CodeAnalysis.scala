package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Code-corpus curation: license detection and code-vs-prose scoring.
  *
  * A code-focused training pipeline (The Stack / StarCoder family) runs two
  * gates a web pipeline does not: a LICENSE gate (only permissively-licensed
  * files may enter the training set) and a MODALITY gate (source code and
  * natural-language prose get different downstream cleaning). Both are
  * per-document decisions from in-row evidence — at 100 TB they must be pure
  * projections (map-side, shuffle-free, codegen'd), which is how both
  * operators here are built: no explode, no aggregation, no join.
  *
  * Cross-engine exactness: every signal is an integer count (char counts via
  * `translate` deltas, line counts via split + filter) combined in integer
  * micro-units with `div`-style floor division — the q113/q126 policy — so
  * DuckDB replays the arithmetic bit-for-bit.
  */
object CodeAnalysis {

  /** SPDX short identifier extraction pattern — Java ∩ RE2 syntax (the PII
    * convention) so the SAME string drives the operator and the oracle. */
  val spdxRe = "SPDX-License-Identifier: ([A-Za-z0-9.+-]+)"

  /** License phrase fingerprints in PRIORITY order: the first phrase found
    * wins when no SPDX tag is present. Phrases are the canonical opening
    * sentences scanners like licensee/ScanCode key on; literal `contains`
    * matches (no regex) keep both engines trivially aligned. */
  val licensePhrases: Seq[(String, String)] = Seq(
    "MIT" -> "Permission is hereby granted, free of charge",
    "Apache-2.0" -> "Licensed under the Apache License, Version 2.0",
    "BSD-3-Clause" -> "Redistribution and use in source and binary forms",
    "GPL-3.0-only" -> "GNU General Public License")

  /** The permissive set (OSI-permissive short ids a code pipeline admits);
    * anything else — copyleft, unknown SPDX ids, no license — is not. */
  val permissiveIds: Set[String] =
    Set("MIT", "Apache-2.0", "BSD-3-Clause", "BSD-2-Clause", "ISC", "Unlicense")

  /** Per-document license verdict.
    *
    * Precedence: an explicit `SPDX-License-Identifier:` tag wins (it is the
    * machine-readable ground truth and overrides boilerplate text that may
    * be quoted, not granted); otherwise the first phrase fingerprint in
    * [[licensePhrases]] order; otherwise `none`.
    *
    * Output: doc_id, license, detection ('spdx' | 'phrase' | 'none'),
    * permissive. Pure projection — shuffle-free at any scale.
    */
  def detectLicense(docs: DataFrame): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val spdx = regexp_extract(txt, spdxRe, 1)
    val phrase = licensePhrases.foldRight(lit("none")) { case ((id, p), els) =>
      when(txt.contains(p), lit(id)).otherwise(els)
    }
    val lic = when(spdx =!= "", spdx).otherwise(phrase)
    docs.select(
      col("doc_id"),
      lic.as("license"),
      when(spdx =!= "", "spdx")
        .when(phrase =!= "none", "phrase")
        .otherwise("none").as("detection"),
      lic.isInCollection(permissiveIds).as("permissive"))
  }

  /** Characters whose density separates source code from prose. */
  val symbolChars = "{}();=<>[]"

  /** Keep/flag threshold on [[codeScore]]'s micro-unit score: a pure-prose
    * page scores well under 10⁵ (symbol density ~0, indent ~0), a real
    * source file scores several ×10⁵ (braces + semicolon line ends +
    * indentation each contribute up to 10⁶·weight). */
  val defaultCodeThresholdE6 = 600000L

  /** Jupyter-notebook cell extraction — .ipynb files are JSON and code
    * corpora (The Stack, StarCoder) mine their `code` cells as first-class
    * source documents: parse the nbformat skeleton (`cells[].cell_type` +
    * `cells[].source`), explode to one row per cell with its 0-based
    * index. nbformat permits `source` as EITHER the line-string array or
    * one plain multiline string (the "multiline string" union in the
    * spec), so the payload is parsed under both schemas: the array parse
    * drives the explode, and where permissive `from_json` nulled a
    * plain-string source the string parse's cell at the same position
    * supplies it. A cell whose source is genuinely absent yields NULL
    * `src` (distinguishable from an empty code cell's `""`). A payload
    * that is not valid JSON (or lacks `cells`) yields a null array and
    * contributes ZERO rows instead of failing the job, the
    * corrupt-record posture every source here shares. Pure codegen'd
    * projection + one generator — map-side at any scale, no shuffle. */
  def notebookCells(docs: DataFrame, jsonCol: String = "text"): DataFrame = {
    val arrSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "cells array<struct<cell_type: string, source: array<string>>>")
    val strSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "cells array<struct<cell_type: string, source: string>>")
    docs.select(col("doc_id"),
        from_json(col(jsonCol), arrSchema).as("__na"),
        from_json(col(jsonCol), strSchema).as("__ns"))
      .select(col("doc_id"), col("__ns"), posexplode(col("__na.cells")))
      .select(col("doc_id"), col("pos").cast("int").as("cell_idx"),
        col("col.cell_type").as("cell_type"),
        when(col("col.source").isNotNull, concat_ws("", col("col.source")))
          .otherwise(element_at(col("__ns.cells.source"), col("pos") + 1))
          .as("src"))
  }

  /** Code-vs-prose signals and verdict, entirely in-row.
    *
    * Signals (integer counts):
    *   - `n_symbols`: occurrences of [[symbolChars]] (a `translate`-delta —
    *     one codegen'd pass, no per-char explode);
    *   - `n_indented`: lines opening with two spaces or a tab;
    *   - `n_punct_end`: lines closing with `;`, `{` or `}`;
    *   - `n_lines`: 1 + newline count (split semantics, empty doc = 1 line).
    *
    * `score_e6 = 4·(10⁶·n_symbols div n_chars) + 2·(10⁶·n_indented div
    * n_lines) + 2·(10⁶·n_punct_end div n_lines)` — floor division on
    * non-negative integers, so `//` ≡ `div` and the oracle replays exactly.
    * `is_code = score_e6 ≥ thresholdE6`.
    */
  def codeScore(docs: DataFrame,
      thresholdE6: Long = defaultCodeThresholdE6): DataFrame = {
    val txt = coalesce(col("text"), lit(""))
    val lines = split(txt, java.util.regex.Pattern.quote("\n"), -1)
    docs
      .select(
        col("doc_id"),
        greatest(length(txt), lit(1)).cast("long").as("__nc"),
        (length(txt) - length(translate(txt, symbolChars, "")))
          .cast("long").as("n_symbols"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines,
          l => l.startsWith("  ") || l.startsWith("\t")))
          .cast("long").as("n_indented"),
        size(filter(lines,
          l => l.endsWith(";") || l.endsWith("{") || l.endsWith("}")))
          .cast("long").as("n_punct_end"))
      .withColumn("score_e6", expr(
        "4 * ((1000000 * n_symbols) div __nc) + " +
        "2 * ((1000000 * n_indented) div n_lines) + " +
        "2 * ((1000000 * n_punct_end) div n_lines)").cast("long"))
      .withColumn("is_code", col("score_e6") >= thresholdE6)
      .drop("__nc")
  }
}
