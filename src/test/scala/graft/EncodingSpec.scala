package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Literal pins for encoding repair. The q101 oracle proves ROUND-TRIP
  * identity over the derived fixture (forward mojibake then repair equals
  * the clean construction) \u2014 but a bug symmetric in the fixture's forward
  * map and the operator's reverse map would cancel there, so these pins
  * check the reverse direction on mojibake built BYTE-BY-BYTE from ground
  * truth, with expected clean forms as \u escapes (visually-confusable
  * codepoints are exactly what this operator manipulates \u2014 nothing here is
  * typed as a raw non-ASCII literal), and the cp1252 image table itself is
  * pinned against the WHATWG reference values.
  */
class EncodingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The string a cp1252 viewer shows for these raw bytes \u2014 mojibake
    * input constructed from ground-truth byte values. */
  private def moj(bytes: Int*): String =
    bytes.map { b =>
      if (b < 0x80) b.toChar else TextAnalysis.cp1252Image(b - 0x80)
    }.mkString

  private def fix(texts: String*): Seq[String] =
    TextAnalysis.fixEncoding(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .orderBy("doc_id").select("fixed_text").collect()
      .map(r => Option(r.getString(0)).orNull).toSeq

  test("cp1252 image table matches the WHATWG windows-1252 reference") {
    // 0x80\u20130x9F specials (undefined bytes 0x81 0x8D 0x8F 0x90 0x9D pass
    // through as the matching C1 controls, as Java's own charset does)
    assert(TextAnalysis.cp1252Image.take(32) ==
      "\u20AC\u0081\u201A\u0192\u201E\u2026\u2020\u2021" +
      "\u02C6\u2030\u0160\u2039\u0152\u008D\u017D\u008F" +
      "\u0090\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
      "\u02DC\u2122\u0161\u203A\u0153\u009D\u017E\u0178")
    // 0xA0\u20130xFF is latin-1 identity
    assert(TextAnalysis.cp1252Image.drop(32) == (0xA0 to 0xFF).map(_.toChar).mkString)
  }

  test("cp1252 mojibake reverses: 2-byte sequences") {
    assert(fix(
      "caf" + moj(0xC3, 0xA9),                                   // \u00E9
      "na" + moj(0xC3, 0xAF) + "ve r" + moj(0xC3, 0xA9) + "sum" + moj(0xC3, 0xA9),
      moj(0xC2, 0xAB) + " quoted " + moj(0xC2, 0xBB)) ==         // \u00AB \u00BB
      Seq("caf\u00E9", "na\u00EFve r\u00E9sum\u00E9",
        "\u00AB quoted \u00BB"))
  }

  test("cp1252 mojibake reverses: 3-byte sequences (punctuation, euro, tm)") {
    assert(fix(
      "don" + moj(0xE2, 0x80, 0x99) + "t",   // U+2019 right single quote
      moj(0xE2, 0x82, 0xAC) + "99",          // U+20AC euro
      "Graft" + moj(0xE2, 0x84, 0xA2),       // U+2122 trade mark
      "dash" + moj(0xE2, 0x80, 0x94) + "here") == // U+2014 em dash
      Seq("don\u2019t", "\u20AC99", "Graft\u2122", "dash\u2014here"))
  }

  test("double-encoded UTF-8 needs exactly two rounds") {
    // forward\u00B2(\u00E9) = forward(C3 A9 seen as cp1252) = bytes of \u00C3 (C3 83)
    // then of \u00A9 (C2 A9)
    assert(fix("caf" + moj(0xC3, 0x83, 0xC2, 0xA9)) == Seq("caf\u00E9"))
  }

  test("genuine accented text is NOT converted (guard precision)") {
    val clean = Seq(
      "d\u00E9j\u00E0 vu",                       // d\u00E9j\u00E0 vu
      "\u00C0 la carte",                         // \u00C0 la carte
      "na\u00EFve \u2014 already clean \u20AC")  // standalone \u2014 and \u20AC
    assert(fix(clean: _*) == clean)
  }

  test("pure ASCII and empty pass through verbatim") {
    assert(fix("plain ascii text.", "") == Seq("plain ascii text.", ""))
  }

  test("control chars strip; tab, newline, CR survive") {
    assert(fix("ab\u0007c\u0000d", "keep\tthis\nand\rthat", "\u009Dedge\u007F")
      == Seq("abcd", "keep\tthis\nand\rthat", "edge"))
  }

  test("C1 trail images are reversal input, not control noise") {
    // \u00C3 + U+009D (cp1252 image of byte 0x9D) = bytes C3 9D = \u00DD \u2014 the strip
    // must run AFTER reversal or it would eat the trail char first
    assert(fix(moj(0xC3, 0x9D)) == Seq("\u00DD"))
  }

  test("mixed: clean ASCII around one mojibake cluster converts") {
    assert(fix("price " + moj(0xE2, 0x82, 0xAC) + "5 now") ==
      Seq("price \u20AC5 now"))
  }

  test("standalone lead char without a trail blocks conversion") {
    // \u00C3 followed by space is no cluster \u2014 the whole string stays as-is
    // (don't touch what you can't fully explain)
    assert(fix(moj(0xC3) + " alone") == Seq(moj(0xC3) + " alone"))
  }

  test("NULL passes through as NULL") {
    val out = TextAnalysis.fixEncoding(
      Seq((0L, null: String), (1L, "ok")).toDF("doc_id", "text"))
      .orderBy("doc_id").select("fixed_text").collect()
    assert(Option(out(0).getString(0)).isEmpty && out(1).getString(0) == "ok")
  }

  test("fixture forward map round-trips through the operator at unit scale") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val fixed = TextAnalysis.fixEncoding(
      SparkEntry.mojibakeDocuments(spark, "/root/testdata/sf0.001"))
      .select(col("doc_id"), col("fixed_text"))
    val expect = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, col("text"))
          .otherwise(concat(col("text"), lit(SparkEntry.mojibakePhrase)))
          .as("fixed_text"))
    assert(fixed.exceptAll(expect).isEmpty && expect.exceptAll(fixed).isEmpty)
  }
}
