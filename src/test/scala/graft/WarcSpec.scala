package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** WARC container source: spec-shaped round-trip (plain and per-record
  * gzip), the HTTP envelope split, and the corrupt-record quarantine +
  * resync contract — one bad record costs one record, never the rest of
  * the file. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDf = {
    import spark.implicits._
    Seq(
      (1L, "http://example.com/a", "plain ascii body"),
      (2L, "http://example.com/b", "café — naïve «déjà» €9 ™ non-ascii body"),
      (3L, "http://example.com/empty", ""),
      (4L, "http://example.com/d", "x" * 10000))
      .toDF("doc_id", "uri", "text")
      .selectExpr("doc_id", "uri", "encode(text, 'UTF-8') AS body",
        "concat('urn:graft:doc:', doc_id) AS rid")
  }

  private def roundTrip(gzip: Boolean): Unit = {
    val dir = Files.createTempDirectory(s"graft_warc_$gzip").toFile
    Warc.write(docsDf, dir.getAbsolutePath, uriCol = "uri", bodyCol = "body",
      recordIdCol = Some("rid"), gzip = gzip)
    val ext = if (gzip) ".warc.gz" else ".warc"
    // ignore Hadoop LocalFileSystem's .crc siblings (dotfiles — Spark's
    // file index skips them too)
    assert(dir.listFiles().filterNot(_.getName.startsWith("."))
      .forall(_.getName.endsWith(ext)))

    val back = Warc.readResponses(spark, dir.getAbsolutePath).collect()
      .map(r => r.getAs[String]("record_id") ->
        ((r.getAs[String]("target_uri"), r.getAs[Int]("http_status"),
          r.getAs[String]("http_content_type"),
          new String(r.getAs[Array[Byte]]("body"), UTF_8))))
      .toMap
    assert(back.keySet ==
      Set(1, 2, 3, 4).map(i => s"<urn:graft:doc:$i>"))
    assert(back("<urn:graft:doc:2>") ==
      (("http://example.com/b", 200, "text/html; charset=utf-8",
        "café — naïve «déjà» €9 ™ non-ascii body")))
    assert(back("<urn:graft:doc:3>")._4 == "")
    assert(back("<urn:graft:doc:4>")._4 == "x" * 10000)

    // generic read exposes the raw record metadata
    val raw = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(raw.length == 4)
    assert(raw.forall(_.getAs[String]("warc_type") == "response"))
    assert(raw.forall(_.getAs[String]("warc_date") == "2026-01-01T00:00:00Z"))
    assert(raw.forall(
      _.getAs[String]("content_type").startsWith("application/http")))
  }

  test("plain WARC round-trips: write → readResponses recovers uri/status/body") {
    roundTrip(gzip = false)
  }

  test("per-record-gzip WARC (the Common Crawl layout) round-trips") {
    roundTrip(gzip = true)
  }

  test("corrupt records quarantine with resync; clean neighbors survive") {
    val good1 = Warc.responseRecord("http://a/", "body one".getBytes(UTF_8),
      "urn:g:1", "2026-01-01T00:00:00Z", "text/html")
    val good2 = Warc.responseRecord("http://b/", "body two".getBytes(UTF_8),
      "urn:g:2", "2026-01-01T00:00:00Z", "text/html")
    // damage class 1: garbage between records (mid-record splice)
    val garbage = "this is not a warc record at all\r\n".getBytes(UTF_8)
    // damage class 2: record with a non-numeric Content-Length
    val badLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: NaN\r\n\r\npayload\r\n\r\n").getBytes(UTF_8)
    // damage class 3: truncated payload (Content-Length past EOF)
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 99999\r\n\r\nshort").getBytes(UTF_8)

    val dir = Files.createTempDirectory("graft_warc_corrupt").toFile
    val f = new java.io.FileOutputStream(s"$dir/mixed.warc")
    try { f.write(good1); f.write(garbage); f.write(badLen); f.write(good2)
      f.write(truncated)
    } finally f.close()

    val all = Warc.readWithCorrupt(spark, dir.getAbsolutePath).collect()
    val clean = all.filter(_.getAs[String](Warc.corruptCol) == null)
    val corrupt = all.filter(_.getAs[String](Warc.corruptCol) != null)
    // both good records survive the surrounding damage
    assert(clean.map(_.getAs[String]("record_id")).toSet ==
      Set("<urn:g:1>", "<urn:g:2>"))
    assert(corrupt.length == 3)
    val msgs = corrupt.map(_.getAs[String](Warc.corruptCol)).mkString("\n")
    assert(msgs.contains("expected WARC/ version line"))
    assert(msgs.contains("missing or non-numeric Content-Length"))
    assert(msgs.contains("truncated payload"))
    // quarantined rows carry null metadata, never a partial parse
    assert(corrupt.forall(_.getAs[String]("warc_type") == null))
    // read() drops them
    assert(Warc.read(spark, dir.getAbsolutePath).count() == 2)
  }

  test("non-response records are excluded from readResponses but visible to read") {
    val warcinfo = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:g:info>\r\nContent-Type: application/warc-fields\r\n" +
      "Content-Length: 12\r\n\r\nrobots: none\r\n\r\n").getBytes(UTF_8)
    val resp = Warc.responseRecord("http://a/", "hello".getBytes(UTF_8),
      "urn:g:r", "2026-01-01T00:00:00Z", "text/plain")
    val dir = Files.createTempDirectory("graft_warc_info").toFile
    val f = new java.io.FileOutputStream(s"$dir/x.warc")
    try { f.write(warcinfo); f.write(resp) } finally f.close()

    assert(Warc.read(spark, dir.getAbsolutePath).count() == 2)
    val resps = Warc.readResponses(spark, dir.getAbsolutePath).collect()
    assert(resps.length == 1)
    assert(resps.head.getAs[String]("record_id") == "<urn:g:r>")
    assert(new String(resps.head.getAs[Array[Byte]]("body"), UTF_8) == "hello")
  }

  test("q104 (WARC envelope) reproduces q96 (parquet columns) row-for-row") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val direct = SparkEntry.queries("q96_web_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSet
    val viaWarc = SparkEntry.queries("q104_warc_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(direct.nonEmpty)
    assert(viaWarc == direct)
  }

  test("decodeBody honors the DECLARED charset; utf-8/unknown fall through") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "café" in latin-1 (E9), curly quotes in windows-1252 (93/94) — byte
    // sequences a utf-8 read would shred into U+FFFD
    val latin1 = Array[Byte]('c', 'a', 'f', 0xE9.toByte)
    val quoted = Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte)
    val utf8 = "café".getBytes(UTF_8)
    val rows = Seq(
      (1L, latin1, "text/html; charset=ISO-8859-1"),
      (2L, latin1, "text/html; CHARSET=\"latin-1\""),   // quoted, any case
      (3L, quoted, "text/html; charset=windows-1252"),
      (4L, quoted, "text/html; charset=iso-8859-1"),    // WHATWG: latin-1 ≡ cp1252
      (5L, utf8, "text/html; charset=utf-8"),
      (6L, utf8, "text/html"),                           // undeclared → utf-8
      (7L, latin1, null),                                // null header → utf-8
      (8L, "ok".getBytes(UTF_8), "text/plain; charset=us-ascii"))
      .toDF("id", "body", "ct")
    val got = rows.select(col("id"),
        Warc.decodeBody(col("body"), col("ct")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "café")
    assert(got(2L) == "café")
    assert(got(3L) == "“hi”")
    assert(got(4L) == "“hi”")
    assert(got(5L) == "café")
    assert(got(6L) == "café")
    assert(got(7L) == "caf�") // honest utf-8 fallback: E9 is malformed
    assert(got(8L) == "ok")
  }

  test("declared-latin-1 WARC page survives the write → read → decode loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val body = Array[Byte]('d', 0xE9.toByte, 'j', 0xE0.toByte) // "déjà" latin-1
    val df = Seq(("http://l1.example/", body, "urn:g:l1"))
      .toDF("uri", "body", "rid")
    val dir = Files.createTempDirectory("graft_warc_l1").toFile
    Warc.write(df, dir.getAbsolutePath, uriCol = "uri", bodyCol = "body",
      recordIdCol = Some("rid"), httpContentType = "text/html; charset=ISO-8859-1")
    val r = Warc.readResponses(spark, dir.getAbsolutePath)
      .select(Warc.decodeBody(col("body"), col("http_content_type")).as("s"))
      .collect().head.getString(0)
    assert(r == "déjà")
  }

  test("header continuation lines fold; LF-only line endings tolerated") {
    val rec = ("WARC/1.0\nWARC-Type: response\n" +
      "WARC-Record-ID: <urn:g:fold>\n" +
      "WARC-Target-URI: http://long/\n uri-tail\n" +
      "Content-Type: application/http;\n msgtype=response\n" +
      "Content-Length: 24\n\n" +
      "HTTP/1.1 200 OK\r\n\r\nbody!").getBytes(UTF_8)
    val dir = Files.createTempDirectory("graft_warc_fold").toFile
    Files.write(java.nio.file.Path.of(s"$dir/f.warc"), rec)
    val rows = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("target_uri") == "http://long/ uri-tail")
    assert(rows.head.getAs[String]("content_type") ==
      "application/http; msgtype=response")
    val r = Warc.readResponses(spark, dir.getAbsolutePath).collect().head
    assert(r.getAs[Int]("http_status") == 200)
    assert(new String(r.getAs[Array[Byte]]("body"), UTF_8) == "body!")
  }
}
