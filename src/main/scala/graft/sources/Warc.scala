package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (ISO 28500 / WARC/1.x) source — the container format raw web
  * corpora actually arrive in (Common Crawl publishes WARC exclusively).
  * This is the one hop between "a crawl dump on disk" and the verified
  * crawl front-end (boilerplate → URL dedup → domain cap): read response
  * records, split the HTTP envelope, and the payload is the `html` column
  * the rest of the engine consumes.
  *
  * Wire format (public spec, ISO 28500): a file is a sequence of records,
  * each `WARC/1.x CRLF`, header lines (`Name: value`, LWS continuation
  * folding), a blank line, exactly `Content-Length` payload bytes, then
  * two CRLF. Response records carry `Content-Type: application/http;
  * msgtype=response` and the payload is a full HTTP response (status
  * line, headers, blank line, body).
  *
  * Corrupt records are the NORM at crawl scale (truncated shards,
  * mid-record splice, bit rot), so — like [[Jsonl]] — no read mode fails
  * the job: [[read]] drops malformed records, [[readWithCorrupt]]
  * quarantines them into `_corrupt_record` rows (bounded diagnostic
  * snippet, never the whole bad segment) and RESYNCS to the next
  * `CRLF CRLF WARC/` boundary so one bad record costs one record, not the
  * rest of the file.
  *
  * Scale notes: WARC is parsed one FILE per task (`binaryFile` is not
  * splittable, and Common Crawl's per-record-gzip .warc.gz cannot be
  * split blindly anyway — members must be walked in order). That is the
  * right granularity: crawl corpora ship as ~1 GB shards, so 100 TB is
  * ~100k files = 100k well-sized tasks. Per-task memory is one shard
  * (plus its decompressed image) — bounded by shard size, not corpus
  * size. Shard at write time (one gzip member per record, the Common
  * Crawl layout [[write]] reproduces) rather than relying on post-hoc
  * splitting. `spark.sql.sources.binaryFile.maxLength` caps a single
  * file at 2 GiB — also the practical shard ceiling.
  */
object Warc {

  val corruptCol = "_corrupt_record"

  /** One parsed WARC record. Clean rows have `_corrupt_record` null;
    * quarantined rows carry the diagnostic there and null metadata.
    * `warc_offset` is the record's byte offset in the (uncompressed)
    * stream — the spec's own replay coordinate. */
  final case class WarcRecord(
      warc_file: String,
      warc_offset: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Option[Long],
      payload: Array[Byte],
      _corrupt_record: String)

  /** A response record with the HTTP envelope split off: `body` is what a
    * fetcher saw (the html), `http_status`/`http_content_type` come from
    * the status line and headers. */
  final case class WarcResponse(
      warc_file: String,
      warc_offset: Long,
      record_id: String,
      target_uri: String,
      warc_date: String,
      http_status: Option[Int],
      http_content_type: String,
      body: Array[Byte])

  /** Clean records only (malformed dropped — the DROPMALFORMED analogue). */
  def read(spark: SparkSession, path: String): DataFrame =
    readDs(spark, path).filter(col(corruptCol).isNull).drop(corruptCol)

  /** All records: clean rows plus quarantine rows (null metadata, the
    * diagnostic in `_corrupt_record`) — the PERMISSIVE analogue for
    * auditable pipelines. */
  def readWithCorrupt(spark: SparkSession, path: String): DataFrame =
    readDs(spark, path).toDF()

  private def readDs(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => parseFile(file, bytes) }
  }

  /** Response records with the HTTP envelope split: the crawl-pipeline
    * entry point. Non-response records (warcinfo, request, metadata) and
    * quarantined rows are excluded; a response whose payload is not
    * parseable HTTP keeps its raw payload as `body` with null status (the
    * row is not silently lost — a status filter is the caller's call). */
  def readResponses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readDs(spark, path)
      .filter(r => r._corrupt_record == null && r.warc_type == "response" &&
        r.content_type != null && r.content_type.startsWith("application/http"))
      .map { r =>
        val (status, ctype, body) = splitHttp(r.payload)
        WarcResponse(r.warc_file, r.warc_offset, r.record_id, r.target_uri,
          r.warc_date, status, ctype, body)
      }.toDF()
  }

  // ------------------------------------------------------------- decoding

  /** Charset parameter of an HTTP `Content-Type` value (RFC 9110 §8.3:
    * `text/html; charset=ISO-8859-1`, optionally quoted), lowercased;
    * empty when undeclared. */
  private[graft] val charsetRe = "(?i)charset\\s*=\\s*\"?([A-Za-z0-9_.:+-]+)"

  /** windows-1252's 0x80–0x9F block, which is where it differs from
    * ISO-8859-1 (the rest is identical): C1 controls → the printable
    * characters every real "latin-1" web page actually means (RFC-correct
    * browsers treat declared latin-1 AS windows-1252 for this reason —
    * WHATWG encoding standard). Five code points (81 8D 8F 90 9D) are
    * unassigned and pass through. */
  private[graft] val cp1252From: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b\u008c" +
      "\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009a\u009b" +
      "\u009c\u009e\u009f"
  private[graft] val cp1252To: String =
    "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152" +
      "\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a" +
      "\u0153\u017e\u0178"

  /** Decode a response `body` honoring the HTTP-DECLARED charset, the
    * step a real pipeline runs BEFORE heuristic mojibake repair
    * ([[graft.operators.TextAnalysis.fixEncoding]] stays the fallback for
    * undeclared or lying headers — q96/q104's guard order). Pure codegen:
    * a `when` chain over literal-charset decodes, no UDF. Declared
    * latin-1/windows-1252/us-ascii all take the windows-1252 path —
    * byte-complete latin-1 decode (never fails) with the 0x80–0x9F block
    * translated per the table above — matching WHATWG browser behavior
    * (browsers treat all three labels as windows-1252; the five
    * unassigned code points are the only divergence from a strict latin-1
    * read and do not occur in honest latin-1 text). Everything else —
    * declared utf-8, absent, unknown — reads as utf-8 with malformed
    * sequences folded to U+FFFD (`make_valid_utf8`; Spark's strict
    * `decode` would FAIL THE JOB on the first lying header at crawl
    * scale), which is exactly the shape the heuristic stage expects. */
  def decodeBody(bodyCol: org.apache.spark.sql.Column,
      contentTypeCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val cs = lower(regexp_extract(coalesce(contentTypeCol, lit("")), charsetRe, 1))
    val latinish = Seq("iso-8859-1", "iso8859-1", "latin-1", "latin1",
      "windows-1252", "cp1252", "us-ascii", "ascii")
    when(cs.isin(latinish: _*),
      translate(decode(bodyCol, "ISO-8859-1"), cp1252From, cp1252To))
      .otherwise(call_function("make_valid_utf8", bodyCol.cast("string")))
  }

  // ---------------------------------------------------------------- parsing

  private val gzipMagic = Array[Byte](0x1f, (0x8b).toByte)

  /** Decompress-if-gzip, then parse. Multi-member gzip (the Common Crawl
    * per-record layout) decompresses as one stream — JDK GZIPInputStream
    * walks concatenated members. */
  private[sources] def parseFile(file: String, raw: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (raw.length >= 2 && raw(0) == gzipMagic(0) && raw(1) == gzipMagic(1))
        try new GZIPInputStream(new ByteArrayInputStream(raw)).readAllBytes()
        catch { case e: java.io.IOException =>
          return Seq(corrupt(file, 0L, s"gzip decompression failed: ${e.getMessage}", raw))
        }
      else raw
    parseBytes(file, data)
  }

  private def corrupt(file: String, offset: Long, msg: String, seg: Array[Byte]): WarcRecord = {
    // bounded snippet: a corrupt segment can be megabytes; quarantine the
    // diagnostic, not the payload
    val snippet = new String(seg, 0, math.min(seg.length, 256), US_ASCII)
      .map(c => if (c >= 32 && c < 127) c else '.')
    WarcRecord(file, offset, null, null, null, null, null, None, null,
      s"$msg; segment ${seg.length} bytes at offset $offset; head: $snippet")
  }

  /** Parse an uncompressed WARC stream. Tolerates LF-only line endings
    * (seen in hand-built files); resyncs after a malformed record by
    * scanning for the next blank-line + `WARC/` boundary. */
  private[sources] def parseBytes(file: String, data: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    val n = data.length

    def skipBlank(): Unit =
      while (pos < n && (data(pos) == '\r' || data(pos) == '\n')) pos += 1

    // next index at or after `from` where a record can start (a "WARC/"
    // preceded by start-of-stream or a line break) — the resync scan
    def nextBoundary(from: Int): Int = {
      var i = math.max(from, 0)
      while (i + 5 <= n) {
        if (data(i) == 'W' && data(i + 1) == 'A' && data(i + 2) == 'R' &&
            data(i + 3) == 'C' && data(i + 4) == '/' &&
            (i == 0 || data(i - 1) == '\n')) return i
        i += 1
      }
      n
    }

    // one header/version line: returns it sans line break, advances pos
    def readLine(): String = {
      val start = pos
      while (pos < n && data(pos) != '\n') pos += 1
      val end = if (pos > start && data(pos - 1) == '\r') pos - 1 else pos
      if (pos < n) pos += 1 // consume the \n
      new String(data, start, end - start, UTF_8)
    }

    while ({ skipBlank(); pos < n }) {
      val recStart = pos
      val version = readLine()
      if (!version.startsWith("WARC/")) {
        val resync = nextBoundary(pos)
        out += corrupt(file, recStart,
          s"expected WARC/ version line, got '${version.take(64)}'",
          java.util.Arrays.copyOfRange(data, recStart, resync))
        pos = resync
      } else {
        // headers until blank line; LWS continuation folds into the
        // previous value (ISO 28500 §4)
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var lastKey: String = null
        var bad: String = null
        var done = false
        while (!done && bad == null && pos < n) {
          val line = readLine()
          if (line.isEmpty) done = true
          else if ((line(0) == ' ' || line(0) == '\t') && lastKey != null)
            headers(lastKey) = headers(lastKey) + " " + line.trim
          else {
            val i = line.indexOf(':')
            if (i <= 0) bad = s"malformed header line '${line.take(64)}'"
            else {
              lastKey = line.substring(0, i).trim.toLowerCase
              headers(lastKey) = line.substring(i + 1).trim
            }
          }
        }
        val clen = headers.get("content-length").flatMap(_.toLongOption)
        if (bad == null && !done) bad = "EOF inside header block"
        if (bad == null && clen.isEmpty)
          bad = "missing or non-numeric Content-Length"
        if (bad == null && pos + clen.get > n)
          bad = s"truncated payload: need ${clen.get} bytes, ${n - pos} remain"
        if (bad != null) {
          val resync = nextBoundary(pos)
          out += corrupt(file, recStart, bad,
            java.util.Arrays.copyOfRange(data, recStart, resync))
          pos = resync
        } else {
          val len = clen.get.toInt
          val payload = java.util.Arrays.copyOfRange(data, pos, pos + len)
          pos += len
          out += WarcRecord(file, recStart,
            headers.getOrElse("warc-type", null),
            headers.getOrElse("warc-record-id", null),
            headers.getOrElse("warc-target-uri", null),
            headers.getOrElse("warc-date", null),
            headers.getOrElse("content-type", null),
            clen, payload, null)
        }
      }
    }
    out.result()
  }

  /** Split an `application/http` response payload: (status, Content-Type,
    * body). Null status when the head is not parseable HTTP — the payload
    * then passes through whole as the body. */
  private[sources] def splitHttp(payload: Array[Byte]): (Option[Int], String, Array[Byte]) = {
    val n = payload.length
    // find the first blank line (\r\n\r\n or \n\n)
    var i = 0
    var headEnd = -1
    var bodyStart = -1
    while (headEnd < 0 && i < n) {
      if (payload(i) == '\n') {
        if (i + 1 < n && payload(i + 1) == '\n') { headEnd = i; bodyStart = i + 2 }
        else if (i + 2 < n && payload(i + 1) == '\r' && payload(i + 2) == '\n') {
          headEnd = i; bodyStart = i + 3
        }
      }
      i += 1
    }
    if (headEnd < 0) return (None, null, payload)
    val head = new String(payload, 0, headEnd, US_ASCII)
    val lines = head.split("\r?\n")
    val status = lines.headOption
      .filter(_.toUpperCase.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1)).flatMap(_.toIntOption)
    if (status.isEmpty) return (None, null, payload)
    val ctype = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }.orNull
    (status, ctype, java.util.Arrays.copyOfRange(payload, bodyStart, n))
  }

  // ---------------------------------------------------------------- writing

  /** Write response records — the round-trip/fixture writer (real corpora
    * ARRIVE as WARC; producing it is for tests, goldens, and re-sharding).
    * One `part-NNNNN.warc[.gz]` per partition via the Hadoop FileSystem
    * API (any scheme the session can reach); `gzip=true` emits one gzip
    * MEMBER per record — the Common Crawl layout, so the compressed file
    * round-trips through the multi-member read path.
    *
    * `uriCol` (string) and `bodyCol` (binary) are required; `recordIdCol`
    * (string) pins deterministic record identity — when absent, ids
    * derive from md5(uri). `warcDate` is pinned, not wall-clock: a
    * deterministic envelope is what makes round-trip tests and derived
    * fixtures replayable. */
  def write(df: DataFrame, path: String, uriCol: String = "uri",
      bodyCol: String = "body", recordIdCol: Option[String] = None,
      gzip: Boolean = false, warcDate: String = "2026-01-01T00:00:00Z",
      httpContentType: String = "text/html; charset=utf-8"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val rid = recordIdCol.map(col)
      .getOrElse(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("urn:graft:md5:"),
        org.apache.spark.sql.functions.md5(col(uriCol))))
    val ds = df.select(col(uriCol).cast("string"), col(bodyCol), rid.cast("string"))
      .as[(String, Array[Byte], String)]
    val outDir = new org.apache.hadoop.fs.Path(path)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs0 = outDir.getFileSystem(conf.value)
    if (fs0.exists(outDir)) fs0.delete(outDir, true)
    fs0.mkdirs(outDir)
    val dirStr = outDir.toString
    val suffix = if (gzip) ".warc.gz" else ".warc"
    ds.foreachPartition { (it: Iterator[(String, Array[Byte], String)]) =>
      if (it.hasNext) {
        val pid = TaskContext.getPartitionId()
        val p = new org.apache.hadoop.fs.Path(dirStr, f"part-$pid%05d$suffix")
        val fsOut = p.getFileSystem(conf.value).create(p, true)
        try it.foreach { case (uri, body, id) =>
          val rec = responseRecord(uri, body, id, warcDate, httpContentType)
          if (gzip) {
            // per-member gzip stream over a SHARED file handle: close()
            // must not close the file, but the member's native Deflater
            // must still be released NOW — `finish()` alone leaves each
            // Deflater's native buffer to the finalizer, and a
            // multi-million-record partition balloons native memory
            // between GCs. DeflaterOutputStream exposes `def`, so an
            // anonymous subclass can finish the member then end() it.
            val gz = new GZIPOutputStream(fsOut) {
              override def close(): Unit = { finish(); `def`.end() }
            }
            gz.write(rec); gz.close()
          } else fsOut.write(rec)
        } finally fsOut.close()
      }
    }
  }

  /** One spec-shaped response record as bytes (version line, WARC
    * headers, CRLF, HTTP envelope + body, two CRLF). */
  private[graft] def responseRecord(uri: String, body: Array[Byte], recordId: String,
      warcDate: String, httpContentType: String): Array[Byte] = {
    val payload = if (body == null) Array.empty[Byte] else body
    val httpHead =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $httpContentType\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(US_ASCII)
    val warcHead =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <$recordId>\r\n" +
        s"WARC-Date: $warcDate\r\nWARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${httpHead.length + payload.length}\r\n\r\n").getBytes(UTF_8)
    val out = new java.io.ByteArrayOutputStream(
      warcHead.length + httpHead.length + payload.length + 4)
    out.write(warcHead); out.write(httpHead); out.write(payload)
    out.write("\r\n\r\n".getBytes(US_ASCII))
    out.toByteArray
  }
}
