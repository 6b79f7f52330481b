package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class EvP(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, props: String)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  private val batch = Seq(
    Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 1, "click", 2.0),
    Ev(3, t(6), 2, "view", 3.0), Ev(4, t(7), 1, "click", 4.0),
    Ev(5, t(40), 1, "view", 5.0), Ev(6, t(41), 2, "view", 6.0))

  test("tumbling agg on a stream matches the same expression run in batch") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batch: _*)
    val q = StreamingWindows.tumblingAgg(stream.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val batched = StreamingWindows.tumblingAgg(batch.toDF(), "5 minutes", "10 minutes")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(streamed == batched)
    assert(streamed((t(0), "click")) == ((2L, 3.0)))    // events 1,2 in [10:00,10:05)
    assert(streamed((t(5), "click")) == ((1L, 4.0)))    // event 4 in [10:05,10:10)
  }

  test("session windows close after the gap and carry exact aggregates") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(batch: _*)
    val q = StreamingWindows.sessionAgg(stream.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(2), r.getTimestamp(0)) -> ((r.getLong(3), r.getDouble(4)))).toMap
    // user 1: events at 10:00,10:01,10:07 → one session (n=3, sum=7); 10:40 → second session
    assert(rows((1L, t(0))) == ((3L, 7.0)))
    assert(rows((1L, t(40))) == ((1L, 5.0)))
    // user 2: 10:06 and 10:41 are separate sessions (gap > 30 min)
    assert(rows((2L, t(6))) == ((1L, 3.0)))
    assert(rows((2L, t(41))) == ((1L, 6.0)))
  }

  test("streaming exact dedup keeps one row per content hash within the watermark") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(
      (1L, t(0), "the quick brown fox"),
      (2L, t(1), "the quick brown fox"),   // duplicate content inside horizon
      (3L, t(2), "a different document"))
    val q = StreamingWindows.streamingExactDedup(
      stream.toDF().toDF("doc_id", "ts", "text"), "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable()
    // later micro-batch, same content, still within the watermark horizon
    stream.addData((4L, t(3), "the quick brown fox"))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("dedup").collect()
      .map(r => r.getString(3) -> r.getLong(0)).toMap
    // one survivor per distinct hash; duplicates 2 and 4 dropped
    assert(spark.table("dedup").count() == 2)
    assert(rows.values.toSet.subsetOf(Set(1L, 3L)))
  }

  test("streaming url dedup folds raw variants onto one canonical url") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(
      (1L, t(0), "HTTP://A.com:80/p?utm_x=1"),  // canonical: http://a.com/p
      (2L, t(1), "http://a.com/p#frag"),        // same canonical → dropped
      (3L, t(2), "http://a.com/q"))
    val q = StreamingWindows.streamingUrlDedup(
      stream.toDF().toDF("doc_id", "ts", "url"), "10 minutes")
      .writeStream.format("memory").queryName("url_dedup").outputMode("append").start()
    q.processAllAvailable()
    // later micro-batch: yet another variant of the same page
    stream.addData((4L, t(3), "http://A.COM/p"))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("url_dedup").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).toSet.subsetOf(Set(1L, 3L)))
    // the batch normalizer's output rides along for downstream joins
    assert(rows.map(_.getString(3)).toSet == Set("http://a.com/p", "http://a.com/q"))
  }

  test("streaming url dedup passes NULL-url rows through instead of collapsing them") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(
      (1L, t(0), null: String),             // failed fetch — must pass
      (2L, t(1), null: String),             // another — must ALSO pass
      (3L, t(2), "http://a.com/p"),
      (4L, t(3), "http://a.com/p#x"))       // variant → dropped
    val q = StreamingWindows.streamingUrlDedup(
      stream.toDF().toDF("doc_id", "ts", "url"), "10 minutes")
      .writeStream.format("memory").queryName("url_dedup_null").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("url_dedup_null").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), "both null-url rows must survive")
  }

  test("streaming incremental dedup drops corpus hits and in-stream dups, keeps novel docs") {
    val corpus = Seq((100L, "already ingested document"), (101L, "another known text"))
      .toDF("doc_id", "text")
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(
      (1L, t(0), "a genuinely new document"),
      (2L, t(1), "already ingested document"), // corpus hit → dropped
      (3L, t(2), "a genuinely new document"))  // in-stream dup of 1 → dropped
    val q = StreamingWindows.streamingIncrementalDedup(
      stream.toDF().toDF("doc_id", "ts", "text"), corpus, "10 minutes")
      .writeStream.format("memory").queryName("inc_dedup").outputMode("append").start()
    q.processAllAvailable()
    // later micro-batch: another corpus hit and one more novel doc
    stream.addData((4L, t(3), "another known text"), (5L, t(4), "fresh content entirely"))
    q.processAllAvailable(); q.stop()

    val ids = spark.table("inc_dedup").collect().map(_.getLong(1)).toSet
    assert(ids == Set(1L, 5L))
  }

  test("streaming minhash candidates match the batch LSH operator on the same corpus") {
    // four docs: 1≈2 (near-dup, one word changed), 4 = exact copy of 1,
    // 3 unrelated — same banding params as the batch call below
    val docs = Seq(
      (1L, t(0), "the quick brown fox jumps over the lazy dog tonight"),
      (2L, t(1), "the quick brown fox jumps over the lazy cat tonight"),
      (3L, t(2), "completely different text with no overlap whatsoever here now"),
      (4L, t(3), "the quick brown fox jumps over the lazy dog tonight"))
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(docs.take(2): _*)
    val q = StreamingWindows.streamingMinHashCandidates(
      stream.toDF().toDF("doc_id", "ts", "text"), "10 minutes", n = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("mh_cands").outputMode("append").start()
    q.processAllAvailable()
    // later micro-batch inside the horizon: cross-batch pairs must appear
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("mh_cands").as[CandidatePair].collect()
      .map(p => (p.doc1, p.doc2)).toSet
    val batched = graft.operators.Dedup.minHashLshCandidates(
      docs.toDF("doc_id", "ts", "text"), n = 3, numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batched)
    assert(streamed.contains((1L, 4L))) // the exact copy collides in every band
    assert(!streamed.exists { case (a, b) => a == 3L || b == 3L }) // unrelated doc pairs nothing
  }

  test("streaming minhash bucket state evicts once the watermark passes") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData((1L, t(0), "the quick brown fox jumps over the lazy dog tonight"))
    val q = StreamingWindows.streamingMinHashCandidates(
      stream.toDF().toDF("doc_id", "ts", "text"), "5 minutes", n = 3, numHashes = 16, bands = 4)
      .writeStream.format("memory").queryName("mh_evict").outputMode("append").start()
    q.processAllAvailable()
    // push the watermark far past doc 1's bucket timeout...
    stream.addData((9L, t(50), "completely different text with no overlap whatsoever here now"))
    q.processAllAvailable()
    // ...then an exact copy of doc 1: its former bucket state is gone → no pair
    stream.addData((10L, t(52), "the quick brown fox jumps over the lazy dog tonight"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("mh_evict").count() == 0)
  }

  test("stateless doc operators (quality rules) apply unchanged to a stream") {
    // qualityRules is a pure projection, so the SAME operator runs at
    // ingest with append semantics and no state store — batch parity by
    // construction, asserted anyway
    val docs = Seq(
      (1L, "a b a b a b", "en", "s"),
      (2L, ('a' to 'u').map(c => s"word$c").mkString(" "), "en", "s"))
    val stream = MemoryStream[(Long, String, String, String)](spark)
    stream.addData(docs: _*)
    val q = graft.operators.TextAnalysis.qualityRules(
      stream.toDF().toDF("doc_id", "text", "lang", "source"))
      .writeStream.format("memory").queryName("stream_quality").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("stream_quality").collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val batched = graft.operators.TextAnalysis.qualityRules(
      docs.toDF("doc_id", "text", "lang", "source")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(streamed == batched && streamed == Map(1L -> false, 2L -> true))
  }

  test("streaming funnel buffers out-of-order events; eviction result matches batch funnel") {
    val stream = MemoryStream[FunnelEvent](spark)
    // user 1 arrives OUT OF ORDER: click+purchase first, the view (earliest
    // event time) only in the second micro-batch — still inside the horizon
    stream.addData(FunnelEvent(2, 1, "click", t(5)), FunnelEvent(3, 1, "purchase", t(7)))
    val q = StreamingFunnel(stream.toDS(), Seq("view", "click", "purchase"),
      idleTimeout = "10 minutes")
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    q.processAllAvailable()
    stream.addData(FunnelEvent(1, 1, "view", t(0)))
    q.processAllAvailable()
    assert(spark.table("sfunnel").count() == 0, "nothing emits before the horizon passes")
    // far-future events push the watermark past user 1's idle timeout (the
    // timeout fires in the batch AFTER the watermark advances)
    stream.addData(FunnelEvent(9, 2, "view", t(50)))
    q.processAllAvailable()
    stream.addData(FunnelEvent(10, 2, "view", t(51)))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("sfunnel").as[FunnelReach].collect()
    assert(rows.toSeq == Seq(FunnelReach(1,
      Seq(Some(t(0).getTime * 1000), Some(t(5).getTime * 1000),
        Some(t(7).getTime * 1000)), 3)))
    // exact parity with the batch operator on the same (reordered) events
    val batchRow = operators.Funnel.funnel(
      Seq((2L, 1L, "click", t(5).getTime * 1000), (3L, 1L, "purchase", t(7).getTime * 1000),
        (1L, 1L, "view", t(0).getTime * 1000)).toDF("event_id", "user_id", "event_type", "us"),
      Seq("view", "click", "purchase"), timeCol = "us").collect().head
    assert(Seq(batchRow.getLong(1), batchRow.getLong(2), batchRow.getLong(3)) ==
      rows.head.reach_us.map(_.get) && batchRow.getInt(4) == rows.head.funnel_stage)
  }

  test("threshold alerts fire once per user at the crossing event") {
    val stream = MemoryStream[UserEvent](spark)
    stream.addData(
      UserEvent(1, t(0), 4.0), UserEvent(1, t(1), 5.0),  // crosses 8 at 2nd event
      UserEvent(2, t(2), 10.0),                           // crosses at 1st
      UserEvent(3, t(3), 1.0))                            // never crosses
    val q = ThresholdAlerts(stream.toDS(), threshold = 8.0)
      .writeStream.format("memory").queryName("alerts").outputMode("append").start()
    q.processAllAvailable()
    // second micro-batch: user 1 already fired — no duplicate alert
    stream.addData(UserEvent(1, t(5), 100.0), UserEvent(3, t(6), 9.0))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("alerts").as[ThresholdCross].collect().sortBy(_.user_id)
    assert(rows.map(_.user_id).toSeq == Seq(1L, 2L, 3L))
    assert(rows.find(_.user_id == 1L).get == ThresholdCross(1L, 9.0, 2L))
    assert(rows.find(_.user_id == 3L).get == ThresholdCross(3L, 10.0, 2L))
  }

  test("misra-gries aggregates across micro-batches through the state store") {
    import org.apache.spark.sql.functions._
    // the sketch buffer must survive serialize → state store → deserialize →
    // merge between micro-batches; capacity covers the items, so the final
    // summary is the exact count over BOTH batches
    val stream = MemoryStream[String](spark)
    stream.addData(Seq.fill(5)("a") ++ Seq.fill(2)("b"): _*)
    val q = stream.toDF().toDF("item")
      .agg(graft.functions.HashFunctions.misra_gries(col("item"), 8).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.est").as("est"))
      .writeStream.format("memory").queryName("mg_stream").outputMode("complete").start()
    q.processAllAvailable()
    stream.addData(Seq.fill(3)("a") ++ Seq.fill(4)("c"): _*)
    q.processAllAvailable(); q.stop()
    val r = spark.table("mg_stream").collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.toSeq == Seq("a" -> 8L, "c" -> 4L, "b" -> 2L))
  }

  test("streaming fetch schedule: single batch ≡ batch operator bit-for-bit") {
    val pages = (0 until 60).map(i => (i.toLong, t(0), s"http://d${i % 3}.com/p/$i"))
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(pages: _*)
    val q = StreamingWindows.streamingFetchSchedule(
      stream.toDF().toDF("doc_id", "ts", "url"),
      delays = Map("d1.com" -> 5L), watermark = "10 minutes", defaultDelaySec = 2L)
      .writeStream.format("memory").queryName("sched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val batchOut = graft.operators.Frontier.fetchSchedule(
      pages.toDF("doc_id", "ts", "url").drop("ts"),
      Seq(("d1.com", 5L)).toDF("domain", "crawl_delay"), defaultDelaySec = 2L)
    val got = spark.table("sched").select("doc_id", "domain", "seq", "fetch_at")
    assert(got.except(batchOut).isEmpty && batchOut.except(got).isEmpty)
  }

  test("streaming fetch schedule: sequences continue across batches, reset after eviction") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData((1L, t(0), "http://a.com/1"), (2L, t(0), "http://a.com/2"))
    val q = StreamingWindows.streamingFetchSchedule(
      stream.toDF().toDF("doc_id", "ts", "url"),
      delays = Map.empty, watermark = "5 minutes", defaultDelaySec = 3L)
      .writeStream.format("memory").queryName("sched2").outputMode("append").start()
    q.processAllAvailable()
    // second batch within the horizon: slots continue at 2
    stream.addData((3L, t(1), "http://a.com/3"))
    q.processAllAvailable()
    // push the watermark far past a.com's timeout, then a fresh arrival
    stream.addData((4L, t(60), "http://other.com/x"))
    q.processAllAvailable()
    stream.addData((5L, t(62), "http://a.com/4"))
    q.processAllAvailable(); q.stop()
    val m = spark.table("sched2").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(Set(m(1L), m(2L)) == Set((0L, 0L), (1L, 3L))) // batch-1 order is md5-based
    assert(m(3L) == ((2L, 6L)))  // continued counter
    assert(m(5L) == ((0L, 0L)))  // evicted domain restarts at slot 0
  }

  test("streaming trap census: single batch matches the batch template verdicts") {
    // template http://t.com/s/0 accumulates 4 distinct urls (threshold 4);
    // the benign template has 2; repeats never count
    val pages = Seq(
      (1L, t(0), "http://t.com/s/11"), (2L, t(0), "http://t.com/s/22"),
      (3L, t(1), "http://t.com/s/33"), (4L, t(1), "http://t.com/s/44"),
      (5L, t(1), "http://t.com/s/11"),                     // repeat — no count
      (6L, t(0), "http://ok.com/a/1"), (7L, t(1), "http://ok.com/a/2"))
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData(pages: _*)
    val q = StreamingWindows.streamingTrapCensus(
      stream.toDF().toDF("doc_id", "ts", "url"),
      templateThreshold = 4, watermark = "10 minutes")
      .writeStream.format("memory").queryName("traps1").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("traps1").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // batch reference: the same templates crawlTraps flags at threshold 4
    val batch = graft.operators.UrlOps.crawlTraps(
        pages.toDF("doc_id", "ts", "url"), templateThreshold = 4L)
      .filter($"n_template_urls" >= 4)
      .select(org.apache.spark.sql.functions.regexp_replace(
        org.apache.spark.sql.functions.lit("http://t.com/s/11"), "[0-9]+", "0"))
    assert(got == Map("http://t.com/s/0" -> 4))
    assert(batch.distinct().collect().map(_.getString(0)).toSet == got.keySet)
  }

  test("streaming trap census: fires once at the crossing, evicts past the horizon") {
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    stream.addData((1L, t(0), "http://g.com/p/1"), (2L, t(0), "http://g.com/p/2"))
    val q = StreamingWindows.streamingTrapCensus(
      stream.toDF().toDF("doc_id", "ts", "url"),
      templateThreshold = 3, watermark = "5 minutes")
      .writeStream.format("memory").queryName("traps2").outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("traps2").count() == 0) // 2 < 3: silent
    // crossing batch → exactly one alert; further novel urls stay silent
    stream.addData((3L, t(1), "http://g.com/p/3"), (4L, t(1), "http://g.com/p/4"))
    q.processAllAvailable()
    stream.addData((5L, t(2), "http://g.com/p/5"))
    q.processAllAvailable()
    val alerts1 = spark.table("traps2").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(alerts1.toSeq == Seq(("http://g.com/p/0", 4))) // census AT crossing (mid-batch overshoot)
    // push the watermark far past the horizon, then the generator resumes:
    // evicted state must re-prove — a fresh crossing fires a second alert
    stream.addData((6L, t(60), "http://other.com/x/1"))
    q.processAllAvailable()
    stream.addData(
      (7L, t(61), "http://g.com/p/6"), (8L, t(61), "http://g.com/p/7"),
      (9L, t(61), "http://g.com/p/8"))
    q.processAllAvailable(); q.stop()
    val alerts2 = spark.table("traps2").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(alerts2.count(_._1 == "http://g.com/p/0") == 2)
  }

  test("streaming first-fit pack: single batch matches a sequential first-fit reference") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq((0L, txt(100)), (8L, txt(200)), (16L, txt(180)),
      (24L, txt(60)), (32L, txt(40)), (1L, txt(300)))
    val stream = MemoryStream[(Long, String)](spark)
    stream.addData(docs: _*)
    val q = StreamingWindows.streamingFirstFitPack(
        stream.toDF().toDF("doc_id", "text"), maxTokens = 256, shards = 8)
      .writeStream.format("memory").queryName("pack1").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pack1").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // reference first-fit in doc_id order, shard 0: 100→b1(156), 200→b2(56),
    // 180→b3(76), 60→b1(96), 40→b1(56); shard 1: 300 ≥ cap → closed b1
    assert(got(0L) == ((0, 100, 1L)))
    assert(got(8L) == ((0, 200, 2L)))
    assert(got(16L) == ((0, 180, 3L)))
    assert(got(24L) == ((0, 60, 1L)))
    assert(got(32L) == ((0, 40, 1L)))
    assert(got(1L) == ((1, 300, 1L)))
  }

  test("streaming first-fit pack: open bins persist across batches; cap closes the fullest") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val stream = MemoryStream[(Long, String)](spark)
    stream.addData((0L, txt(200)))
    val q = StreamingWindows.streamingFirstFitPack(
        stream.toDF().toDF("doc_id", "text"), maxTokens = 256, shards = 8,
        maxOpenBins = 2)
      .writeStream.format("memory").queryName("pack2").outputMode("append").start()
    q.processAllAvailable()
    // batch 2: 50 fits batch-1's open bin (rem 56) — state carried over
    stream.addData((8L, txt(50)))
    q.processAllAvailable()
    // batch 3: two big docs open bins 2 and 3; the cap (2) closes the
    // fullest open bin (bin 1, rem 6), so a later 5-token doc can only
    // land in bin 2 (rem 26) — bin 1 is gone despite having room
    stream.addData((16L, txt(230)), (24L, txt(250)))
    q.processAllAvailable()
    stream.addData((32L, txt(5)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("pack2").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(0L) == 1L && got(8L) == 1L)
    assert(got(16L) == 2L && got(24L) == 3L)
    assert(got(32L) == 2L) // NOT bin 1: it was closed by the cap
  }

  test("streaming chat render: transcripts match the batch Dialogue operator") {
    // user 1: two in-gap events (one 2-turn session) + one after the gap;
    // user 2: a single event — 3 sessions total
    val fx = Seq(
      EvP(0, t(0), 1, "signup", """{"k": 7}"""),
      EvP(1, t(10), 1, "click", """{"k": 42}"""),
      EvP(2, t(55), 1, "error", """{"k": 3}"""),
      EvP(3, t(5), 2, "purchase", """{"k": 9}"""))
    val stream = MemoryStream[EvP](spark)
    stream.addData(fx: _*)
    val q = StreamingWindows.streamingChatRender(stream.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("chatrender").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("chatrender").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("transcript"),
        r.getAs[Int]("n_turns"), r.getAs[Boolean]("fits_context")))
    assert(streamed.length == 3)
    assert(streamed.toSet.contains(
      (1L, "<|user|>signup k=7\n<|assistant|>click k=42", 2, false)))
    // parity: same events through the batch operator (ts as epoch nanos)
    val batchDf = fx.map(e => (e.event_id, e.ts.getTime * 1000000L, e.user_id,
      e.event_type, e.props)).toDF("event_id", "ts", "user_id", "event_type", "props")
    val batched = graft.operators.Dialogue.renderConversations(batchDf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("transcript"),
        r.getAs[Int]("n_turns"), r.getAs[Boolean]("fits_context")))
    assert(streamed.toSet == batched.toSet)
  }

  test("streaming chat render: a null-props turn renders k= instead of vanishing") {
    // r14 regression: without the coalesce the concat null-propagated and
    // array_join silently DROPPED the turn from the transcript while
    // n_turns still counted it — diverging from batch turns() and the
    // shared q190/q200 oracle, which both coalesce to ''
    val fx = Seq(
      EvP(0, t(0), 1, "signup", """{"k": 7}"""),
      EvP(1, t(10), 1, "click", null))
    val stream = MemoryStream[EvP](spark)
    stream.addData(fx: _*)
    val q = StreamingWindows.streamingChatRender(stream.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("chatnullprops").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val r = spark.table("chatnullprops").collect().head
    assert(r.getAs[Int]("n_turns") == 2)
    assert(r.getAs[String]("transcript") ==
      "<|user|>signup k=7\n<|assistant|>click k=")
    // parity with the batch operator on the same events
    val batchDf = fx.map(e => (e.event_id, e.ts.getTime * 1000000L, e.user_id,
      e.event_type, e.props)).toDF("event_id", "ts", "user_id", "event_type", "props")
    val b = graft.operators.Dialogue.renderConversations(batchDf).collect().head
    assert(b.getAs[String]("transcript") == r.getAs[String]("transcript"))
  }

  test("streaming chat render: the exact-gap boundary merges (stream == batch) - pinned") {
    // two events exactly 30:00 apart: session_window MERGES touching
    // sessions (the second event's window starts at the first session's
    // end), so streaming keeps ONE session — agreeing with the batch q33
    // rule (reopen only when the gap is STRICTLY greater than the
    // threshold). No divergence at the boundary.
    val fx = Seq(
      EvP(0, t(0), 1, "signup", """{"k": 1}"""),
      EvP(1, t(30), 1, "click", """{"k": 2}"""))
    val stream = MemoryStream[EvP](spark)
    stream.addData(fx: _*)
    val q = StreamingWindows.streamingChatRender(stream.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("chatboundary").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("chatboundary").count() == 1L) // streaming: one merged session
    val batchDf = fx.map(e => (e.event_id, e.ts.getTime * 1000000L, e.user_id,
      e.event_type, e.props)).toDF("event_id", "ts", "user_id", "event_type", "props")
    assert(graft.operators.Dialogue.renderConversations(batchDf).count() == 1L)
  }

  test("state-store provider parity: RocksDB output == default HDFS-backed output") {
    // r15: every staged streaming fixture runs under RocksDB (the 100-TB
    // state posture — keyed state off the executor heap), so the family's
    // DuckDB oracles certify that provider; this pin proves the operators
    // are provider-AGNOSTIC by running the same cross-batch keyed-state
    // schedule under both providers and demanding identical output.
    def runWith(provider: String, name: String): Map[Long, (Long, Long)] = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, s"org.apache.spark.sql.execution.streaming.state.$provider")
      try {
        val stream = MemoryStream[(Long, Timestamp, String)](spark)
        stream.addData((1L, t(0), "http://a.com/x"), (2L, t(0), "http://b.com/y"))
        val q = StreamingWindows.streamingFetchSchedule(
          stream.toDF().toDF("doc_id", "ts", "url"),
          delays = Map("a.com" -> 5L), watermark = "10 minutes")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        q.processAllAvailable()
        stream.addData((3L, t(1), "http://a.com/z")) // second batch: counter must continue
        q.processAllAvailable(); q.stop()
        spark.table(name).collect()
          .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
    val rocks = runWith("RocksDBStateStoreProvider", "prov_rocks")
    val hdfs = runWith("HDFSBackedStateStoreProvider", "prov_hdfs")
    assert(rocks == hdfs)
    assert(rocks(3L) == ((1L, 5L))) // cross-batch per-domain counter continued under RocksDB
    assert(rocks(1L) == ((0L, 0L)) && rocks(2L) == ((0L, 0L)))
  }

  test("sentinelStages: two single-row far-future stages conforming to the events schema") {
    // the q200/q202 emission mechanics, factored (r14 verdict): distinct
    // negative event_ids, ONE shared never-closing key (user -1), schema
    // conformed to the consumer's events frame via unionByName
    import org.apache.spark.sql.functions.lit
    val events = Seq((0L, 1L, "view", "{\"k\": 1}", t(0)))
      .toDF("event_id", "user_id", "event_type", "props", "ts")
    val stages = SparkEntry.sentinelStages(events,
      lit("2024-06-01 00:00:00").cast("timestamp"),
      extraCols = Seq("props" -> lit("{\"k\": 0}")))
    assert(stages.length == 2)
    val rows = stages.map { st =>
      assert(st.schema == events.schema)
      val r = st.collect()
      assert(r.length == 1)
      r.head
    }
    assert(rows.map(_.getAs[Long]("event_id")).toSet == Set(-1L, -2L))
    assert(rows.forall(_.getAs[Long]("user_id") == -1L))
    assert(rows.forall(_.getAs[String]("event_type") == "sentinel"))
    assert(rows.forall(_.getAs[String]("props") == "{\"k\": 0}"))
    assert(rows.forall(_.getAs[Timestamp]("ts") ==
      Timestamp.valueOf("2024-06-01 00:00:00")))
    // without extraCols the row conforms to a props-less schema (q202 shape)
    val lean = SparkEntry.sentinelStages(events.drop("props"),
      lit("2025-01-01 00:00:00").cast("timestamp"))
    assert(lean.forall(_.schema == events.drop("props").schema))
    assert(lean.map(_.count()).sum == 2L)
  }

  test("stageMicroBatches: mtime-ordered single files, stage order preserved") {
    // the protocol all NINE streaming fixtures share: batch-%03d names,
    // strictly ascending mtimes (FileStreamSource orders by (mtime, path)),
    // one parquet file per stage, staging temp dirs cleaned up
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_test").toFile
    try {
      val stages = (0 until 3).map(i =>
        Seq((i.toLong * 10, s"stage$i text")).toDF("doc_id", "text"))
      val inDir = SparkEntry.stageMicroBatches("qtest", dir.getAbsolutePath, stages)
      val files = inDir.listFiles().sortBy(_.getName)
      assert(files.map(_.getName).toSeq ==
        Seq("batch-000.parquet", "batch-001.parquet", "batch-002.parquet"))
      assert(files.map(_.lastModified).toSeq == files.map(_.lastModified).sorted.toSeq)
      assert(files.map(_.lastModified).distinct.length == 3, "mtimes must be distinct")
      // stage i's file holds exactly stage i's rows
      files.zipWithIndex.foreach { case (f, i) =>
        val rows = spark.read.parquet(f.getAbsolutePath).collect()
        assert(rows.length == 1 && rows.head.getLong(0) == i.toLong * 10)
      }
      // no stageN temp dirs left behind
      assert(!dir.listFiles().exists(_.getName.startsWith("stage")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("stream-stream interval join: cross-batch pairing, watermark-gated null emission") {
    // the q212 shape on a hand-built schedule: the view arrives a batch
    // BEFORE its click (pairing requires the views-side buffer to
    // persist), and an unmatched view null-emits only after BOTH sides'
    // watermark nodes pass its horizon (the global watermark is the MIN,
    // so the advancing batches carry a row on each side — non-matching:
    // each click precedes its batch's view)
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)](spark)
    val df = stream.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val out = StreamingWindows.streamingClickAttribution(df,
      attributionWindow = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      stream.addData((1L, t(0), 1L, "view"), (2L, t(0), 2L, "view"))
      q.processAllAvailable()
      // user 1's click lands one batch later, in-window (t10 <= t0+30m)
      stream.addData((3L, t(10), 1L, "click"))
      q.processAllAvailable()
      // watermark advancers: user 9's click at t50/t52 precedes its view
      // at t55/t57, so none of the four rows can ever match or emit; by
      // the second batch the global watermark is t50 - 10m = t40 > t30 =
      // view 2's horizon, so its null row must be out
      stream.addData((4L, t(55), 9L, "view"), (5L, t(50), 9L, "click"))
      q.processAllAvailable()
      stream.addData((6L, t(57), 9L, "view"), (7L, t(52), 9L, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(rows == Set((1L, 1L, 3L), (2L, 2L, -1L)),
      s"expected the cross-batch pair and one null row, got $rows")
  }

  test("upsertBatch: replaces changed keys, keeps the rest, idempotent under replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_test").toFile
    try {
      val serving = dir.getAbsolutePath
      def latest: Map[Long, (Long, Long)] =
        StreamingWindows.readServingSnapshot(spark, serving).get.collect()
          .map(r => r.getAs[Long]("user_id") ->
            ((r.getAs[Long]("n_events"), r.getAs[Long]("last_us")))).toMap
      val b0 = Seq((1L, 2L, 10L), (2L, 1L, 20L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving)(b0, 0L)
      val b1 = Seq((1L, 5L, 30L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving)(b1, 1L)
      // user 1 replaced (no second row), user 2 carried forward
      assert(latest == Map(1L -> ((5L, 30L)), 2L -> ((1L, 20L))))
      // at-least-once replay of batch 1: reads only versions < 1, rewrites
      // the SAME v1 from the same inputs — the view is unchanged
      StreamingWindows.upsertBatch(serving)(b1, 1L)
      assert(latest == Map(1L -> ((5L, 30L)), 2L -> ((1L, 20L))))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("upsertBatch schema evolution: add + widen read NULL-backfilled; drop and retype refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_evo").toFile
    try {
      val serving = dir.getAbsolutePath
      val b0 = Seq((1L, 2, 10L), (2L, 1, 20L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving, buckets = 4)(b0, 0L)
      // batch 1 WIDENS n_events (int → long) and ADDS score
      val b1 = Seq((1L, 5L, 30L, 0.5)).toDF("user_id", "n_events", "last_us", "score")
      StreamingWindows.upsertBatch(serving, buckets = 4)(b1, 1L)
      val view = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(view.schema("n_events").dataType ==
        org.apache.spark.sql.types.LongType,
        "the shared column must read at the widened type")
      val rows = view.collect().map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"),
          if (r.isNullAt(r.fieldIndex("score"))) None
          else Some(r.getAs[Double]("score"))))).toMap
      assert(rows == Map(1L -> ((5L, Some(0.5))), 2L -> ((1L, None))),
        s"carried pre-change rows read with NULL for the added column: $rows")
      // time travel BELOW the change keeps the OLD shape entirely
      val asOf0 = StreamingWindows.readServingAsOf(spark, serving, 0L).get
      assert(!asOf0.columns.contains("score"),
        "a snapshot's schema is its resolving version's batch schema")
      assert(asOf0.schema("n_events").dataType ==
        org.apache.spark.sql.types.IntegerType)
      // a NARROWER later batch up-casts instead of corrupting the base
      val b2 = Seq((2L, 7, 40L, 0.25f)).toDF("user_id", "n_events", "last_us", "score")
      StreamingWindows.upsertBatch(serving, buckets = 4)(b2, 2L)
      val v2 = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(v2.schema("n_events").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(v2.schema("score").dataType ==
        org.apache.spark.sql.types.DoubleType)
      // the changefeed diffs across the boundary: v1 = user 1's update
      // (NULL→score counts as change), v2 = user 2's update; nothing else
      val feed = StreamingWindows.servingChangefeed(spark, serving).get
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
          r.getAs[Long]("user_id"))).toSet
      assert(feed == Set((0L, "insert", 1L), (0L, "insert", 2L),
        (1L, "update", 1L), (2L, "update", 2L)), feed.toString)
      // the generation alignment (extra Projects around the prior side)
      // must not demote the per-version diffs off the broadcast path —
      // the exact regression mode the r18 band caught on q233
      val feedPlan = StreamingWindows.servingChangefeed(spark, serving).get
        .queryExecution.executedPlan.toString
      assert(!feedPlan.contains("SortMergeJoin") &&
        !feedPlan.contains("BroadcastNestedLoop"),
        "evolved-chain diffs must stay on the broadcast path")
      // DROPPING a column refuses loudly…
      val eDrop = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((1L, 9L, 50L)).toDF("user_id", "n_events", "last_us"), 3L)
      }
      assert(eDrop.getMessage.contains("missing existing column"), eDrop.getMessage)
      // …and so does an incompatible retype
      val eType = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((1L, "many", 50L, 0.5)).toDF("user_id", "n_events", "last_us", "score"), 3L)
      }
      assert(eType.getMessage.contains("loss-free"), eType.getMessage)
      // neither refusal left a half-written version
      assert(StreamingWindows.readServingAsOf(spark, serving, 99L).get
        .collect().length == 2)
      // the incremental tail works across the boundary too: fromVersion
      // past the change returns only post-change rows, new column valued
      val tail = StreamingWindows.servingChangefeed(spark, serving,
        fromVersion = 2L).get.collect()
      assert(tail.map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
        r.getAs[Long]("user_id"))).toSeq == Seq((2L, "update", 2L)))
      // an ALL-deletions batch may carry just (key, marker): it writes
      // no values, so the no-drop rule doesn't bind it — the GDPR
      // delete-queue drain stays decoupled from schema changes
      StreamingWindows.upsertBatch(serving, buckets = 4,
        tombstoneCol = Some("__del"))(
        Seq((1L, true)).toDF("user_id", "__del"), 3L)
      val afterDel = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(afterDel.collect().map(_.getAs[Long]("user_id")).toSeq == Seq(2L))
      assert(afterDel.columns.contains("score"),
        "a delete-only version keeps the table schema")
      // …but a MIXED batch still carries the full schema like any upsert
      val eMixed = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4,
          tombstoneCol = Some("__del"))(
          Seq((2L, true), (9L, false)).toDF("user_id", "__del"), 4L)
      }
      assert(eMixed.getMessage.contains("missing existing column"), eMixed.getMessage)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("maintenance verbs on an evolved chain: vacuum keeps NULLs, compact unifies generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_evomaint").toFile
    try {
      val serving = dir.getAbsolutePath
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("user_id", "n"), 0L)
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 2L, 0.5)).toDF("user_id", "n", "score"), 1L)
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((2L, 3L, 1.5)).toDF("user_id", "n", "score"), 2L)
      def view: Map[Long, (Long, Option[Double])] =
        StreamingWindows.readServingSnapshot(spark, serving).get.collect()
          .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("n"),
            if (r.isNullAt(r.fieldIndex("score"))) None
            else Some(r.getAs[Double]("score"))))).toMap
      val expected = Map(1L -> ((2L, Some(0.5))), 2L -> ((3L, Some(1.5))),
        3L -> ((1L, None)))
      assert(view == expected)
      // vacuum decommissions pre-change snapshots; the current (mixed-
      // generation) view is untouched, carried NULLs included
      StreamingWindows.vacuumServing(serving, keepLast = 2)
      assert(view == expected, "vacuum must not disturb the evolved view")
      // compaction EXECUTES the aligned multi-generation read and
      // re-states the table as ONE generation under the evolved schema —
      // after it, the chain has a single version and the same view
      StreamingWindows.compactServing(spark, serving, buckets = 4)
      assert(view == expected, "compaction must preserve the evolved view")
      val compacted = StreamingWindows.readServingAsOf(spark, serving, 2L).get
      assert(compacted.columns.contains("score"),
        "the compacted generation carries the evolved schema")
      // and the next batch merges against the unified generation
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((3L, 2L, 2.5)).toDF("user_id", "n", "score"), 3L)
      assert(view == expected + (3L -> ((2L, Some(2.5)))))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("upsertBatch evolution validates against the whole table, not just touched buckets") {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_xb").toFile
    try {
      val serving = dir.getAbsolutePath
      def bucketOf(id: Long): Int = spark.range(1)
        .select(pmod(xxhash64(lit(id)), lit(4L)).cast("int")).head().getInt(0)
      val k1 = 1L
      val k2 = (2L to 64L).find(bucketOf(_) != bucketOf(k1)).get
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((k1, 1L), (k2, 1L)).toDF("user_id", "n"), 0L)
      // v1 touches ONLY k1's bucket and adds score:double
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((k1, 2L, 0.5)).toDF("user_id", "n", "score"), 1L)
      // a batch touching ONLY k2's bucket must still refuse a type
      // incompatible with the column that lives only in k1's untouched
      // bucket — otherwise the commit poisons every later read
      val eCross = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((k2, 3L, "poison")).toDF("user_id", "n", "score"), 2L)
      }
      assert(eCross.getMessage.contains("loss-free"), eCross.getMessage)
      // …and must still refuse dropping the column it cannot see
      val eDrop = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((k2, 3L)).toDF("user_id", "n"), 2L)
      }
      assert(eDrop.getMessage.contains("missing existing column"), eDrop.getMessage)
      // the KEY is exempt from type evolution: bucketing hashes the
      // key's physical type, so a retyped key would re-bucket carried
      // rows out of every manifest
      val eKey = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((k2.toInt, 3L, 1.5)).toDF("user_id", "n", "score"), 2L)
      }
      assert(eKey.getMessage.contains("key column"), eKey.getMessage)
      // the compatible batch goes through and the view is whole
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((k2, 3L, 1.5)).toDF("user_id", "n", "score"), 2L)
      val rows = StreamingWindows.readServingSnapshot(spark, serving).get
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("score")))).toMap
      assert(rows == Map(k1 -> ((2L, 0.5)), k2 -> ((3L, 1.5))), rows.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("upsertBatch: untouched buckets carry forward by reference, byte-identical") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_bkt").toFile
    try {
      val serving = dir.getAbsolutePath
      val buckets = 4
      // pick two keys the layout's own formula puts in DIFFERENT buckets
      def bucketOf(id: Long): Int = spark.range(1)
        .select(pmod(xxhash64(lit(id)), lit(buckets.toLong)).cast("int"))
        .head().getInt(0)
      val keyA = 1L
      val keyB = (2L to 64L).find(bucketOf(_) != bucketOf(keyA)).get
      val b0 = Seq((keyA, 1L, 10L), (keyB, 1L, 20L))
        .toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving, buckets)(b0, 0L)
      val bDirB = new java.io.File(serving, s"v0/__bucket=${bucketOf(keyB)}")
      def bucketBytes: Map[String, Seq[Byte]] =
        bDirB.listFiles().filter(_.getName.endsWith(".parquet")).map(f =>
          f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
      val before = bucketBytes
      assert(before.nonEmpty)
      // batch 1 touches only keyA's bucket
      val b1 = Seq((keyA, 3L, 30L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving, buckets)(b1, 1L)
      // v1 holds ONLY keyA's bucket — keyB's was neither read nor rewritten
      val v1Buckets = new java.io.File(serving, "v1").listFiles()
        .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
      assert(v1Buckets == Set(s"__bucket=${bucketOf(keyA)}"),
        s"v1 must contain only the touched bucket, got $v1Buckets")
      // the untouched bucket's v0 files survived byte-identical
      assert(bucketBytes == before)
      // and the manifest-resolved view still serves keyB from v0
      val rows = StreamingWindows.readServingSnapshot(spark, serving).get
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Long]("last_us"))).toSet
      assert(rows == Set((keyA, 3L, 30L), (keyB, 1L, 20L)))
      // crash-safety: a leftover half-assembled dir (no manifest) is inert —
      // readers keep serving the committed v1 view
      val half = new java.io.File(serving, "v2")
      half.mkdirs()
      assert(StreamingWindows.readServingSnapshot(spark, serving).get
        .count() == 2)
      half.delete()
      // COMPACTION: the chain vacuums to ONE full version at the max
      // number, the view is preserved exactly, and old versions are gone
      StreamingWindows.compactServing(spark, serving, buckets)
      val remaining = new java.io.File(serving).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName)
      assert(remaining.toSet == Set("v1"), s"expected only v1, got ${remaining.toSet}")
      val compacted = StreamingWindows.readServingSnapshot(spark, serving).get
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Long]("last_us"))).toSet
      assert(compacted == Set((keyA, 3L, 30L), (keyB, 1L, 20L)))
      // and the compacted v1 now holds BOTH live buckets itself
      val v1After = new java.io.File(serving, "v1").listFiles()
        .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
      assert(v1After == Set(s"__bucket=${bucketOf(keyA)}", s"__bucket=${bucketOf(keyB)}"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("readServingAsOf + servingChangefeed: version snapshots and change rows") {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_cdf").toFile
    try {
      val serving = dir.getAbsolutePath
      val buckets = 4
      def bucketOf(id: Long): Int = spark.range(1)
        .select(pmod(xxhash64(lit(id)), lit(buckets.toLong)).cast("int"))
        .head().getInt(0)
      // A and B share a bucket (the carried-forward arm); C differs; D new later
      val keyA = 1L
      val keyB = (2L to 256L).find(bucketOf(_) == bucketOf(keyA)).get
      val keyC = (2L to 256L).find(bucketOf(_) != bucketOf(keyA)).get
      val keyD = (keyC + 1 to 256L).find(k => k != keyB && bucketOf(k) != bucketOf(keyA)).get
      def snap(v: Long): Set[(Long, Long, Long)] =
        StreamingWindows.readServingAsOf(spark, serving, v).get.collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
            r.getAs[Long]("last_us"))).toSet
      StreamingWindows.upsertBatch(serving, buckets)(
        Seq((keyA, 1L, 10L), (keyB, 1L, 11L), (keyC, 1L, 12L))
          .toDF("user_id", "n_events", "last_us"), 0L)
      StreamingWindows.upsertBatch(serving, buckets)(
        Seq((keyA, 3L, 30L)).toDF("user_id", "n_events", "last_us"), 1L)
      StreamingWindows.upsertBatch(serving, buckets)(
        Seq((keyD, 1L, 40L)).toDF("user_id", "n_events", "last_us"), 2L)
      // time travel: each version is a consistent snapshot; asOf past the
      // max resolves to the latest; asOf before the first commit is None
      assert(snap(0L) == Set((keyA, 1L, 10L), (keyB, 1L, 11L), (keyC, 1L, 12L)))
      assert(snap(1L) == Set((keyA, 3L, 30L), (keyB, 1L, 11L), (keyC, 1L, 12L)))
      assert(snap(99L) == snap(2L) &&
        snap(2L) == Set((keyA, 3L, 30L), (keyB, 1L, 11L), (keyC, 1L, 12L),
          (keyD, 1L, 40L)))
      assert(StreamingWindows.readServingAsOf(spark, serving, -1L).isEmpty)
      def feed(from: Long): Set[(Long, String, Long, Long, Long)] =
        StreamingWindows.servingChangefeed(spark, serving, fromVersion = from)
          .get.collect().map(r => (r.getAs[Long]("version"),
            r.getAs[String]("op"), r.getAs[Long]("user_id"),
            r.getAs[Long]("n_events"), r.getAs[Long]("last_us"))).toSet
      // v1 rewrote A AND carried B into its bucket dir, but B's row is
      // value-equal — only A's update may emit; D first appears at v2
      assert(feed(0L) == Set(
        (0L, "insert", keyA, 1L, 10L), (0L, "insert", keyB, 1L, 11L),
        (0L, "insert", keyC, 1L, 12L),
        (1L, "update", keyA, 3L, 30L),
        (2L, "insert", keyD, 1L, 40L)))
      // incremental tail: resume from the last consumed version + 1
      assert(feed(2L) == Set((2L, "insert", keyD, 1L, 40L)))

      val fullFeed = feed(0L) // captured before the vacuum bounds it
      // VACUUM to a two-version window: v0 decommissions as a snapshot
      // (its manifest goes — asOf(0) is None, never a partial read) but
      // stays on disk as the bucket donor v1/v2's manifests reference;
      // everything inside the window is untouched
      val beforeV1 = snap(1L)
      StreamingWindows.vacuumServing(serving, keepLast = 2)
      assert(StreamingWindows.readServingAsOf(spark, serving, 0L).isEmpty,
        "below the vacuum horizon must be None")
      assert(snap(1L) == beforeV1 && snap(99L) == snap(2L))
      assert(!new java.io.File(serving, "v0/manifest.txt").isFile,
        "v0's manifest must be gone")
      assert(new java.io.File(serving, "v0").isDirectory,
        "v0's bucket data must survive as a donor")
      // the changefeed horizon shrinks PAST the lowest kept version:
      // v1's prior manifest is gone, so its diff is unresolvable and
      // must be excluded (reporting it would fabricate inserts for
      // carried-forward rows), leaving only v2
      assert(feed(0L).map(_._1) == Set(2L))
      // APPLY self-consistency: folding the (pre-vacuum) change rows in
      // version order — last write per key wins — reconstructs the
      // current snapshot exactly (a downstream consumer applying the
      // feed converges to the table)
      val applied = fullFeed.groupBy(_._3).map { case (_, rows) =>
        val last = rows.maxBy(_._1)
        (last._3, last._4, last._5)
      }.toSet
      assert(applied == snap(99L),
        "applying the changefeed must reconstruct the current view")
      // DONOR RE-SWEEP: v2's manifest still references v0/v1, so they
      // survived the first vacuum as donors; once a vacuum keeps only a
      // version that references nobody, the stranded donor dirs (which
      // are no longer committedVersions — the leak case) are reclaimed
      val b3 = Seq((keyA, 9L, 90L), (keyB, 9L, 91L), (keyC, 9L, 92L),
        (keyD, 9L, 93L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving, buckets)(b3, 3L)
      StreamingWindows.vacuumServing(serving, keepLast = 1)
      Seq("v0", "v1", "v2").foreach(v => assert(
        !new java.io.File(serving, v).exists(), s"$v must be reclaimed"))
      assert(snap(99L) == Set((keyA, 9L, 90L), (keyB, 9L, 91L),
        (keyC, 9L, 92L), (keyD, 9L, 93L)))
      assert(StreamingWindows.readServingAsOf(spark, serving, 2L).isEmpty)
      // horizon = 3: no version above it exists → no feed at all
      assert(StreamingWindows.servingChangefeed(spark, serving).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("upsertBatch tombstones: key deletes, emptied buckets, delete changefeed") {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_del").toFile
    try {
      val serving = dir.getAbsolutePath
      val buckets = 4
      def bucketOf(id: Long): Int = spark.range(1)
        .select(pmod(xxhash64(lit(id)), lit(buckets.toLong)).cast("int"))
        .head().getInt(0)
      // A and B share a bucket; L lives ALONE in its bucket (the
      // emptied-bucket arm needs a delete that leaves zero rows behind)
      val keyA = 1L
      val keyB = (2L to 256L).find(bucketOf(_) == bucketOf(keyA)).get
      val keyL = (2L to 256L).find(k => k != keyB &&
        bucketOf(k) != bucketOf(keyA)).get
      def snap(v: Long): Set[(Long, Long, Long)] =
        StreamingWindows.readServingAsOf(spark, serving, v).get.collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
            r.getAs[Long]("last_us"))).toSet
      StreamingWindows.upsertBatch(serving, buckets)(
        Seq((keyA, 1L, 10L), (keyB, 1L, 11L), (keyL, 1L, 12L))
          .toDF("user_id", "n_events", "last_us"), 0L)
      // batch 1: tombstone A (bucket keeps B) and L (bucket empties);
      // a delete of an ABSENT key is a no-op; the marker column has a
      // NULL (treated false) riding on a regular upsert of B
      StreamingWindows.upsertBatch(serving, buckets,
        tombstoneCol = Some("__del"))(
        Seq((keyA, Option.empty[Long], Option.empty[Long], Some(true)),
          (keyL, Option.empty[Long], Option.empty[Long], Some(true)),
          (999L, Option.empty[Long], Option.empty[Long], Some(true)),
          (keyB, Some(2L), Some(21L), Option.empty[Boolean]))
          .toDF("user_id", "n_events", "last_us", "__del"), 1L)
      assert(snap(0L) == Set((keyA, 1L, 10L), (keyB, 1L, 11L), (keyL, 1L, 12L)),
        "time travel below the delete still sees the keys")
      assert(snap(99L) == Set((keyB, 2L, 21L)),
        "deleted keys leave the current view; the marker column never lands")
      // the emptied bucket left the manifest: no reader path may dangle
      assert(StreamingWindows.readServingSnapshot(spark, serving).get
        .columns.toSeq == Seq("user_id", "n_events", "last_us"))
      // batch 2: deleted-then-reinserted key emits delete -> insert
      StreamingWindows.upsertBatch(serving, buckets)(
        Seq((keyA, 5L, 50L)).toDF("user_id", "n_events", "last_us"), 2L)
      val feed = StreamingWindows.servingChangefeed(spark, serving).get
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
          r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("last_us"))).toSet
      assert(feed == Set(
        (0L, "insert", keyA, 1L, 10L), (0L, "insert", keyB, 1L, 11L),
        (0L, "insert", keyL, 1L, 12L),
        // deletes carry the PRE-IMAGE; keyL's comes from the emptied-
        // bucket arm, keyA's from the anti-join arm; 999 emits nothing
        (1L, "delete", keyA, 1L, 10L), (1L, "delete", keyL, 1L, 12L),
        (1L, "update", keyB, 2L, 21L),
        (2L, "insert", keyA, 5L, 50L)))
      // plan shape: delete detection must not demote the per-version
      // diffs off the broadcast path (a full-outer join would — it
      // cannot BroadcastHashJoin, and the r18 lifecycle band caught
      // q233 at 2.06x when it briefly did). Two broadcast-able joins
      // (left for insert/update, anti for deletes), never a shuffle
      // join or a nested loop.
      val plan = StreamingWindows.servingChangefeed(spark, serving).get
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") &&
        !plan.contains("BroadcastNestedLoop"),
        "per-version diffs must stay on the broadcast path")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("an emptied serving table stays readable: tombstone-everything and expire-everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_empty").toFile
    try {
      val serving = dir.getAbsolutePath
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L, 10L), (2L, 1L, 11L)).toDF("user_id", "n_events", "last_us"), 0L)
      // delete the table's LAST keys: the view must stay readable as an
      // EMPTY frame with the serving schema (a zero-path parquet read
      // would throw UNABLE_TO_INFER_SCHEMA), not become unreadable
      StreamingWindows.upsertBatch(serving, buckets = 4,
        tombstoneCol = Some("__d"))(
        Seq((1L, Option.empty[Long], Option.empty[Long], Some(true)),
          (2L, Option.empty[Long], Option.empty[Long], Some(true)))
          .toDF("user_id", "n_events", "last_us", "__d"), 1L)
      val empty = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(empty.count() == 0 &&
        empty.columns.toSeq == Seq("user_id", "n_events", "last_us"))
      // life continues: a later batch re-populates, and the changefeed
      // reads the full arc (inserts, the mass delete, the re-insert)
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 5L, 50L)).toDF("user_id", "n_events", "last_us"), 2L)
      assert(StreamingWindows.readServingSnapshot(spark, serving).get.count() == 1)
      val feed = StreamingWindows.servingChangefeed(spark, serving).get
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
          r.getAs[Long]("user_id"))).toSet
      assert(feed == Set((0L, "insert", 1L), (0L, "insert", 2L),
        (1L, "delete", 1L), (1L, "delete", 2L), (2L, "insert", 1L)))
      // the expire-everything arm of the same edge
      StreamingWindows.expireServing(spark, serving,
        org.apache.spark.sql.functions.lit(false), buckets = 4)
      val expired = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(expired.count() == 0 &&
        expired.columns.toSeq == Seq("user_id", "n_events", "last_us"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("serving rename: carried rows read the new name, pure rename diffs nothing, refusals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_rename").toFile
    try {
      val serving = dir.getAbsolutePath
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L, 10L), (2L, 1L, 11L)).toDF("user_id", "n_events", "last_us"), 0L)
      // v1 declares last_us -> seen_us and RE-STATES user 2 with
      // byte-identical values under the new name; user 1 carries
      StreamingWindows.upsertBatch(serving, buckets = 4,
        renames = Map("last_us" -> "seen_us"))(
        Seq((2L, 1L, 11L)).toDF("user_id", "n_events", "seen_us"), 1L)
      val snap = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(snap.columns.toSeq == Seq("user_id", "n_events", "seen_us"),
        s"carried generations must read under the new name: ${snap.columns.toSeq}")
      assert(snap.collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("seen_us")).toMap == Map(1L -> 10L, 2L -> 11L))
      // time travel BELOW the declaration keeps the old name entirely
      assert(StreamingWindows.readServingAsOf(spark, serving, 0L).get
        .columns.toSeq == Seq("user_id", "n_events", "last_us"))
      // a PURE rename emits no spurious changefeed rows: the prior
      // aligns through the ledger, so the re-stated identical row
      // diffs value-to-value — only v0's genuine inserts appear
      val feed = StreamingWindows.servingChangefeed(spark, serving).get
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
          r.getAs[Long]("user_id"))).toSet
      assert(feed == Set((0L, "insert", 1L), (0L, "insert", 2L)),
        s"a pure rename must not fabricate updates: $feed")
      // CHAINED rename: v2 declares seen_us -> final_us; v0's data
      // applies both declarations in order
      StreamingWindows.upsertBatch(serving, buckets = 4,
        renames = Map("seen_us" -> "final_us"))(
        Seq((2L, 2L, 20L)).toDF("user_id", "n_events", "final_us"), 2L)
      val chained = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(chained.columns.toSeq == Seq("user_id", "n_events", "final_us"))
      assert(chained.collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("final_us")).toMap == Map(1L -> 10L, 2L -> 20L))
      // the ledger is purely plan-level: a renamed multi-generation
      // snapshot is pruned scans + Project + Union — no shuffle — and
      // the cross-rename changefeed keeps the broadcast diff path
      val snapPlan = chained.queryExecution.executedPlan.toString
      assert(!snapPlan.contains("Exchange"),
        s"a renamed read must not shuffle:\n$snapPlan")
      val renameFeedPlan = StreamingWindows.servingChangefeed(spark, serving)
        .get.queryExecution.executedPlan.toString
      assert(!renameFeedPlan.contains("SortMergeJoin") &&
        !renameFeedPlan.contains("BroadcastNestedLoop"),
        "cross-rename diffs must stay on the broadcast path")
      // refusals: unknown source, existing target, old name still in
      // the batch, key rename, rename on a delete-only batch — and no
      // half-written version after any of them
      def refused(msg: String)(body: => Unit): Unit = {
        val e = intercept[IllegalArgumentException](body)
        assert(e.getMessage.contains(msg), e.getMessage)
      }
      refused("does not exist")(StreamingWindows.upsertBatch(serving,
        buckets = 4, renames = Map("ghost" -> "g2"))(
        Seq((2L, 3L, 30L)).toDF("user_id", "n_events", "final_us"), 3L))
      refused("already exists")(StreamingWindows.upsertBatch(serving,
        buckets = 4, renames = Map("n_events" -> "final_us"))(
        Seq((2L, 3L, 30L)).toDF("user_id", "n_events", "final_us"), 3L))
      refused("still carries")(StreamingWindows.upsertBatch(serving,
        buckets = 4, renames = Map("final_us" -> "f2"))(
        Seq((2L, 3L, 30L, 31L)).toDF("user_id", "n_events", "final_us", "f2"), 3L))
      refused("cannot be renamed")(StreamingWindows.upsertBatch(serving,
        buckets = 4, renames = Map("user_id" -> "uid"))(
        Seq((2L, 3L, 30L)).toDF("uid", "n_events", "final_us"), 3L))
      refused("full-schema batch")(StreamingWindows.upsertBatch(serving,
        buckets = 4, tombstoneCol = Some("__d"),
        renames = Map("final_us" -> "f2"))(
        Seq((2L, Some(true))).toDF("user_id", "__d"), 3L))
      // two sources onto one target (or a target that is also a
      // source) would commit a ledger that makes every later aligned
      // read ambiguous — refused before anything lands
      refused("must be distinct")(StreamingWindows.upsertBatch(serving,
        buckets = 4, renames = Map("n_events" -> "x", "final_us" -> "x"))(
        Seq((2L, 3L, 30L)).toDF("user_id", "x", "y"), 3L))
      refused("also be a rename source")(StreamingWindows.upsertBatch(serving,
        buckets = 4,
        renames = Map("n_events" -> "x", "final_us" -> "n_events"))(
        Seq((2L, 3L, 30L)).toDF("user_id", "x", "n_events"), 3L))
      assert(!graft.util.Fs.exists(s"$serving/v3"),
        "a refused rename must leave no half-written version")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("declared table schema survives a generation-emptying delete: no silent reversion") {
    val dir = java.nio.file.Files.createTempDirectory("graft_serving_declared").toFile
    try {
      val serving = dir.getAbsolutePath
      // pick a user whose bucket differs from users 1 and 2's, so the
      // tombstone below empties EVERY dir of the evolved generation
      // (the r19 ADVICE corner: with a footer-derived table schema the
      // shape silently reverted to the pre-evolution generation there)
      import org.apache.spark.sql.functions.{pmod, xxhash64, col, lit}
      val bucketOf = spark.range(0, 50).select(col("id"),
        pmod(xxhash64(col("id")), lit(4L)).cast("int").as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val solo = (3L until 50L).find(u =>
        bucketOf(u) != bucketOf(1L) && bucketOf(u) != bucketOf(2L)).get
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L), (2L, 1L)).toDF("user_id", "n_events"), 0L)
      // v1 evolves the schema (adds c) touching ONLY the solo bucket
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((solo, 1L, 0.5)).toDF("user_id", "n_events", "c"), 1L)
      // v2 tombstones the solo user: the evolved generation's only
      // bucket dir leaves the manifest — no data file anywhere still
      // carries c, only v2's declaration does
      StreamingWindows.upsertBatch(serving, buckets = 4,
        tombstoneCol = Some("__d"))(
        Seq((solo, Some(true))).toDF("user_id", "__d"), 2L)
      // the no-drop and no-retype guarantees must still engage
      val eDrop = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((1L, 2L)).toDF("user_id", "n_events"), 3L)
      }
      assert(eDrop.getMessage.contains("missing existing column c"), eDrop.getMessage)
      val eRetype = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving, buckets = 4)(
          Seq((1L, 2L, "oops")).toDF("user_id", "n_events", "c"), 3L)
      }
      assert(eRetype.getMessage.contains("cannot evolve"), eRetype.getMessage)
      // a conforming batch proceeds, and the lapsed column re-enters at
      // its declared type
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 2L, 0.75)).toDF("user_id", "n_events", "c"), 3L)
      val snap = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(snap.schema("c").dataType ==
        org.apache.spark.sql.types.DoubleType)
      assert(snap.count() == 2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("compacting an evolved chain: newest schema at rest, horizon bounds the feed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_evolved").toFile
    try {
      val serving = dir.getAbsolutePath
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L), (2L, 1L)).toDF("user_id", "n_events"), 0L)
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 2L, 0.5)).toDF("user_id", "n_events", "c"), 1L)
      StreamingWindows.compactServing(spark, serving, buckets = 4)
      // ONE version, newest schema AT REST: user 2's c is a stored NULL
      // (the aligned read materialized through the rewrite)
      val snap = StreamingWindows.readServingSnapshot(spark, serving).get
      assert(snap.columns.toSeq == Seq("user_id", "n_events", "c"))
      assert(snap.collect().map(r => r.getAs[Long]("user_id") ->
        r.isNullAt(r.fieldIndex("c"))).toMap == Map(1L -> false, 2L -> true))
      // the re-stated table derives no diffs: the horizon lands at
      // vMax, so the feed reports nothing rather than fabricating the
      // carried rows as inserts; time travel below vMax is gone
      assert(StreamingWindows.servingChangefeed(spark, serving).isEmpty)
      assert(StreamingWindows.readServingAsOf(spark, serving, 0L).isEmpty)
      // and the chain continues: a later batch diffs against the
      // compacted base as usual
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((2L, 5L, 0.9)).toDF("user_id", "n_events", "c"), 2L)
      val feed = StreamingWindows.servingChangefeed(spark, serving).get
        .collect().map(r => (r.getAs[Long]("version"), r.getAs[String]("op"),
          r.getAs[Long]("user_id"))).toSet
      assert(feed == Set((2L, "update", 2L)), s"post-compaction diffs resume: $feed")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("vacuumServing: a no-op vacuum leaves the changefeed horizon untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vacuum_noop").toFile
    try {
      val serving = dir.getAbsolutePath
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 1L, 10L), (2L, 1L, 11L)).toDF("user_id", "n_events", "last_us"), 0L)
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((1L, 2L, 20L)).toDF("user_id", "n_events", "last_us"), 1L)
      def feedVersions: Set[Long] =
        StreamingWindows.servingChangefeed(spark, serving).get
          .collect().map(_.getAs[Long]("version")).toSet
      assert(feedVersions == Set(0L, 1L))
      // keepLast >= committed versions: nothing decommissions, so v0's
      // fully-resolvable insert diffs must STILL flow (the r17 ADVICE
      // defect wrote horizon = kept.min here and silently dropped them)
      StreamingWindows.vacuumServing(serving, keepLast = 2)
      assert(!Option(new java.io.File(serving).listFiles())
        .getOrElse(Array.empty)
        .exists(_.getName.startsWith("_changefeed_horizon")),
        "a vacuum that reclaims nothing must not write a horizon stamp")
      assert(feedVersions == Set(0L, 1L),
        "a no-op vacuum must not suppress resolvable diffs")
      // and a REAL vacuum afterward still bounds the feed as before
      StreamingWindows.upsertBatch(serving, buckets = 4)(
        Seq((2L, 5L, 50L)).toDF("user_id", "n_events", "last_us"), 2L)
      StreamingWindows.vacuumServing(serving, keepLast = 2)
      assert(feedVersions == Set(2L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
