package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dialogue

class DialogueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ts follows the Tables.events contract: epoch-NANOS BIGINT
  private def ev(id: Long, user: Long, minute: Long, typ: String, k: Int) =
    (id, minute * 60000000000L, user, typ, 0.0, s"""{"k": $k}""")

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("turns: 30-min gap opens a session, roles alternate, template renders") {
    val df = eventsDf(Seq(
      ev(0, 1, 0, "signup", 7),      // session 1 turn 0 (user)
      ev(1, 1, 29, "click", 42),     // 29 min gap -> same session, turn 1 (assistant)
      ev(2, 1, 60, "purchase", 3),   // 31 min gap -> session 2 turn 0
      ev(3, 2, 5, "error", 99)))     // other user, own session 1
    val got = Dialogue.turns(df).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getString(4), r.getString(5)))
      .sortBy(_._1)
    assert(got(0) == ((0L, 1, 0, "user", "<|user|>signup k=7")))
    assert(got(1) == ((1L, 1, 1, "assistant", "<|assistant|>click k=42")))
    assert(got(2) == ((2L, 2, 0, "user", "<|user|>purchase k=3")))
    assert(got(3) == ((3L, 1, 0, "user", "<|user|>error k=99")))
  }

  test("renderConversations: transcript joins turns in order; gate on chars") {
    val df = eventsDf(Seq(ev(0, 1, 0, "signup", 7), ev(1, 1, 10, "click", 42)))
    val row = Dialogue.renderConversations(df, maxChars = 32).collect().head
    assert(row.getAs[String]("transcript") ==
      "<|user|>signup k=7\n<|assistant|>click k=42")
    assert(row.getAs[Int]("n_turns") == 2)
    assert(row.getAs[Long]("n_chars") == 42L)
    assert(!row.getAs[Boolean]("fits_context"))
    // a single-turn session fits
    val one = Dialogue.renderConversations(
      eventsDf(Seq(ev(0, 1, 0, "signup", 7)))).collect().head
    assert(one.getAs[Boolean]("fits_context"))
  }

  test("lossMaskSpans: spans reassemble the transcript exactly; loss = assistant") {
    // three-turn session with varying turn lengths (event types + k digits)
    val df = eventsDf(Seq(
      ev(0, 1, 0, "signup", 7), ev(1, 1, 10, "purchase", 42),
      ev(2, 1, 20, "error", 5)))
    val transcript = Dialogue.renderConversations(df, maxChars = 1000)
      .collect().head.getAs[String]("transcript")
    val spans = Dialogue.lossMaskSpans(df).collect()
      .map(r => (r.getInt(2), r.getString(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(7)))
      .sortBy(_._1)
    // spans tile [0, len) with one separator char between turns
    assert(spans.head._4 == 0L)
    for (Array(a, b) <- spans.sliding(2)) assert(b._4 == a._5 + 1)
    assert(spans.last._5 == transcript.length.toLong)
    // each span cuts its own turn text back out of the transcript
    for ((_, role, n, s, e, loss) <- spans) {
      val cut = transcript.substring(s.toInt, e.toInt)
      assert(cut.length.toLong == n)
      assert(cut.startsWith("<|" + role + "|>"))
      assert(loss == (role == "assistant"))
    }
    assert(spans.map(_._2).toSeq == Seq("user", "assistant", "user"))
  }

  test("preferencePairs: best-k pairs worst-k, disjoint, margin round-6") {
    val scored = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.5), ("a", 4L, 0.2),
      ("a", 5L, 0.1),                       // n=5 -> 2 pairs (2k <= 5)
      ("b", 6L, 0.7),                       // n=1 -> no pairs
      ("c", 7L, 0.6), ("c", 8L, 0.4))       // n=2 -> 1 pair
      .toDF("source", "doc_id", "quality_score")
    val got = Dialogue.preferencePairs(scored).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(6)))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == Seq(
      ("a", 1, 1L, 5L, 0.8), ("a", 2, 2L, 4L, 0.6), ("c", 1, 7L, 8L, 0.2)))
    // chosen and rejected sides never share a document
    val ch = got.map(_._3).toSet; val rj = got.map(_._4).toSet
    assert(ch.intersect(rj).isEmpty)
  }

  test("preferencePairs: score ties break on doc_id from both ends") {
    val scored = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.5), ("a", 3L, 0.5), ("a", 4L, 0.5))
      .toDF("source", "doc_id", "quality_score")
    val got = Dialogue.preferencePairs(scored, maxPairs = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // top ranks ascending doc_id, bottom ranks descending doc_id
    assert(got.toSeq == Seq((1, 1L, 4L), (2, 2L, 3L)))
  }

  test("dedupConversations: identical transcripts keep the smallest (user, session)") {
    // users 2 and 5 produce the SAME single-turn transcript; user 5 also
    // has a distinct one in a later session
    val df = eventsDf(Seq(
      ev(0, 5, 0, "signup", 7), ev(1, 2, 10, "signup", 7),
      ev(2, 5, 60, "click", 9)))
    val got = Dialogue.dedupConversations(df).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2))
    // session ids are 1-based (the q33 running-sum convention)
    assert(got.toSeq == Seq((2L, 1, 2L), (5L, 2, 1L)))
  }

  test("packConversations: dups and oversize drop; offsets run per shard") {
    val df = eventsDf(Seq(
      ev(0, 5, 0, "signup", 7),                            // (5,1): shard 6, 18 chars
      ev(1, 13, 0, "signup", 7),                           // duplicate of ^, dropped
      ev(2, 5, 60, "click", 9), ev(3, 5, 70, "click", 9),  // 2-turn, 40 chars > gate
      ev(4, 13, 90, "error", 1)))                          // (13,2): shard 7, 17 chars
    val got = Dialogue.packConversations(df, maxChars = 24, shards = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
      .sortBy(p => (p._3, p._1))
    // only the two unique, fitting conversations pack
    assert(got.length == 2)
    val Seq(a, b) = got.toSeq
    assert(a._1 == 5L && a._3 == 6 && a._4 == 18L && a._5 == 0L &&
      a._6 == 6L * (1L << 48) && !a._7)
    assert(b._1 == 13L && b._3 == 7 && b._4 == 17L && b._5 == 0L &&
      b._6 == 7L * (1L << 48) && !b._7)
  }

  test("fewShotPrompts: similar exemplars rank first, query last with blank label") {
    val docs = Seq(
      (100L, "alpha beta gamma", "qsrc"),      // the held-out query (id % 100 = 0)
      (1L, "alpha beta gamma", "srcA"),        // identical -> rank 1
      (2L, "alpha beta delta", "srcB"),        // 2/3 overlap -> rank 2
      (3L, "zz yy xx", "srcC"))                // disjoint terms -> no bucket hit
      .toDF("doc_id", "text", "source")
    // maxDocFrequency = 1.0 disables the pool-df guard: with a 3-passage
    // pool, f = 0.05 would mark EVERY bucket hot (f·n < 1) — the guard is
    // a corpus-scale tool, exercised separately below
    val got = Dialogue.fewShotPrompts(docs, k = 2, snippetChars = 40,
      maxDocFrequency = 1.0).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("query_id") == 100L)
    assert(r.getAs[Int]("n_exemplars") == 2)
    assert(r.getAs[String]("prompt") ==
      "Input: alpha beta gamma\nLabel: srcA\n\n" +
      "Input: alpha beta delta\nLabel: srcB\n\n" +
      "Input: alpha beta gamma\nLabel:")
    // the query document itself is never an exemplar (disjoint split)
    assert(!r.getAs[String]("prompt").contains("qsrc"))
  }

  test("invertedRetrievalTopK: pool-df guard drops stop-buckets from both sides") {
    import graft.operators.Similarity
    // 'the' is in every pool passage (df = 5/5); the content words are in
    // exactly one each. At maxDocFrequency = 0.5 the 'the' bucket is hot:
    // without the guard, query [the alpha] would score against ALL five
    // passages; with it, only the alpha passage shares a bucket.
    val pool = (1 to 5).map(i => (i.toLong, 0L, s"the word$i " * 1 + (if (i == 1) "alpha" else "")))
      .toDF("doc_id", "chunk_id", "chunk_text")
    val queries = Seq((100L, "the alpha")).toDF("query_id", "text")
    val guarded = Similarity.invertedRetrievalTopK(pool, queries, k = 5,
      maxDocFrequency = 0.5)
    val got = guarded.collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L),
      "only the passage sharing a non-hot bucket may surface")
    // the df guard runs as its own aggregation over a RECOMPUTED profile —
    // the r13 leak shape (a .cache()'d profile feeding the join, pinned in
    // executor storage past the call) would surface in this plan as an
    // InMemoryTableScan. A plan assert instead of getPersistentRDDs: the
    // SparkContext is shared across concurrently-running suites, so
    // global cache-registry state is not this test's to assert on.
    assert(!guarded.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "invertedRetrievalTopK must not cache its bucket profile")
    // guard disabled: every passage shares the 'the' bucket and surfaces
    val all = Similarity.invertedRetrievalTopK(pool, queries, k = 5,
      maxDocFrequency = 1.0).collect()
    assert(all.length == 5)
  }

  test("spans tile every session on the real corpus slice") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val bad = Dialogue.lossMaskSpans(events)
      .groupBy("user_id", "session_id")
      .agg(min("char_start").as("s0"),
        max("char_end").as("e1"),
        sum(col("n_chars") + 1).as("covered"))
      .filter(col("s0") =!= 0 || col("e1") =!= col("covered") - 1)
      .count()
    assert(bad == 0L)
  }

  test("tokenLossMasks: hand-tokenized counts under the pinned vocabulary") {
    // <|user|>signup k=7 — words user/signup/k:
    //   user    -> 'u' not in base vocab -> [UNK]           = 1
    //   signup  -> s ##i ##g ##n ##up                       = 5
    //   k       -> k                                        = 1  (7 tokens)
    // <|assistant|>click k=42 — assistant -> a ##s ##s ##i ##s ##t ##a
    //   ##n ##t = 9; click -> c ##l ##i ##c ##k = 5; k = 1  (15 tokens)
    val df = eventsDf(Seq(ev(0, 1, 0, "signup", 7), ev(1, 1, 10, "click", 42)))
    val got = Dialogue.tokenLossMasks(df, SparkEntry.wordPieceVocab).collect()
      .map(r => (r.getInt(2), r.getString(3), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getBoolean(10)))
      .sortBy(_._1)
    assert(got(0) == ((0, "user", 7L, 0L, 7L, false)))
    assert(got(1) == ((1, "assistant", 15L, 7L, 22L, true)))
  }

  test("tokenLossMasks: char spans agree with lossMaskSpans; token spans tile") {
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val tok = Dialogue.tokenLossMasks(events, SparkEntry.wordPieceVocab)
    // the char-offset columns are lossMaskSpans verbatim (same window)
    val charCols = Seq("user_id", "session_id", "turn_idx", "role",
      "n_chars", "char_start", "char_end", "loss").map(col)
    assert(tok.select(charCols: _*)
      .except(Dialogue.lossMaskSpans(events)).isEmpty)
    // token spans tile [0, total) per session and every turn tokenizes
    val bad = tok
      .groupBy("user_id", "session_id")
      .agg(min("tok_start").as("t0"), max("tok_end").as("t1"),
        sum("n_tokens").as("total"), min("n_tokens").as("mn"))
      .filter(col("t0") =!= 0 || col("t1") =!= col("total") || col("mn") <= 0)
      .count()
    assert(bad == 0L)
  }
}
