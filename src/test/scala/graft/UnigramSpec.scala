package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram

class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("viterbi: max-likelihood segmentation picks the single-piece parse") {
    // lp(ab) = -1.5 beats lp(a)+lp(b) = -2.0
    val t = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -1500000L)
    assert(Unigram.viterbi("ab", t, 4) == Seq("ab"))
    assert(Unigram.viterbi("aab", t, 4) == Seq("a", "ab"))
  }

  test("viterbi: equal scores tie-break on the lexicographically smaller path") {
    // lp(ab) = lp(a)+lp(b) = -2.0: path "a<sep>b<sep>" < "ab<sep>"
    // (the separator sorts below every letter), so the split parse wins —
    // the same ORDER BY score DESC, path the oracle runs
    val t = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(Unigram.viterbi("ab", t, 4) == Seq("a", "b"))
  }

  test("viterbi: unknown characters fall back at the unk floor; empty word = no pieces") {
    val t = Map("a" -> -1000000L)
    assert(Unigram.viterbi("axa", t, 4) == Seq("a", "x", "a"))
    assert(Unigram.viterbi("", t, 4) == Seq.empty)
    // a multi-char candidate NOT in the table never matches (no multi-char unk)
    assert(Unigram.viterbi("xx", t, 4) == Seq("x", "x"))
  }

  test("viterbi: respects maxPieceLen even when a longer piece is in the table") {
    val t = Map("a" -> -1000000L, "aaaa" -> -1000L)
    assert(Unigram.viterbi("aaaa", t, 2) == Seq("a", "a", "a", "a"))
    assert(Unigram.viterbi("aaaa", t, 4) == Seq("aaaa"))
  }

  test("trainFromCounts: deterministic, keeps all chars, respects vocab target") {
    val wc = Seq("abab" -> 10L, "ab" -> 5L, "cd" -> 3L, "abcd" -> 2L)
    val t1 = Unigram.trainFromCounts(wc, vocabSize = 2, maxPieceLen = 4,
      emRounds = 4, seedSize = 64)
    val t2 = Unigram.trainFromCounts(wc, vocabSize = 2, maxPieceLen = 4,
      emRounds = 4, seedSize = 64)
    assert(t1 == t2) // bit-identical retraining
    val pieces = t1.map(_._1)
    assert(Seq("a", "b", "c", "d").forall(pieces.contains)) // char coverage
    assert(pieces.count(_.length > 1) <= 2) // multi-char budget respected
    assert(t1 == t1.sortBy(_._1)) // canonical ordering
  }

  test("the pinned q171/q172 piece table reproduces under retraining on sf0.01") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(Unigram.trainPieces(docs, vocabSize = 24) == SparkEntry.unigramPieces)
  }

  test("writePieces/loadPieces: the pinned table round-trips through parquet exactly") {
    val dir = java.nio.file.Files.createTempDirectory("unigram_rt").toFile
    try {
      Unigram.writePieces(spark, SparkEntry.unigramPieces, dir.getAbsolutePath)
      assert(Unigram.loadPieces(spark, dir.getAbsolutePath) == SparkEntry.unigramPieces)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("tokenCounts: hand corpus — distinct-word dictionary counts occurrences") {
    // pinned-table sanity on real corpus words: customer = cust+omer (2),
    // window has no multi-char cover (6 singles)
    val fx = Seq((0L, "customer window customer"), (1L, "join")).toDF("doc_id", "text")
    val got = Unigram.tokenCounts(fx, SparkEntry.unigramPieces).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) == ((3L, 2L + 6L + 2L)))
    assert(got(1L) == ((1L, 1L))) // 'join' is a single piece
  }
}
