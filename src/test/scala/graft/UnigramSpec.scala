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

  test("viterbi: supplementary-plane code points stay atomic (no split surrogates)") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 chars
    val t = Map("a" -> -1000000L)
    // fallback must emit the WHOLE character, never half a surrogate pair
    val got = Unigram.viterbi(s"a${clef}a", t, 4)
    assert(got == Seq("a", clef, "a"))
    assert(got.forall(p => !p.exists(Character.isSurrogate) ||
      p.codePointCount(0, p.length) * 2 == p.length))
    // a trained supplementary piece matches as ONE unit of piece length
    val t2 = Map("a" -> -1000000L, clef -> -1000000L,
      s"$clef$clef" -> -1500000L)
    assert(Unigram.viterbi(s"$clef$clef", t2, 2) == Seq(s"$clef$clef"))
  }

  test("viterbi: tie-break follows UTF-8 byte order where UTF-16 disagrees") {
    val clef = new String(Character.toChars(0x1D11E)) // UTF-8 f0 9d 84 9e
    val pua = "�" // U+FFFD: UTF-16 sorts ABOVE surrogates, UTF-8 below 4-byte seqs
    // two equal-score parses of the 2-unit word pua+clef:
    //   split path  = pua SEP clef SEP
    //   whole path  = (pua+clef) SEP
    // first difference is SEP (0x01) vs clef's lead byte — split always
    // wins under byte order, matching DuckDB's ORDER BY path
    val t = Map(pua -> -1000000L, clef -> -1000000L,
      (pua + clef) -> -2000000L)
    assert(Unigram.viterbi(pua + clef, t, 2) == Seq(pua, clef))
    // and between two single-piece parses differing only in that char
    // position, the table/sort order is UTF-8: U+FFFD (ef bf bd) < U+1D11E
    // (f0 9d 84 9e) even though Java compareTo says the opposite
    assert(Unigram.utf8Order.lt(pua, clef) && pua.compareTo(clef) > 0)
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

  test("distributed training == driver training (and the pinned table)") {
    // the open-vocabulary scale path: weighted char counts, seed counts
    // and per-round Viterbi usage all as Spark aggregations — must be
    // table-identical to the driver trainer wherever its cap doesn't bind
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(Unigram.trainPiecesDistributed(docs, vocabSize = 24) ==
      Unigram.trainPieces(docs, vocabSize = 24))
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
