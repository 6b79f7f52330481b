package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordPiece

class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- published ground truth: the HuggingFace tokenizers-course
  // WordPiece chapter trains on exactly this corpus (hug×10, pug×5,
  // pun×12, bun×4, hugs×5) and derives the FIRST merge by hand:
  // base symbols b,h,p,##g,##n,##s,##u; pair scores c/(c_l·c_r) are all
  // 1/36 except ("##g","##s") = 5/(20·5) = 1/20, so "##gs" merges first.
  private val courseCorpus = Seq(
    ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  test("training ground truth (HF course): first merge is ##g+##s -> ##gs") {
    val v1 = WordPiece.trainFromCounts(courseCorpus, numMerges = 1)
    assert(v1.contains("##gs"))
    // base symbols all present, and NOTHING else merged yet
    assert(v1.toSet ==
      Set("b", "h", "p", "##g", "##n", "##s", "##u", "##gs"))
  }

  test("greedy inference on the course vocab: hugs -> h ##u ##gs") {
    val v = WordPiece.trainFromCounts(courseCorpus, numMerges = 1).toSet
    assert(WordPiece.tokenize("hugs", v, 2).toSeq == Seq("h", "##u", "##gs"))
    assert(WordPiece.tokenize("hug", v, 2).toSeq == Seq("h", "##u", "##g"))
  }

  test("inference ground truth (BERT WordpieceTokenizer docstring): unaffable") {
    // the public BERT reference example: input "unaffable",
    // output ["un", "##aff", "##able"]
    val v = Set("un", "##aff", "##able", "u", "##n")
    assert(WordPiece.tokenize("unaffable", v, 4).toSeq ==
      Seq("un", "##aff", "##able"))
  }

  test("whole-word [UNK] collapse (HF course): bum with ##m missing") {
    // b and ##u both match, but ##m is absent — BERT semantics collapse
    // the ENTIRE word, not just the unmatched tail
    val v = Set("b", "##u")
    assert(WordPiece.tokenize("bum", v, 1).toSeq == Seq(WordPiece.unkToken))
    // a word whose FIRST position has no match is [UNK] too
    assert(WordPiece.tokenize("xb", v, 1).toSeq == Seq(WordPiece.unkToken))
  }

  test("greedy is longest-match-FIRST, not leftmost-shortest") {
    // both "w" and "wind" match at position 0 — greedy must take "wind"
    val v = Set("w", "##i", "##n", "##d", "wind", "##ow", "##o", "##w")
    assert(WordPiece.tokenize("window", v, 4).toSeq == Seq("wind", "##ow"))
  }

  test("maxInputChars cap and empty word") {
    val v = Set("a", "##a")
    assert(WordPiece.tokenize("a" * WordPiece.maxInputChars, v, 1).length ==
      WordPiece.maxInputChars)
    assert(WordPiece.tokenize("a" * (WordPiece.maxInputChars + 1), v, 1).toSeq ==
      Seq(WordPiece.unkToken))
    assert(WordPiece.tokenize("", v, 1).isEmpty)
  }

  test("code-point segmentation: supplementary-plane chars stay atomic") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 chars
    val v = Set("a", "##a", clef, "##" + clef)
    val got = WordPiece.tokenize(s"a${clef}a", v, 2)
    assert(got.toSeq == Seq("a", "##" + clef, "##a"))
    // a vocab WITHOUT the supplementary char: whole word collapses
    assert(WordPiece.tokenize(s"a$clef", Set("a", "##a"), 2).toSeq ==
      Seq(WordPiece.unkToken))
  }

  test("exact-rational scores: large counts still produce a deterministic argmax") {
    // score denominators reach c_l·c_r ≈ 10¹⁶ here — past what a float32
    // would resolve and into double-rounding territory; the BigInt
    // cross-multiplication stays exact and retraining is bit-stable
    val big = 100000000L
    val counts = Seq(("ab", 3L), ("x", 6L), ("cd", big), ("y", big * 8))
    val v1 = WordPiece.trainFromCounts(counts, numMerges = 2)
    assert(v1 == WordPiece.trainFromCounts(counts, numMerges = 2))
    // and the higher-scoring pair wins: (c,##d) = 1/10⁸ < (a,##b) = 1/3
    assert(WordPiece.trainFromCounts(counts, numMerges = 1).contains("ab"))
  }

  test("ties break on the UTF-8-smallest (l, r) pair") {
    // symmetric corpus: every pair has the same score; the merge must be
    // the lexicographically smallest — ## prefix (0x23) sorts below letters
    val counts = Seq(("ab", 2L), ("cd", 2L))
    // pairs: (a,##b) and (c,##d), scores equal = 2/(2·2); (a,##b) is smaller
    val v = WordPiece.trainFromCounts(counts, numMerges = 1)
    assert(v.contains("ab") && !v.contains("cd"))
  }

  test("the pinned q188/q189 vocabulary reproduces under retraining on sf0.01") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(WordPiece.trainVocab(docs, numMerges = 24) == SparkEntry.wordPieceVocab)
  }

  test("distributed training == driver training") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(WordPiece.trainVocabDistributed(docs, numMerges = 12) ==
      WordPiece.trainVocab(docs, numMerges = 12))
  }

  test("tokenCounts: hand corpus — counts, UNK occurrences, dictionary reuse") {
    // under the PINNED vocab: 'window' = wind + ##o + ##w (3 tokens);
    // 'zzz' has no 'z' symbol → [UNK] (1 token, counted in n_unk each
    // occurrence); empty-split artifacts don't arise here
    val fx = Seq((0L, "window zzz window"), (1L, "zzz zzz")).toDF("doc_id", "text")
    val got = WordPiece.tokenCounts(fx, SparkEntry.wordPieceVocab).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((3L, 3L + 1L + 3L, 1L)))
    assert(got(1L) == ((2L, 2L, 2L)))
  }

  test("packSequencesWordPiece: budgets in wp tokens, straddle flag exact") {
    // doc 0: 'window window' = 2 x (wind ##o ##w) = 6 wp tokens;
    // doc 8: 'zzz' = [UNK] = 1 token; both shard 0 under shards=8
    val fx = Seq((0L, "window window"), (8L, "zzz")).toDF("doc_id", "text")
    val got = WordPiece.packSequencesWordPiece(fx, SparkEntry.wordPieceVocab,
      maxTokens = 4, shards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0, 6L, 0L, 0L, true),   // tokens 0..5 straddle the 4-boundary
      (8L, 0, 1L, 6L, 1L, false))) // starts in window 1, fits
  }

  test("property: full char coverage never UNKs and pieces reassemble the word") {
    val rnd = new scala.util.Random(41)
    val alphabet = "abcdxy"
    val base = alphabet.map(_.toString) ++ alphabet.map("##" + _)
    for (_ <- 1 to 200) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // random multi-char pieces on top of full single-char coverage
      val extra = (1 to rnd.nextInt(6)).map { _ =>
        val s = (1 to 2 + rnd.nextInt(3))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        if (rnd.nextBoolean()) s else "##" + s
      }
      val vocab = (base ++ extra).toSet
      val toks = WordPiece.tokenize(w, vocab, 5)
      assert(!toks.contains(WordPiece.unkToken))
      assert(toks.map(_.stripPrefix("##")).mkString == w)
      assert(toks.tail.forall(_.startsWith("##")) &&
        !toks.head.startsWith("##"))
    }
  }
}
