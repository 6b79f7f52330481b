package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainFromCounts learns frequency-ordered merges and stops when exhausted") {
    // aaab×3 + ab×2: pair counts round 1 are (a,a)=6, (a,b)=5 → learn (a,a);
    // round 2 (a,b)=5 beats (aa,a)=3; round 3 only (aa,ab)=3 remains; then
    // every word is a single symbol and training exhausts early.
    val merges = Bpe.trainFromCounts(Seq("aaab" -> 3L, "ab" -> 2L), numMerges = 10)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("trainFromCounts tie-breaks equal pair counts lexicographically") {
    val merges = Bpe.trainFromCounts(Seq("ba" -> 1L, "cb" -> 1L), numMerges = 1)
    assert(merges == Seq(("b", "a")))
  }

  test("symbols are code points and tie-breaks are UTF-8 order beyond the BMP") {
    // 𝄞 (U+1D11E, a surrogate pair in UTF-16) must stay ONE symbol —
    // matching DuckDB's per-character string_split and keeping every
    // symbol valid UTF-8 for the distributed trainer
    assert(Bpe.tokenize("a𝄞b", Map.empty).toSeq ==
      Seq("a", "𝄞", "b"))
    // tie-break: ("Ａ", …) vs ("𝄞", …) — Java compareTo says the
    // supplementary char (surrogate 0xD834) sorts BELOW U+FF21, but its
    // UTF-8 bytes (F0 9D …) sort ABOVE (EF BC A1); the driver must pick
    // the UTF-8-smaller pair, as Spark's orderBy would
    val merges = Bpe.trainFromCounts(
      Seq("Ａa" -> 1L, "𝄞a" -> 1L), numMerges = 1)
    assert(merges == Seq(("Ａ", "a")))
  }

  test("tokenize merges leftmost lowest-rank pairs, matching the oracle's step") {
    val ranks = Seq(("a", "a"), ("a", "b"), ("aa", "ab")).zipWithIndex.toMap
    assert(Bpe.tokenize("aaab", ranks).toSeq == Seq("aaab"))
    assert(Bpe.tokenize("aab", ranks).toSeq == Seq("aa", "b"))
    // leftmost (a,a) fires inside the word; the b prefix merges with nothing
    assert(Bpe.tokenize("baaab", ranks).toSeq == Seq("b", "aaab"))
    assert(Bpe.tokenize("c", ranks).toSeq == Seq("c"))
    // empty word (double-space upstream) = ONE token, matching DuckDB's
    // string_split('','') = [''] so oracle counts can't diverge
    assert(Bpe.tokenize("", ranks).toSeq == Seq(""))
  }

  test("distributed pair-count training == driver training on both alphabets") {
    // the open-vocabulary scale path must be semantics-identical to the
    // driver trainer wherever the driver's dictionary cap doesn't bind —
    // same pair weighting, same lexicographic tie-break, same replacement
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(Bpe.trainMergesDistributed(docs, numMerges = 8) ==
      Bpe.trainMerges(docs, numMerges = 8))
    assert(Bpe.trainMergesDistributed(docs, numMerges = 6, byteLevel = true) ==
      Bpe.trainMergesBytes(docs, numMerges = 6))
  }

  test("published ground truth: Sennrich 2016's char-BPE example segments lowest -> low + est") {
    // Independent of this engine: the canonical worked example of the BPE
    // paper (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
    // Rare Words with Subword Units"). Its learned merges over the corpus
    // {low:5, lower:2, newest:6, widest:3} are, in order: (e,s), (es,t),
    // then the l/o/w composition — and the paper's own illustration is
    // that the unseen word "lowest" segments as low + est. Expected
    // outputs below are derived BY HAND from the published greedy
    // lowest-rank merge procedure over this pinned list — never by
    // running this engine.
    val ranks = Map(("e", "s") -> 0, ("es", "t") -> 1,
      ("l", "o") -> 2, ("lo", "w") -> 3)
    assert(Bpe.tokenize("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.tokenize("newest", ranks).toSeq == Seq("n", "e", "w", "est"))
    assert(Bpe.tokenize("widest", ranks).toSeq == Seq("w", "i", "d", "est"))
    assert(Bpe.tokenize("lower", ranks).toSeq == Seq("low", "e", "r"))
  }

  test("published ground truth: GPT-2-shaped byte merge list tokenizes ' the' to one token") {
    // The GPT-2 tokenizer (Radford et al. 2019; public gpt2 merges.txt)
    // opens with byte-level merges spelled over its remapped byte
    // alphabet: 'Ġ t', 'Ġ a', 'h e', 'i n', 'r e', 'o n', 'Ġt he', 'e r',
    // 'Ġ s', 'a t' — Ġ being the 0x20 space byte. The same ranks in this
    // engine's hex-byte alphabet (Ġ=20, t=74, a=61, h=68, e=65, i=69,
    // n=6E, r=72, o=6F, s=73):
    val ranks = Map(
      ("20", "74") -> 0, // Ġ t
      ("20", "61") -> 1, // Ġ a
      ("68", "65") -> 2, // h e
      ("69", "6E") -> 3, // i n
      ("72", "65") -> 4, // r e
      ("6F", "6E") -> 5, // o n
      ("2074", "6865") -> 6, // Ġt he
      ("65", "72") -> 7, // e r
      ("20", "73") -> 8, // Ġ s
      ("61", "74") -> 9) // a t
    // hand-derived per the published greedy procedure (always merge the
    // lowest-rank adjacent pair): " the" -> Ġt|h|e -> Ġt|he -> Ġthe,
    // GPT-2's famous single token for the space-prefixed article
    assert(Bpe.tokenizeBytes(" the", ranks).toSeq == Seq("20746865"))
    // "in" is a single learned token; " at" stops at Ġa|t because rank 1
    // (Ġ a) beats rank 9 (a t) on the shared 'a', and no (Ġa, t) merge is
    // in this prefix of the list
    assert(Bpe.tokenizeBytes("in", ranks).toSeq == Seq("696E"))
    assert(Bpe.tokenizeBytes(" at", ranks).toSeq == Seq("2061", "74"))
    // "there": t|he|re after ranks 2 and 4; no (74,6865)/(6865,7265)
    // merges exist in the prefix, so three tokens remain
    assert(Bpe.tokenizeBytes("there", ranks).toSeq == Seq("74", "6865", "7265"))
  }

  test("tokenCounts budgets double-space empty words like the oracle would") {
    val docs = Seq((0L, "a  b")).toDF("doc_id", "text") // split → ["a","","b"]
    val r = Bpe.tokenCounts(docs, Seq(("a", "b"))).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((3L, 3L))) // 3 words incl. the empty one, 3 BPE tokens
  }

  test("the pinned q87/q88 merge table reproduces under retraining on sf0.01") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert(Bpe.trainMerges(docs, numMerges = 24) == SparkEntry.bpeMerges)
  }

  test("the pinned q93 byte-merge table reproduces under retraining on sf0.01") {
    val docs = SparkEntry.accentedDocuments(spark, "/root/testdata/sf0.01")
    assert(Bpe.trainMergesBytes(docs, numMerges = 24) == SparkEntry.bpeByteMerges)
  }

  test("byte symbols are uppercase hex UTF-8 bytes; multi-byte chars split") {
    assert(Bpe.toByteSymbols("ab").toSeq == Seq("61", "62"))
    assert(Bpe.toByteSymbols("café").toSeq == Seq("63", "61", "66", "C3", "A9"))
    assert(Bpe.toByteSymbols("").isEmpty)
  }

  test("tokenizeBytes: empty word is ZERO tokens (byte convention), merges apply") {
    val ranks = Seq(("61", "62"), ("C3", "A9")).zipWithIndex.toMap
    assert(Bpe.tokenizeBytes("", ranks).isEmpty)
    assert(Bpe.tokenizeBytes("ab", ranks).toSeq == Seq("6162"))
    // é's two bytes merge under rank 1; the c/a/f prefix stays unmerged
    assert(Bpe.tokenizeBytes("café", ranks).toSeq == Seq("63", "61", "66", "C3A9"))
  }

  test("byteTokenCounts diverges from char counts exactly on non-ASCII words") {
    // 'né' = 3 bytes (6E C3 A9): char alphabet sees 2 symbols, byte sees 3;
    // with no merges the byte count is the UTF-8 byte length per word
    val docs = Seq((0L, "né ok"), (1L, "ok")).toDF("doc_id", "text")
    val r = Bpe.byteTokenCounts(docs, Seq.empty).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((2L, 5L))) // né=3 bytes + ok=2 bytes
    assert(r(1L) == ((1L, 2L)))
  }

  test("tokenCounts sums per-word BPE counts weighted by occurrences") {
    val docs = Seq((0L, "the the cat"), (1L, "th e")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val r = Bpe.tokenCounts(docs, merges).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == ((3L, 5L))) // the=1 token ×2, cat=3 tokens
    assert(r(1L) == ((2L, 2L))) // th=1, e=1
  }

  test("fertilityReport: per-source integer-exact tokens-per-word micro ratio") {
    val docs = Seq(
      (0L, "the the cat", "s0"), // 3 words, 5 tokens (the=1 ×2, cat=3)
      (1L, "th e", "s0"),        // 2 words, 2 tokens
      (2L, "cat", "s1")          // 1 word, 3 tokens
    ).toDF("doc_id", "text", "source")
    val r = Bpe.fertilityReport(docs, Seq(("t", "h"), ("th", "e"))).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      "s0" -> ((2L, 5L, 7L, 1400000L)), // 7/5 words exactly
      "s1" -> ((1L, 1L, 3L, 3000000L))))
  }

  test("packSequencesBpe budgets the stream in BPE tokens") {
    val docs = Seq((0L, "the the the"), (8L, "cat")).toDF("doc_id", "text") // same shard
    val r = Bpe.packSequencesBpe(docs, Seq(("t", "h"), ("th", "e")),
      maxTokens = 4, shards = 8).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3), x.getBoolean(5))).toMap
    assert(r(0L) == ((3L, 0L, false))) // 3 BPE tokens, not 11 chars
    assert(r(8L) == ((3L, 3L, true))) // straddles the 4-token boundary
  }
}
