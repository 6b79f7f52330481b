package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (the BERT family; Wu et al. 2016, Devlin et al.
  * 2019): the THIRD production subword tokenizer beside [[Bpe]] and
  * [[Unigram]] — every BERT-lineage encoder ships one. Where BPE applies
  * learned merges in rank order and unigram-LM runs a Viterbi DP,
  * WordPiece inference is GREEDY LONGEST-MATCH-FIRST against a vocabulary
  * set: at each position take the longest piece the vocabulary contains
  * (non-initial pieces carry the `##` continuation prefix), and if no
  * piece matches — or the word exceeds `maxInputChars` — the ENTIRE word
  * becomes one `[UNK]` token (the public BERT `WordpieceTokenizer`
  * semantics: "unaffable" → `["un", "##aff", "##able"]`; a word whose
  * continuation is missing from the vocabulary yields `["[UNK]"]`, not a
  * partial split).
  *
  * TRAINING is the public WordPiece objective (documented in the
  * HuggingFace tokenizers course, ch. 6): like BPE, repeatedly merge the
  * best adjacent symbol pair in the word-frequency dictionary, but score
  * pairs by count(l,r) / (count(l) · count(r)) — pairs whose PARTS are
  * individually rare merge first — instead of raw pair count. On the
  * course's own corpus (hug×10, pug×5, pun×12, bun×4, hugs×5) the first
  * merge is ("##g","##s") at score 1/20 — pinned as ground truth in
  * WordPieceSpec. Scores are compared as EXACT RATIONALS (BigInt
  * cross-multiplication — no float ever decides a merge), ties broken by
  * the UTF-8-lexicographically smallest (l, r), the [[Unigram.utf8Order]]
  * cross-engine collation.
  *
  * 100 TB shape (the [[Bpe]] posture): the driver trainer runs over the
  * bounded (word, count) dictionary; [[trainVocabDistributed]] keeps the
  * dictionary a DataFrame with NO cap and runs every corpus-shaped
  * aggregation in Spark — only the pair-count and symbol-count tables
  * reach the driver, and both are bounded by the SYMBOL alphabet
  * ((|chars| + merges)² worst case, corpus-size-independent), the
  * [[Unigram.trainPiecesDistributed]] bounded-collect posture. INFERENCE
  * tokenizes each DISTINCT word once over a broadcast vocabulary set and
  * broadcast-joins the per-word counts onto per-doc word groups.
  *
  * Determinism contract (what the SQL oracle replays): greedy
  * longest-match is a pure function of the vocabulary SET — no ranks, no
  * probabilities — so the oracle replays it with a vocabulary list
  * literal generated from the same pinned constant: one piece per
  * recursion level, `list_max` over the matching lengths = the longest
  * match, `[UNK]` collapse and the `maxInputChars` cap included. Words
  * segment on CODE POINTS ([[Unigram]]'s Unicode contract — DuckDB
  * `substring`/`length` count code points, so both engines slice
  * identically beyond the BMP; a piece boundary never splits a surrogate
  * pair). An empty word (consecutive separators) is ZERO tokens.
  */
object WordPiece {

  /** The BERT `[UNK]` token and per-word length cap (200 in the public
    * BERT implementation; words longer than the cap become `[UNK]`
    * without attempting a match). */
  val unkToken: String = "[UNK]"
  val maxInputChars: Int = 200

  private def cpOffsets(w: String): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](w.length + 1)
    var i = 0
    while (i < w.length) { buf += i; i = w.offsetByCodePoints(i, 1) }
    buf += w.length
    buf.toArray
  }

  /** Word → WordPiece training symbols: first code point bare, every
    * later code point with the `##` continuation prefix. */
  private[graft] def toSymbols(word: String): Array[String] = {
    val off = cpOffsets(word)
    Array.tabulate(off.length - 1) { k =>
      val cp = word.substring(off(k), off(k + 1))
      if (k == 0) cp else "##" + cp
    }
  }

  /** Merged symbol for adjacent pair (l, r): r is always a continuation
    * (only position-0 symbols lack `##`), and the merge keeps l's
    * position class. */
  private def mergedSymbol(l: String, r: String): String =
    l + r.stripPrefix("##")

  /** Exact-rational argmax over pair scores count(l,r)/(count(l)·count(r)):
    * cross-multiplied BigInt comparison (no float decides a merge), ties
    * to the UTF-8-smallest (l, r). Shared verbatim by the driver and
    * distributed trainers, so their merge choices cannot drift. */
  private def bestPair(pairCounts: collection.Map[(String, String), Long],
      symCounts: collection.Map[String, Long]): Option[(String, String)] = {
    if (pairCounts.isEmpty) return None
    val ord = Unigram.utf8Order
    var best: (String, String) = null
    var bestNum = BigInt(0)
    var bestDen = BigInt(1)
    for (((l, r), c) <- pairCounts) {
      val num = BigInt(c)
      val den = BigInt(symCounts(l)) * BigInt(symCounts(r))
      val cmp = (num * bestDen).compare(bestNum * den)
      val better = best == null || cmp > 0 ||
        (cmp == 0 && {
          val cl = ord.compare(l, best._1)
          cl < 0 || (cl == 0 && ord.compare(r, best._2) < 0)
        })
      if (better) { best = (l, r); bestNum = num; bestDen = den }
    }
    Some(best)
  }

  /** Non-overlapping left-to-right replacement of (l, r) with the merged
    * symbol — the training-side step (identical shape to BPE's). */
  private def mergeAll(toks: Array[String], l: String, r: String): Array[String] = {
    val m = mergedSymbol(l, r)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += m; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Train a WordPiece vocabulary: base symbols (every initial /
    * `##`-continuation code point in the dictionary) plus `numMerges`
    * merged pieces. Returns the vocabulary SET sorted by UTF-8 bytes — a
    * pinnable constant (the [[graft.SparkEntry.bpeMerges]] convention);
    * greedy inference depends only on the set, never on merge order. */
  def trainVocab(docs: DataFrame, numMerges: Int,
      maxVocabWords: Int = 1 << 16): Seq[String] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    trainFromCounts(Bpe.collectWordCounts(docs, maxVocabWords), numMerges)
  }

  /** Driver-side trainer over a (word, count) dictionary. */
  private[graft] def trainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[String] = {
    var words = wordCounts.map { case (w, c) => (toSymbols(w), c) }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    for ((toks, _) <- words; t <- toks) vocab += t
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((toks, c) <- words) {
        for (t <- toks) symCounts.updateWith(t)(v => Some(v.getOrElse(0L) + c))
        for (i <- 0 until toks.length - 1)
          pairCounts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      }
      bestPair(pairCounts, symCounts) match {
        case None => exhausted = true
        case Some((l, r)) =>
          vocab += mergedSymbol(l, r)
          words = words.map { case (toks, c) => (mergeAll(toks, l, r), c) }
          learned += 1
      }
    }
    vocab.toSeq.sorted(Unigram.utf8Order)
  }

  /** DISTRIBUTED WordPiece training — the open-vocabulary scale path: the
    * (word, count) dictionary stays a DataFrame with no cap; each round's
    * pair counts and symbol counts are Spark aggregations (one explode +
    * one shuffle each over the vocabulary-sized table, never the corpus),
    * and only those two SYMBOL-ALPHABET-bounded tables reach the driver,
    * where [[bestPair]] — the same exact-rational argmax the driver
    * trainer uses — picks the merge. The evolving dictionary is
    * localCheckpoint-pinned per round so the UDF chain never replays.
    * Equivalence with [[trainVocab]] on driver-cap-sized corpora is
    * pinned by WordPieceSpec. */
  def trainVocabDistributed(docs: DataFrame, numMerges: Int): Seq[String] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val symbolize = udf((w: String) => toSymbols(w).toSeq)
    var cur = TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symbolize(col("word")).as("toks"), col("cnt"))
      .localCheckpoint()
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    vocab ++= cur.select(explode(col("toks")).as("t")).distinct()
      .collect().map(_.getString(0)).sorted(Unigram.utf8Order)
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val symCounts = cur.select(explode(col("toks")).as("t"), col("cnt"))
        .groupBy("t").agg(sum("cnt").as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val pairCounts = cur.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          expr("slice(toks, 1, size(toks) - 1)"),
          expr("slice(toks, 2, size(toks) - 1)"),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      bestPair(pairCounts, symCounts) match {
        case None => exhausted = true
        case Some((l, r)) =>
          vocab += mergedSymbol(l, r)
          learned += 1
          if (learned < numMerges) {
            val applyMerge = udf((toks: Seq[String]) =>
              mergeAll(toks.toArray, l, r).toSeq)
            val next = cur
              .select(applyMerge(col("toks")).as("toks"), col("cnt"))
              .localCheckpoint()
            cur.unpersist(blocking = false)
            cur = next
          }
      }
    }
    cur.unpersist(blocking = false)
    vocab.toSeq.sorted(Unigram.utf8Order)
  }

  /** Content length (code points, `##` prefix excluded) of the longest
    * vocabulary piece — the greedy lookahead bound, derived from the
    * table (the [[Unigram.tokenCounts]] no-mismatched-knob rule). */
  private def maxPieceLen(vocab: Iterable[String]): Int =
    vocab.iterator.map { p =>
      val c = p.stripPrefix("##")
      c.codePointCount(0, c.length)
    }.maxOption.getOrElse(1).max(1)

  /** The distinct-word tokenization dictionary (word, n_wp, is_unk)
    * under a pinned vocabulary — each word of `words` (a `word` column,
    * pre-distincted by the caller) runs [[tokenize]] ONCE against the
    * broadcast vocabulary set. [[tokenCounts]] and
    * [[graft.operators.Dialogue.tokenLossMasks]] both broadcast-join
    * this dictionary onto their fact streams. */
  private[graft] def wordTokenDict(words: DataFrame,
      vocab: Seq[String]): DataFrame = {
    val spark = words.sparkSession
    val maxLen = maxPieceLen(vocab)
    val bcVocab = spark.sparkContext.broadcast(vocab.toSet)
    val tok = udf { (w: String) =>
      val ts = tokenize(w, bcVocab.value, maxLen)
      Seq(ts.length.toLong,
        if (ts.length == 1 && ts(0) == unkToken) 1L else 0L)
    }
    words.withColumn("__t", tok(col("word")))
      .select(col("word"),
        col("__t").getItem(0).as("n_wp"),
        col("__t").getItem(1).as("is_unk"))
  }

  /** Greedy longest-match-first tokenization of one word — the public
    * BERT `WordpieceTokenizer` algorithm: longest vocabulary piece at
    * each position (`##`-prefixed after position 0); any position with no
    * match, or a word over [[maxInputChars]] code points, collapses the
    * WHOLE word to `[UNK]`. Empty word → zero tokens. */
  private[graft] def tokenize(word: String, vocab: Set[String],
      maxLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    val off = cpOffsets(word)
    val n = off.length - 1
    if (n > maxInputChars) return Array(unkToken)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var matched: String = null
      while (l >= 1 && matched == null) {
        val sub = word.substring(off(i), off(i + l))
        val cand = if (i == 0) sub else "##" + sub
        if (vocab.contains(cand)) matched = cand else l -= 1
      }
      if (matched == null) return Array(unkToken)
      out += matched
      i += l
    }
    out.result()
  }

  /** Per-document tokenizer-faithful counts under a pinned vocabulary:
    * (doc_id, n_words, n_wp_tokens, n_unk) — [[Bpe.tokenCounts]]'s exact
    * distributed shape (distinct words tokenized once over the broadcast
    * vocabulary set, dictionary broadcast-joined onto per-doc word
    * groups). `n_unk` counts word OCCURRENCES that collapsed to `[UNK]`
    * (each contributes exactly 1 token) — the out-of-vocabulary signal a
    * tokenizer report cares about. */
  def tokenCounts(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val dict = wordTokenDict(
      TextAnalysis.withWords(docs)
        .select(explode(col("__words")).as("word"))
        .distinct(),
      vocab)
    val docWord = TextAnalysis.withWords(docs)
      .select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    docWord.join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"),
        sum(col("n") * col("n_wp")).as("n_wp_tokens"),
        sum(col("n") * col("is_unk")).as("n_unk"))
  }

  /** Sequence packing budgeted in WordPiece tokens —
    * [[graft.operators.TextAnalysis.packSequences]]'s layout contract
    * (sharded streams, per-shard running sum, globally unique seq ids)
    * with the token column swapped for this tokenizer's count, completing
    * the per-tokenizer packing triple beside [[Bpe.packSequencesBpe]] and
    * [[Unigram.packSequencesUnigram]]: whichever tokenizer a pipeline
    * trains, its packing budgets in the SAME tokens ([UNK] counts 1,
    * exactly as the model would see it). */
  def packSequencesWordPiece(docs: DataFrame, vocab: Seq[String],
      maxTokens: Int = 2048, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    tokenCounts(docs, vocab)
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).cast("int").as("shard"),
        col("n_wp_tokens").as("n_tokens"))
      .withColumn("start_off",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("local_seq", floor(col("start_off") / maxTokens).cast("long"))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
        (col("shard").cast("long") * (1L << 48) + col("local_seq")).as("seq_id"),
        (col("local_seq") =!=
          floor((col("start_off") + col("n_tokens") - 1) / maxTokens).cast("long"))
          .as("crosses_boundary"))
  }

  /** WordPiece fertility + out-of-vocabulary rate by corpus slice —
    * [[Bpe.fertilityReport]]'s twin plus the UNK dimension BPE/unigram
    * don't have (their alphabets cover everything; a WordPiece vocabulary
    * can miss, and a slice with a high `unk_rate_micro` is a slice this
    * vocabulary cannot represent — the diagnostic that catches a
    * vocabulary trained on the wrong language mix). Integer-exact
    * micro-unit ratios, one slice-keyed shuffle of four longs per doc. */
  def fertilityReport(docs: DataFrame, vocab: Seq[String],
      sliceCol: String = "source"): DataFrame =
    tokenCounts(docs, vocab)
      .join(docs.select(col("doc_id"), col(sliceCol)), "doc_id")
      .groupBy(sliceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_wp_tokens").as("n_wp_tokens"),
        sum("n_unk").as("n_unk"))
      .withColumn("wp_fertility_micro",
        expr("(1000000 * n_wp_tokens) div n_words"))
      .withColumn("unk_rate_micro",
        expr("(1000000 * n_unk) div n_words"))
}
