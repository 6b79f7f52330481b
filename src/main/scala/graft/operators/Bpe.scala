package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: corpus-trained merge rules and
  * tokenizer-faithful token counts, replacing the chars/4 heuristic of
  * [[TextAnalysis.tokenCounts]] for the budgeting stages (packing, mixing)
  * where a real pipeline counts model tokens, not characters.
  *
  * The algorithm is the public GPT-2-style BPE (Sennrich et al. 2016;
  * Radford et al. 2019 `bpe()`/`get_pairs()`): training repeatedly merges
  * the most frequent adjacent symbol pair in the word-frequency table;
  * encoding applies learned merges to a word in rank order. Symbols here
  * are characters within whitespace-delimited words (no end-of-word
  * marker, no cross-word merges) — the simplification that keeps both
  * engines' whitespace semantics (`split(text, " ")` ==
  * `string_split(text, ' ')`) authoritative, as every other text operator
  * in this package does.
  *
  * 100 TB shape:
  *  - TRAINING never iterates over the corpus: classic BPE trains on the
  *    word-FREQUENCY table, so one exploded word count (map-side combined,
  *    one shuffle on `word`) reduces the corpus to a vocabulary-sized
  *    dictionary — bounded by distinct tokens (~10^5-10^6 for natural
  *    text, Heaps' law), not corpus size — and the merge loop runs on the
  *    driver over that bounded dict, the same bounded-driver-set posture
  *    as the hot-gram guard. `maxVocabWords` caps the collect
  *    deterministically by (count desc, word asc).
  *  - ENCODING tokenizes each DISTINCT word once: the per-doc word groups
  *    (the lmScore frame) join a vocabulary-sized (word → token count)
  *    dictionary by BROADCAST, so the merge loop runs |vocab| times
  *    total, not once per occurrence, and the corpus-sized side shuffles
  *    only for its own (doc_id, word) aggregation.
  *  - The merge loop is a JVM scalar function over a broadcast rank map —
  *    a Scala UDF, justified here because it runs on the vocabulary
  *    dictionary, never the corpus, so codegen on the hot path is
  *    untouched.
  *
  * Determinism: training tie-breaks equal pair counts lexicographically;
  * encoding merges the leftmost occurrence of the lowest-rank pair one
  * step at a time. One-at-a-time is exactly equivalent to the reference
  * merge-all-occurrences formulation: a merge at position p only creates
  * pairs involving the new symbol, and any learned pair containing a
  * merged symbol was necessarily learned LATER (higher rank) than the
  * merge that created the symbol, so the current minimum-rank pair stays
  * minimal until exhausted and its occurrences resolve left to right.
  * The same one-at-a-time step is what the SQL oracle's recursive CTE
  * replays, so Spark and DuckDB agree token for token.
  */
object Bpe {

  /** Train `numMerges` BPE merge rules from the corpus. Returns merges in
    * rank order (earliest = applied first). Deterministic: pair counts tie-
    * break on the lexicographically smallest (left, right); the driver-side
    * dictionary is capped at `maxVocabWords` by (count desc, word asc). */
  def trainMerges(docs: DataFrame, numMerges: Int,
      maxVocabWords: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    trainFromCounts(collectWordCounts(docs, maxVocabWords), numMerges)
  }

  /** BYTE-level training (the GPT-2 convention, Radford et al. 2019): the
    * base alphabet is the word's UTF-8 BYTES, not its characters, so the
    * 256-symbol alphabet covers every input with no OOV and non-ASCII text
    * tokenizes the way a real byte-level tokenizer counts it (é is two
    * base symbols, not one). Symbols are the uppercase two-hex-digit byte
    * spelling — the same strings `hex()` produces in SQL, so an oracle can
    * replay merges over `regexp_extract_all(hex(encode(word)), '..')`
    * verbatim. Same determinism contract as [[trainMerges]]. */
  def trainMergesBytes(docs: DataFrame, numMerges: Int,
      maxVocabWords: Int = 1 << 16): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    trainFromCounts(collectWordCounts(docs, maxVocabWords), numMerges, toByteSymbols)
  }

  /** DISTRIBUTED-pair-count BPE training — the open-vocabulary scale path
    * for corpora whose word dictionary exceeds any driver cap (the one
    * bound the driver-side [[trainMerges]] carries). The (symbols, count)
    * dictionary lives as a DataFrame with NO vocabulary cap; each round
    * counts adjacent pairs with one explode + one shuffle over that
    * vocabulary-sized table (never the corpus — the corpus reduces ONCE
    * to word counts), takes the (count desc, left, right) argmax as a
    * single collected row, and applies the merge executor-side. Rounds
    * are sequential by nature (merge k+1's counts depend on merge k), so
    * cost is numMerges × one vocabulary shuffle; the evolving dictionary
    * is localCheckpoint-pinned per round so the UDF chain never replays.
    *
    * Semantics are EXACTLY [[trainFromCounts]] — same pair weighting,
    * same lexicographic tie-break, same non-overlapping left-to-right
    * replacement — so on any corpus whose dictionary fits the driver cap
    * the two trainers return identical merge lists (pinned by
    * BpeSpec's equivalence tests on both alphabets). */
  def trainMergesDistributed(docs: DataFrame, numMerges: Int,
      byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val symbolize = udf(
      if (byteLevel) (w: String) => toByteSymbols(w).toSeq
      else (w: String) => toSymbols(w).toSeq)
    var cur = TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symbolize(col("word")).as("toks"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val top = cur.filter(size(col("toks")) >= 2)
        .select(explode(zip_with(
          expr("slice(toks, 1, size(toks) - 1)"),
          expr("slice(toks, 2, size(toks) - 1)"),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
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
    merges.result()
  }

  /** The bounded (word, count) dictionary BPE trains on: one exploded word
    * count — map-side combined, one shuffle on `word` — capped
    * deterministically by (count desc, word asc). Shared with the
    * [[Unigram]] trainer, which trains on the identical bounded table. */
  private[operators] def collectWordCounts(docs: DataFrame, maxVocabWords: Int): Seq[(String, Long)] =
    TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Driver-side merge training over a (word, count) dictionary — the
    * classic algorithm: count adjacent symbol pairs weighted by word
    * frequency, merge the most frequent pair everywhere, repeat. */
  private[graft] def trainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int,
      symbolize: String => Array[String] = toSymbols): Seq[(String, String)] = {
    var words = wordCounts.map { case (w, c) => (symbolize(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((toks, c) <- words; i <- 0 until toks.length - 1)
        pairCounts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) exhausted = true
      else {
        // tie-break in UTF-8 byte order (Unigram.utf8Order) — the order
        // Spark's string orderBy uses — so the distributed trainer's
        // equivalence holds beyond the BMP (Java compareTo is UTF-16 and
        // diverges on supplementary planes)
        val best = pairCounts.toSeq.min(
          Ordering.by[((String, String), Long), Long] { case (_, c) => -c }
            .orElseBy { case ((l, _), _) => l }(Unigram.utf8Order)
            .orElseBy { case ((_, r), _) => r }(Unigram.utf8Order))._1
        merges += best
        words = words.map { case (toks, c) => (mergeAll(toks, best._1, best._2), c) }
        learned += 1
      }
    }
    merges.result()
  }

  /** One symbol per CODE POINT (not UTF-16 unit — a surrogate pair stays
    * one symbol, matching DuckDB's per-character `string_split(w, '')`
    * and keeping every symbol valid UTF-8 for the distributed trainer). */
  private def toSymbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** UTF-8 bytes as uppercase two-hex-digit symbols — `"é"` → `["C3","A9"]`.
    * Matches SQL `hex()` byte spelling so oracles replay the merge loop on
    * identical strings. An empty word has ZERO byte symbols (and so zero
    * tokens — the GPT-2 byte-level convention; contrast the char variant's
    * one-token empty word, which follows `string_split(w, '')`). */
  private[graft] def toByteSymbols(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X")

  /** Merge every non-overlapping (l, r) occurrence, scanning left to
    * right — the training-side replacement step. */
  private def mergeAll(toks: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += l + r; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word under a merge rank map: repeatedly merge the leftmost
    * occurrence of the lowest-rank adjacent pair until none applies.
    *
    * An EMPTY word (consecutive separators upstream) counts as ONE token —
    * the convention DuckDB's `string_split(w, '')` produces (`['']`), so
    * both engines budget identical counts on whitespace-degenerate text. */
  private[graft] def tokenize(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array(word)
    tokenizeSymbols(toSymbols(word), ranks)
  }

  /** The leftmost-lowest-rank merge loop, alphabet-agnostic — one
    * implementation under both the char and byte tokenizers so a merge-
    * semantics fix can never drift between them. */
  private def tokenizeSymbols(symbols: Array[String],
      ranks: Map[(String, String), Int]): Array[String] = {
    var toks = symbols
    var done = toks.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPos = i }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        toks = (toks.take(bestPos) :+ (toks(bestPos) + toks(bestPos + 1))) ++
          toks.drop(bestPos + 2)
        done = toks.length < 2
      }
    }
    toks
  }

  /** Byte-level encoding of one word under a merge rank map:
    * [[tokenizeSymbols]]' shared loop over the UTF-8 byte alphabet. An
    * empty word is ZERO tokens (it has zero bytes) — the byte-level
    * convention, diverging deliberately from the char variant's one-token
    * empty word. */
  private[graft] def tokenizeBytes(word: String,
      ranks: Map[(String, String), Int]): Array[String] =
    tokenizeSymbols(toByteSymbols(word), ranks)

  private def rankMap(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Per-document tokenizer-faithful token counts under pinned `merges`:
    * whitespace token count alongside the BPE token count (the budget a
    * real pipeline packs and mixes by). */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    tokenCountsWith(docs, merges, tokenize)

  /** The shared distributed shape of [[tokenCounts]] / [[byteTokenCounts]]:
    * a vocabulary-sized (word → token count) dictionary — each DISTINCT
    * word tokenized once by `tokenizeWord` over a broadcast rank map —
    * broadcast-joined back onto the per-doc word counts. */
  private def tokenCountsWith(docs: DataFrame, merges: Seq[(String, String)],
      tokenizeWord: (String, Map[(String, String), Int]) => Array[String]): DataFrame = {
    val spark = docs.sparkSession
    val bcRanks = spark.sparkContext.broadcast(rankMap(merges))
    val nBpe = udf((w: String) => tokenizeWord(w, bcRanks.value).length)
    val dict = TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .distinct()
      .select(col("word"), nBpe(col("word")).cast("long").as("n_bpe"))
    val docWord = TextAnalysis.withWords(docs)
      .select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    docWord.join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"), sum(col("n") * col("n_bpe")).as("n_bpe_tokens"))
  }

  /** Per-document BYTE-level BPE token counts under pinned byte `merges`
    * (from [[trainMergesBytes]]): [[tokenCounts]]'s exact distributed shape
    * — distinct words tokenized once, broadcast dictionary join — with the
    * merge loop running over the UTF-8 byte alphabet, so non-ASCII text
    * budgets the way a GPT-2-family tokenizer counts it and no word is ever
    * out-of-vocabulary. */
  def byteTokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    tokenCountsWith(docs, merges, tokenizeBytes)

  /** Tokenizer FERTILITY report — tokens-per-word by corpus slice, the
    * diagnostic that decides whether a tokenizer fits a source/language
    * (multilingual surveys report exactly this: fertility ≫ 1 on a slice
    * means its text fragments into many sub-word pieces, inflating
    * training cost and shrinking effective context). Rolls
    * [[tokenCounts]] up per `sliceCol` with the ratio held INTEGER-EXACT
    * in micro-units ((10⁶·Σtokens) div Σwords — the q113/q126 policy, no
    * float-sum order dependence; Σtokens stays < 2⁶³/10⁶ ≈ 9·10¹² per
    * slice, comfortable even at corpus scale). One slice-keyed shuffle
    * of three longs per doc after the dictionary join; map-side combine
    * absorbs hot slices. */
  def fertilityReport(docs: DataFrame, merges: Seq[(String, String)],
      sliceCol: String = "source"): DataFrame =
    tokenCounts(docs, merges)
      .join(docs.select(col("doc_id"), col(sliceCol)), "doc_id")
      .groupBy(sliceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe_tokens").as("n_bpe_tokens"))
      .withColumn("fertility_micro",
        expr("(1000000 * n_bpe_tokens) div n_words"))

  /** Sequence packing budgeted in BPE tokens instead of whitespace tokens —
    * [[TextAnalysis.packSequences]]'s layout contract (sharded streams,
    * ACCUMULATE running sum, globally unique seq ids) with the token
    * column swapped for the tokenizer-faithful count. */
  def packSequencesBpe(docs: DataFrame, merges: Seq[(String, String)],
      maxTokens: Int = 2048, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    tokenCounts(docs, merges)
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).cast("int").as("shard"),
        col("n_bpe_tokens").as("n_tokens"))
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
}
