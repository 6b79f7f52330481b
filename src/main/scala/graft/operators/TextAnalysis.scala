package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over a `text`
  * column. All pure `org.apache.spark.sql.functions` expressions — whole-stage
  * codegen end to end, no UDFs, no shuffle except where grouping is inherent.
  *
  * Determinism: every computation is exact integer / rational arithmetic on
  * the same operands DuckDB would use, so results hash-match a SQL oracle.
  */
object TextAnalysis {

  /** Whitespace tokenization — single-space split, matching DuckDB's
    * string_split(text, ' ') exactly.
    *
    * PERF: never embed this directly in a per-element lambda (slice, filter,
    * aggregate) — Catalyst re-evaluates the split per element. Materialize it
    * with [[withWords]] first; a multi-referenced non-cheap alias survives
    * CollapseProject, so the tokenization runs once per row. */
  def words(text: Column): Column = split(text, " ")

  /** Adds a materialized `__words` array column. */
  def withWords(docs: DataFrame): DataFrame =
    docs.withColumn("__words", words(col("text")))

  /** Per-document quality stats: char count, word count, mean word length,
    * punctuation count, stopword ratio. One narrow projection, no shuffle. */
  def stats(docs: DataFrame): DataFrame = {
    val ws = col("__words")
    val totalWordChars = aggregate(transform(ws, w => length(w)), lit(0), (acc, x) => acc + x)
    withWords(docs).select(
      col("doc_id"),
      length(col("text")).as("len_chars"),
      size(ws).as("n_words"),
      (totalWordChars.cast("double") / size(ws).cast("double")).as("avg_word_len"),
      size(filter(ws, w => w.isin("the", "a", "of", "and"))).as("n_stopwords"),
      (size(filter(ws, w => w.isin("the", "a", "of", "and"))).cast("double")
        / size(ws).cast("double")).as("stopword_ratio"))
  }

  // ─────────────── language ID (char-n-gram rank profiles) ───────────────
  //
  // Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization"): rank each
  // language's most frequent char n-grams; classify a document by the
  // out-of-place distance between its own gram ranking and each profile.
  // This retires the r1–r7 marker-word argmax — rank profiles are the
  // public state of practice for lightweight language ID and need no
  // per-language word lists, only labeled training text.

  /** ASCII-fold normalization for language ID: lowercase, every non-[a-z]
    * run to one space, single-space padding at both ends (so grams see
    * word boundaries — the C-T padding effect without per-word padding).
    * Accented chars fold to spaces, i.e. profiles are ASCII-gram only —
    * documented trade for engine-portable regexes (Java ∩ RE2, and DuckDB
    * substring semantics match Spark's on ASCII). */
  private def langNorm(c: Column): Column =
    concat(lit(" "), trim(regexp_replace(lower(c), "[^a-z]+", " ")), lit(" "))

  /** All char `n`-grams of `s` (1-based sliding window). Guarded: Spark's
    * sequence(1, stop) DESCENDS when stop < 1, so short strings must
    * short-circuit to an empty array rather than generate phantom grams. */
  private def charGrams(s: Column, n: Int): Column =
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Train rank profiles from labeled text: rows (lang, text) → tuples
    * (lang, gram, rank), rank 1..k over the language's char 2- and
    * 3-grams by (count desc, gram asc) — fully deterministic, so training
    * replayed on the same text reproduces the pinned constant exactly
    * (OperatorsSpec asserts this, the q87 merge-table pattern). The
    * collect is bounded by construction: ≤ k rows per language. */
  def trainLanguageProfiles(training: DataFrame, k: Int = 60): Seq[(String, String, Int)] = {
    val s = langNorm(col("text"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("c").desc, col("gram"))
    training.select(col("lang"), s.as("__s"))
      .select(col("lang"),
        explode(concat(charGrams(col("__s"), 2), charGrams(col("__s"), 3))).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("c"))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= k)
      .select("lang", "gram", "pr")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .sortBy(t => (t._1, t._3)).toSeq
  }

  /** Classify by out-of-place distance against pinned `profiles`: the
    * document's top-`k` grams (same ranking rule as training) each
    * contribute |doc_rank − profile_rank|, or the max penalty `k` when the
    * profile lacks the gram; the language with the smallest sum wins (ties
    * break lexicographically). Output: (doc_id, pred_lang, oop_distance).
    *
    * 100 TB shape: the per-doc top-k ranking happens IN-ROW — one
    * codegen'd pass ([[graft.functions.CharGramRank]]: hash-count the
    * grams, sort the DISTINCT set by (count desc, gram asc), keep k; the
    * element's position IS the document rank). A doc's gram OCCURRENCES
    * never enter a shuffle and no per-doc window exists; only |docs|·k
    * (doc, gram, rank) rows ever leave the map side, the profile table
    * (|langs|·k rows) and language list broadcast, and the argmin groups
    * |docs|·|langs| rows. (The first version shuffled every gram
    * occurrence through a (doc_id, gram) aggregate plus two
    * doc-partitioned windows, and its declarative in-row replacement paid
    * O(len²) in substr position scans — 16 s and 19 s at sf0.1 vs 0.8 s
    * for this shape; the expression's scaladoc records the decomposition.) */
  def classifyLanguage(docs: DataFrame, profiles: Seq[(String, String, Int)],
      k: Int = 60, textCol: String = "text"): DataFrame = {
    require(profiles.nonEmpty, "profiles must not be empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val prof = broadcast(profiles.toDF("lang", "gram", "pr"))
    val langs = broadcast(profiles.map(_._1).distinct.sorted.toDF("lang"))
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("d"), col("lang"))
    val topGrams = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CharGramRank(
        org.apache.spark.sql.GraftColumnBridge.expression(langNorm(col(textCol))), k))
    // (r21 note: an inner-join reshape — profile hits only, distances
    // reconstructed as Σ|r−pr| + (n_grams − n_matched)·k, one fallback row
    // per doc — was prototyped and measured SLOWER at sf0.1 in both its
    // lazy and pinned forms: the fallback branch costs a second pass and
    // the |langs| factor here is 7. Revisit only for profile sets orders
    // of magnitude wider.)
    docs.select(col("doc_id"), posexplode(topGrams))
      .select(col("doc_id"), (col("pos") + 1).as("r"), col("col").as("gram"))
      .crossJoin(langs)
      .join(prof, Seq("lang", "gram"), "left")
      .groupBy("doc_id", "lang")
      .agg(sum(coalesce(abs(col("r") - col("pr")), lit(k))).as("d"))
      .withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"),
        col("d").cast("long").as("oop_distance"))
  }

  /** Token counting: whitespace tokens, a BPE-ish regex token count
    * (letter runs / digits / other symbols), and the chars/4 heuristic. */
  def tokenCounts(docs: DataFrame): DataFrame =
    withWords(docs).select(
      col("doc_id"),
      size(col("__words")).as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]|[^a-z0-9 ]")).as("n_re_tokens"),
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("n_approx_bpe"))

  /** Gopher-style repetition/quality signals and a composite keep/drop flag —
    * the document-level filter stage of a training-data pipeline (Rae et al.
    * 2021 §A1.1 repetition rules, re-expressed for this corpus):
    *
    *  - `dup_word_frac`: fraction of word occurrences that repeat an earlier
    *    word (1 − |distinct|/|words|) — high values flag boilerplate;
    *  - `top_bigram_frac`: fraction of all bigrams taken by the single most
    *    frequent bigram — the "top n-gram fraction" repetition rule;
    *  - `alpha_frac`: lowercase-letter characters / total characters — the
    *    symbol-ratio rule;
    *  - `quality_pass`: the conjunction at thresholds that split this
    *    corpus non-trivially (n_words ≥ 20, dup ≤ 0.6, top-bigram ≤ 0.1,
    *    alpha ≥ 0.8).
    *
    * Entirely map-side (no shuffle): the top-bigram count folds over the
    * SORTED 64-bit bigram-hash array as a longest-equal-run scan, so no
    * (doc, bigram) aggregation shuffle exists at any scale. Exact integer /
    * rational arithmetic throughout — hash-matches the SQL oracle. */
  def qualityRules(docs: DataFrame): DataFrame =
    qualityRuleFeatures(docs).select("doc_id", "n_words", "dup_word_frac",
      "top_bigram_frac", "alpha_frac", "quality_pass")

  /** [[qualityRules]]' projection widened by `stopword_ratio` — the one
    * extra feature [[qualityScore]] needs. Fused here (r21) so the scorer
    * reads ONE projection instead of joining a second whole-corpus
    * tokenization pass against the rules; rules-only callers go through
    * [[qualityRules]], whose narrowing select lets Catalyst prune the
    * stopword expression away entirely. Expressions are byte-identical to
    * the pre-fusion pair, so both oracles are unchanged. */
  private[graft] def qualityRuleFeatures(docs: DataFrame): DataFrame = {
    val ws = col("__words")
    // longest equal run over the sorted hashes == max bigram multiplicity
    // (64-bit hashes: collisions are negligible and the oracle's string
    // bigrams would surface one as a hash mismatch). r21: the sort + run
    // scan is ONE codegen'd expression (MaxSortedRunLength — see its
    // scaladoc: HOF folds run interpreted per element and dominated the
    // scorer's single-task cost); the hash array still materializes as a
    // column first — referenced twice below (run scan + size), and the
    // hashing must run once per row, not per reference
    val bigrams = col("__bigrams")
    val maxRun = graft.functions.RunFunctions.max_sorted_run_length(bigrams)
    val nBigrams = size(bigrams)
    val nWords = size(ws)
    val dupFrac = (nWords - size(array_distinct(ws))).cast("double") / nWords.cast("double")
    val topBigramFrac =
      when(nBigrams > 0, maxRun.cast("double") / nBigrams.cast("double")).otherwise(0.0)
    // zero-length guard like top_bigram_frac's: without it Spark's divide
    // yields NULL while DuckDB yields NaN on empty text, and downstream
    // aggregates silently diverge between engines
    val alphaFrac = when(length(col("text")) > 0,
      regexp_count(col("text"), lit("[a-z]")).cast("double") /
        length(col("text")).cast("double")).otherwise(0.0)
    // quality_pass reads the ALIASED frac columns from a second projection —
    // inlining the raw expressions into the conjunction would evaluate the
    // run scan / array_distinct / regexp twice per row (multi-referenced
    // non-cheap aliases survive CollapseProject, same idiom as withWords)
    withWords(docs)
      .withColumn("__bigrams",
        graft.functions.HashFunctions.word_gram_hashes(ws, 2))
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        dupFrac.as("dup_word_frac"),
        topBigramFrac.as("top_bigram_frac"),
        alphaFrac.as("alpha_frac"),
        (size(filter(ws, w => w.isin("the", "a", "of", "and"))).cast("double") /
          size(ws).cast("double")).as("stopword_ratio"))
      // r21: quality_pass is FENCED (graft.functions.OptimizerFence) — a
      // downstream filter on it would otherwise be pushed below this
      // projection with the whole split/gram/fold chain re-inlined into a
      // scan-level Filter (observed: 3 copies of split(text) per row on the
      // q103/q159 plans). The fence pins the filter directly above this
      // projection; values are unchanged.
      .withColumn("quality_pass",
        graft.functions.OptimizerFence.fence(
          col("n_words") >= 20 && col("dup_word_frac") <= 0.6 &&
            col("top_bigram_frac") <= 0.1 && col("alpha_frac") >= 0.8))
  }

  /** Readability scores — the classic reading-grade formulas corpus
    * audits and curriculum-ordering recipes report beside the quality
    * filters: Flesch-Kincaid grade level
    * (0.39·words/sentences + 11.8·syllables/word − 15.59, Kincaid et
    * al. 1975) and the Automated Readability Index
    * (4.71·letters/words + 0.5·words/sentences − 21.43, Senter &
    * Smith 1967). Sentences count as maximal `[.!?]+` terminator runs
    * (min 1 so fragments still score); syllables per word use the
    * standard cheap heuristic — vowel-GROUP count `[aeiouy]+` on the
    * lowercased word, min 1 ("beautiful" → eau·i·u → 3). Both formulas
    * need only these three integer counts, so the whole operator is ONE
    * shuffle-free codegen'd projection — at 100 TB it runs entirely
    * map-side next to the scan, like [[stats]]/[[qualityRules]].
    * Grades are deliberately NOT rounded: the formulas are pure +·/
    * IEEE-double arithmetic over integer counts, bit-identical across
    * engines when the association order matches — whereas round() is
    * precisely where engines diverge (HALF_UP on the decimal expansion
    * vs scaled-nearbyint disagree when a grade lands on an exact
    * 6-decimal half, which integer ratios like 0.5·w/s hit routinely;
    * observed at sf0.01: 32.2065625). The round-6 policy stays reserved
    * for transcendental outputs (ln/cos) where the RAW doubles differ.
    * Note the whitespace splitter yields one empty word for empty text
    * (both engines), so words ≥ 1 and no division guards are needed. */
  def readability(docs: DataFrame): DataFrame = {
    val ws = col("__words")
    val nWords = size(ws).cast("long")
    val nSentences = greatest(lit(1), regexp_count(col("text"), lit("[.!?]+"))).cast("long")
    val nSyllables = aggregate(
      transform(ws, w => greatest(lit(1), regexp_count(lower(w), lit("[aeiouy]+")))),
      lit(0L), (acc, x) => acc + x)
    val nLetters = regexp_count(col("text"), lit("[A-Za-z]")).cast("long")
    // counts materialize as aliases first — each feeds two formulas, and
    // the per-word syllable fold must run once per row (the withWords
    // multi-reference idiom)
    withWords(docs)
      .select(col("doc_id"), nWords.as("n_words"), nSentences.as("n_sentences"),
        nSyllables.as("n_syllables"), nLetters.as("n_letters"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"), col("n_letters"),
        (lit(0.39) * col("n_words") / col("n_sentences") +
          lit(11.8) * col("n_syllables") / col("n_words") - 15.59).as("fk_grade"),
        (lit(4.71) * col("n_letters") / col("n_words") +
          lit(0.5) * col("n_words") / col("n_sentences") - 21.43).as("ari"))
  }

  /** Sequence packing — the layout stage between a filtered corpus and a
    * pre-training dataloader: lay documents end-to-end in a token stream and
    * cut fixed-size training sequences of `maxTokens`, reporting for each
    * document its stream position, owning sequence, and whether it straddles
    * a sequence boundary (the dataloader's split-or-pad decision).
    *
    * Scale shape: ONE global stream would serialize the cumulative sum into
    * a single window partition — the classic bottleneck — so the corpus
    * shards first and each shard packs its own independent token stream
    * (exactly how a distributed dataloader consumes shards). The per-shard
    * running sum is the engine's ACCUMULATE shape; sequence ids are
    * globally unique via shard in the high 16 bits (2^48 local sequences
    * per shard ≈ 7·10^16 tokens at maxTokens=256 — comfortably past any
    * corpus). Round-robin sharding (doc_id % shards): deterministic,
    * SQL-portable, and balanced for any dense id space — swap in a hash of
    * the id when ids arrive clustered. Token count = whitespace tokens. */
  def packSequences(docs: DataFrame, maxTokens: Int = 2048, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    withWords(docs).select(
      col("doc_id"),
      pmod(col("doc_id"), lit(shards.toLong)).cast("int").as("shard"),
      size(col("__words")).as("n_tokens"))
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

  /** FIRST-FIT-DECREASING bin packing — the production packer trainers
    * run when documents must stay WHOLE in their training sequence
    * (contrast [[packSequences]], which lays a stream and SPLITS
    * boundary-straddling docs): per shard, documents sorted
    * (n_tokens desc, doc_id) drop into the first bin with room, opening
    * a new bin otherwise — the classic FFD guarantee (≤ 11/9·OPT + 1
    * bins) that cuts padding far below naive in-order closing. A doc at
    * or above `maxTokens` gets a bin of its own, immediately closed
    * (truncation is the caller's decision — [[truncationReport]] prices
    * it).
    *
    * Output: (doc_id, shard, n_tokens, local_bin, bin_id) with 1-based
    * per-shard bins and globally unique bin_id = shard·2⁴⁸ + local_bin
    * (the [[packSequences]] id convention).
    *
    * Determinism & replay: the fold's state (per-bin remaining capacity,
    * scanned in bin order) is a pure function of the sorted input, so a
    * SQL oracle replays it step by step in a recursive CTE — every
    * integer, no floats.
    *
    * 100 TB shape: the q57 sharding posture — each shard packs
    * independently inside its hash partition (repartition(shard) + an
    * in-partition sort, ONE shuffle), the fold is a sequential scan with
    * O(bins-per-shard) state, and `shards` is the knob that bounds both
    * state and the sequential span exactly as it bounds q57's running
    * sum. The linear first-fit scan is O(bins) per doc — callers packing
    * monster shards would swap in the standard segment-tree first-fit
    * without touching the contract. */
  def packFirstFitDecreasing(docs: DataFrame, maxTokens: Int = 2048,
      shards: Int = 8): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        pmod(col("doc_id"), lit(shards.toLong)).cast("int").as("shard"),
        size(split(col("text"), " ")).cast("int").as("n_tokens"))
      .as[(Long, Int, Int)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .mapPartitions { it =>
        // a partition holds whole shards (hash-partitioned on shard);
        // rows arrive shard-contiguous and (n_tokens desc, id) sorted
        var curShard = Int.MinValue
        var bins = scala.collection.mutable.ArrayBuffer.empty[Int]
        it.map { case (id, sh, n) =>
          if (sh != curShard) {
            curShard = sh
            bins = scala.collection.mutable.ArrayBuffer.empty[Int]
          }
          var b = 0
          while (b < bins.length && bins(b) < n) b += 1
          if (b == bins.length) bins += math.max(maxTokens - n, 0)
          else bins(b) -= n
          (id, sh, n, b + 1)
        }
      }.toDF("doc_id", "shard", "n_tokens", "local_bin")
      .withColumn("bin_id",
        col("shard").cast("long") * (1L << 48) + col("local_bin"))
  }

  /** Statistical language-model quality score (CCNet-style): each document's
    * mean log-probability under an add-α-smoothed unigram model trained on
    * the corpus itself — wildly out-of-distribution documents (wrong
    * language, binary junk, boilerplate with rare tokens) score low and get
    * filtered. The classic cheap proxy for "looks like the corpus" used
    * before perplexity models enter the pipeline.
    *
    * Scale shape: tokenize ONCE into (doc_id, word, n) groups — the frame
    * every downstream stage reads (the model's groupBy(word), the scalar
    * totals, and the scoring join), so the corpus-sized explode runs a
    * single time and the scoring join shuffles one row per DISTINCT
    * doc-word, not per occurrence, with the average weighted by n. The
    * group frame's consumers are canonically identical subplans, so
    * ReuseExchange serves them all from ONE shuffle of the corpus — the
    * [[bigramLmScore]] posture (r21; previously a cache() here paid a
    * materialization job plus columnar conversion and pinned
    * near-corpus-sized storage for the session, measured ~0.4 s slower at
    * sf0.1 than the strictly-bigger bigram chain without it). The score
    * rounds to 6 decimals before compare/filter — log() is transcendental
    * and engines may differ in the last ulp (same policy as the cosine
    * operators). */
  def lmScore(docs: DataFrame, alpha: Double = 1.0): DataFrame = {
    val docWord = withWords(docs).select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    val counts = docWord.groupBy("word").agg(sum("n").as("cnt"))
    val totals = counts.agg(sum("cnt").as("total"), count(lit(1)).as("vocab"))
    val logp = log((col("cnt") + alpha) / (col("total") + col("vocab") * alpha))
    docWord.join(counts, "word").crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_words"),
        round(sum(col("n") * logp) / sum(col("n")), 6).as("avg_logprob"))
  }

  /** BIGRAM-interpolated LM quality score — the step up from [[lmScore]]'s
    * unigram model the CCNet family actually runs: mean ln P(w2 | w1) over
    * each document's adjacent word pairs under the corpus's own add-α
    * bigram model, P(w2|w1) = (c(w1,w2) + α) / (c(w1·) + α·V) with c(w1·)
    * the prefix count (w1 in non-final positions) and V the unigram
    * vocabulary. Repetitive/templated text scores high (its bigrams are
    * corpus-frequent), word-salad scores low — a sharper signal than
    * unigram frequency alone, which cannot see order at all.
    *
    * 100 TB shape: the bigram table aggregates with map-side combine and
    * its join back to per-doc bigram groups keys on (w1, w2) — cardinality
    * is observed-bigrams, far under corpus size but too big to broadcast,
    * so that ONE join is the only data-scale shuffle beyond the group-bys;
    * prefix counts derive from the (w1, w2) table (not another corpus
    * pass) and, like the vocab scalar, broadcast. The per-doc bigram
    * aggregate feeds two subtrees WITHOUT a cache(): its two occurrences
    * are identical plans, so ReuseExchange serves the second from the
    * first's shuffle files — no near-corpus-sized storage stays pinned for
    * the session (a cache here held ~token-count rows until shutdown), and
    * a worst-case re-derivation is map-side explode CPU, the right trade
    * at scale. Documents with fewer than two words have no bigrams and
    * are absent from the output (same convention in the oracle).
    * Determinism: ln rounds to 6 decimals (the transcendental-ulp policy
    * q60/q74 established). */
  def bigramLmScore(docs: DataFrame, alpha: Double = 1.0): DataFrame = {
    val w = withWords(docs)
    val docBi = w
      .select(col("doc_id"),
        explode(when(size(col("__words")) < 2, array())
          .otherwise(transform(sequence(lit(1), size(col("__words")) - 1),
            i => struct(
              element_at(col("__words"), i).as("w1"),
              element_at(col("__words"), i + 1).as("w2"))))).as("bi"))
      .select(col("doc_id"), col("bi.w1"), col("bi.w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
    val c12 = docBi.groupBy("w1", "w2").agg(sum("n").as("c12"))
    // prefix count c(w1·) = Σ_w2 c12 — summing the BIGRAM table, which is
    // already vocabulary²-bounded, instead of re-aggregating per-doc rows
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = withWords(docs).select(explode(col("__words")).as("word"))
      .agg(count_distinct(col("word")).as("vocab"))
    val logp = log((col("c12") + alpha) / (col("c1") + col("vocab") * alpha))
    docBi.join(c12, Seq("w1", "w2"))
      .join(broadcast(c1), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_bigrams"),
        round(sum(col("n") * logp) / sum(col("n")), 6).as("avg_logprob"))
  }

  /** Per-word numeric code used by the rolling fingerprint: cheap,
    * deterministic, reproducible in plain SQL (length + first char code). */
  private def wordCode(w: Column): Column =
    (length(w) * lit(7919L) + ascii(substring(w, 1, 1))).cast("long")

  /** Rolling polynomial fingerprint over the word sequence
    * (Rabin-Karp-style: h = (h * 1000003 + code(w)) mod 2^31-1).
    * Exact integer arithmetic — products stay < 2^52, no overflow.
    * A pure projection; at 100 TB this runs entirely map-side. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val codes = transform(col("__words"), wordCode(_))
    withWords(docs).select(
      col("doc_id"),
      aggregate(codes, lit(0L), (acc, x) => (acc * 1000003L + x) % 2147483647L)
        .as("fingerprint"))
  }

  /** PII patterns, applied in list order (emails first so an address is
    * one `<EMAIL>` token before the narrower digit patterns see the text).
    * Deliberately restricted to regex syntax that Java's engine and
    * RE2-family engines (DuckDB, Go, Hyperscan) parse identically —
    * character classes, bounded repetition, `\b` / `\d` — so the same
    * pattern string drives both the operator and a SQL oracle. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{3}-\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** PII redaction — the scrub stage every public-corpus pipeline runs
    * before training: emails, NANP-style phone numbers, and IPv4 addresses
    * become placeholder tokens, with a per-document redaction count for
    * audit sampling. A pure projection (regexp_replace + regexp_extract_all
    * are codegen'd) — at 100 TB this is map-side work with zero shuffle,
    * and the counts aggregate downstream without re-running the regexes.
    *
    * Null contract: a null `text` yields a null `text_redacted` (nothing to
    * scrub) but `n_redactions` = 0, so downstream audit sums never go null. */
  def redactPii(docs: DataFrame): DataFrame = {
    val redacted = piiPatterns.foldLeft(col("text")) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }
    // counts run over the ORIGINAL text, per pattern, so overlapping
    // patterns count consistently regardless of replacement order
    val nRedactions = piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
    }.reduce(_ + _)
    docs.select(
      col("doc_id"),
      redacted.as("text_redacted"),
      coalesce(nRedactions.cast("int"), lit(0)).as("n_redactions"))
  }

  /** Luhn-verified payment-card detection — the PRECISION stage a
    * production PII pipeline runs after [[redactPii]]'s recall-oriented
    * regexes: any 13–19-digit run is a CANDIDATE, but only runs passing
    * the ISO/IEC 7812 Luhn mod-10 checksum are plausible PANs — random
    * digit strings pass at ~10%, so the verify drops ~90% of the false
    * alarms a bare regex would redact. One row per candidate:
    * (doc_id, candidate, luhn_valid).
    *
    * Candidates are MAXIMAL digit runs of length 13-19: extracting
    * `[0-9]+` and length-filtering afterwards is the digit-boundary
    * anchor — a 20+-digit run (order id, hash) is one over-long run and
    * yields NO candidate, where a bare `[0-9]{13,19}` would greedily
    * split it and Luhn-test its first 19 digits (~10% false-positive
    * odds). Lookarounds would say the same thing but RE2 (the oracle's
    * engine) has none; the maximal-run + filter form is portable.
    *
    * The checksum is a pure in-row HOF fold over the reversed digits
    * (double every second, subtract 9 above 9, sum mod 10) — integer
    * arithmetic the oracle replays verbatim; extraction and fold are
    * codegen'd, zero shuffle at any scale. */
  def luhnCardCandidates(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        explode(expr(s"regexp_extract_all($textCol, '[0-9]+', 0)")).as("candidate"))
      .filter(length(col("candidate")).between(13, 19))
      .withColumn("luhn_valid", expr(
        """aggregate(
          |  sequence(0, length(candidate) - 1),
          |  0,
          |  (acc, i) -> acc + CASE WHEN i % 2 = 1
          |    THEN CASE WHEN 2 * (ascii(substring(reverse(candidate), i + 1, 1)) - 48) > 9
          |              THEN 2 * (ascii(substring(reverse(candidate), i + 1, 1)) - 48) - 9
          |              ELSE 2 * (ascii(substring(reverse(candidate), i + 1, 1)) - 48) END
          |    ELSE ascii(substring(reverse(candidate), i + 1, 1)) - 48 END
          |) % 10 = 0""".stripMargin))

  /** Context-window truncation report — what a `maxTokens` cap costs each
    * source BEFORE committing to it: docs that fit, whitespace tokens
    * kept vs lost under hard truncation, loss in integer micro-units.
    * The capacity-planning twin of [[packSequences]] (which packs exactly
    * these budgets) and the per-source lens on [[chunkDocuments]]'s
    * alternative (chunk instead of truncate). One partial-aggregated
    * groupBy over (source, n_words) — map-side, no text shuffles. */
  def truncationReport(docs: DataFrame, maxTokens: Int = 256,
      sourceCol: String = "source"): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val nw = size(split(col("text"), " ")).cast("long")
    docs.select(col(sourceCol), nw.as("__nw"))
      .groupBy(sourceCol).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__nw") <= maxTokens, 1L).otherwise(0L)).as("n_fit"),
        sum(col("__nw")).as("tokens_total"),
        sum(least(col("__nw"), lit(maxTokens.toLong))).as("tokens_kept"))
      .withColumn("loss_e6",
        expr("((tokens_total - tokens_kept) * 1000000) div tokens_total"))
  }

  /** Zipf-law fit per source — the corpus-health diagnostic beside
    * [[entropyStats]]: natural language's rank-frequency law is
    * f(r) ∝ r^s with s ≈ −1, and a slice whose slope sits far off
    * (too flat = shuffled/templated vocabulary, too steep = a few
    * tokens dominating — log spam, boilerplate) is a broken extractor
    * before any model sees it. Least-squares slope of ln f on ln r over
    * each source's `topK` words (ties rank by count desc, word asc —
    * deterministic), rounded to 6 at the end (the q60 transcendental-ulp
    * policy; with ≤ topK addends the cross-engine drift is far below the
    * rounding grain). Output: (source, n_top, zipf_slope).
    *
    * Scale: one (source, word) count aggregate (partial, map-side), a
    * per-source top-K window (WindowGroupLimit — K rows survive per
    * partition), then a K-row-per-source aggregate. */
  def zipfFit(docs: DataFrame, sourceCol: String = "source",
      topK: Int = 64): DataFrame = {
    require(topK >= 8, s"topK must be >= 8 for a meaningful fit, got $topK")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(sourceCol)
      .orderBy(col("__n").desc, col("word"))
    val ranked = withWords(docs)
      .select(col(sourceCol), explode(col("__words")).as("word"))
      .groupBy(sourceCol, "word").agg(count(lit(1)).as("__n"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topK)
      .select(col(sourceCol), log(col("__r").cast("double")).as("x"),
        log(col("__n").cast("double")).as("y"))
    ranked.groupBy(sourceCol).agg(
        count(lit(1)).as("n_top"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col(sourceCol), col("n_top"),
        // n_top = 1 ⇒ the lone rank is ln 1 = 0 ⇒ the denominator is exactly
        // 0.0: Spark would emit NaN where DuckDB's default division emits
        // NULL, so degenerate sources are forced to null in BOTH engines
        when(col("n_top") > 1,
          round((col("n_top") * col("sxy") - col("sx") * col("sy")) /
            (col("n_top") * col("sxx") - col("sx") * col("sx")), 6))
          .as("zipf_slope"))
  }

  /** Corpus vocabulary with frequency statistics — the tokenizer-training /
    * frequency-cutoff stage of a data pipeline: one row per distinct word
    * with its total occurrence count, document frequency, and a dense
    * frequency-ranked id (0 = most frequent; ties break alphabetically, so
    * ids are deterministic and reproducible across runs and engines).
    *
    * Scale shape: explode → two chained partial-aggregated groupBys. Doc
    * frequency comes from counting (word, doc) groups rather than
    * `countDistinct` — the same answer without Catalyst's Expand node, so
    * both shuffles stay map-side-combined. The final rank is a single
    * window over the VOCABULARY (bounded by distinct tokens — ~10^5-10^6
    * for natural text, regardless of corpus size), not the corpus, so the
    * one-partition sort is over a tiny result set. */
  def vocabulary(docs: DataFrame, minCount: Long = 2): DataFrame = {
    val ranked = org.apache.spark.sql.expressions.Window
      .orderBy(col("term_count").desc, col("word"))
    withWords(docs)
      .select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("word", "doc_id").agg(count(lit(1)).as("cnt"))
      .groupBy("word")
      .agg(sum("cnt").as("term_count"), count(lit(1)).as("doc_freq"))
      .filter(col("term_count") >= minCount)
      .select(col("word"), col("term_count"), col("doc_freq"),
        (row_number().over(ranked) - 1).cast("long").as("vocab_id"))
  }

  /** TF-IDF keyword extraction: the top `topK` most characteristic words per
    * document by tf · ln(N/df) — the classic relevance weight, used here the
    * way a curation pipeline uses it (topical fingerprints for mixing /
    * clustering / inspection). Scores round to 6 decimals BEFORE ranking so
    * the (score desc, word asc) order is identical across engines; `rnk`
    * makes the output self-describing.
    *
    * Scale shape: one (doc, word) partial-aggregated groupBy; the document
    * frequency table is vocabulary-sized, so it and the corpus row count
    * join back by BROADCAST — the corpus-sized side shuffles once, for its
    * own aggregation. Top-k per doc is a row_number window that Spark prunes
    * map-side via WindowGroupLimit. */
  def tfIdfKeywords(docs: DataFrame, topK: Int = 3): DataFrame = {
    val tf = withWords(docs)
      .select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tf_idf").desc, col("word"))
    tf.join(broadcast(df), "word").crossJoin(broadcast(nDocs))
      .withColumn("tf_idf", round(
        col("tf").cast("double") * log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("word"), col("tf_idf"), col("rnk"))
  }

  /** Overlapping-window chunking — the RAG/embedding prep counterpart of
    * [[packSequences]]: each document's token sequence splits into chunks
    * of `chunkTokens` starting every `chunkTokens - overlap` tokens, so
    * consecutive chunks share `overlap` tokens of context. Emits one row
    * per chunk with its 0-based index and actual token count (the last
    * chunk is usually short).
    *
    * Scale shape: tokenize once ([[withWords]]), then a generator
    * (posexplode over the chunk starts) plus slices — all map-side, no
    * shuffle; chunk rows inherit the input partitioning, ready for a
    * downstream embedding UDF or write.
    *
    * Null contract: a null-`text` document produces ZERO chunk rows (the
    * generator has nothing to explode) — filter for nulls upstream if such
    * documents must be accounted for. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 128, overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap for chunkTokens=$chunkTokens")
    val stride = chunkTokens - overlap
    withWords(docs)
      .withColumn("__nw", size(col("__words")))
      .select(col("doc_id"), col("__words"),
        posexplode(sequence(lit(0), col("__nw") - 1, lit(stride))))
      .withColumn("__chunk", slice(col("__words"), col("col") + 1, lit(chunkTokens)))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("n_chunk_tokens"))
  }

  /** BM25 relevance scores (Robertson/Spärck Jones; the Okapi formulation
    * with the +1 idf floor used by Lucene): for each query term,
    * `idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with
    * `idf = ln((N − df + 0.5)/(df + 0.5) + 1)`, returning the `topK`
    * highest-scoring documents per term — the retrieval stage of a
    * pretraining decontamination / quality-ranking pipeline.
    *
    * Determinism: tf, df, dl, N are exact integers; avgdl is one exact
    * integer division; the single `ln` rounds to 6 decimals (the same ulp
    * policy q60's lmScore established across engines). Rank ties break by
    * doc_id. A term absent from the whole corpus produces NO output rows
    * (df = 0 never materializes) rather than zero-score rows.
    *
    * 100 TB shape: one tokenize pass; the tf aggregation shuffles only
    * (doc_id, term, count) for matching terms — the term filter prunes
    * BEFORE the explode output is shuffled; df/N/avgdl are scalar partial
    * aggregates broadcast back; the per-term top-K is a WindowGroupLimit
    * window over |terms| partitions. */
  def bm25Scores(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25Scores needs at least one query term")
    val tokenized = withWords(docs)
      .select(col("doc_id"), col("__words"), size(col("__words")).as("dl"))
    val corpus = tokenized.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val tf = tokenized
      .select(col("doc_id"), col("dl"), explode(col("__words")).as("term"))
      .filter(col("term").isin(terms.map(lit): _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    bm25Rank(tf, corpus, k1, b, topK)
  }

  /** MULTI-TERM query-level BM25 retrieval — the ranking users actually
    * run (q74's [[bm25Scores]] ranks per single term; a real query is a
    * bag of terms): score(q, d) = Σ_t qtf(t)·bm25(t, d) over the query's
    * terms, top-`topK` documents per query. Query-term frequency
    * multiplies (the classic Robertson formulation; Lucene's unit-query
    * shortcut is the qtf = 1 special case).
    *
    * Determinism: each (term, doc) BM25 contribution integerizes FIRST
    * (round-6 then ×10⁶ — the q144 policy), so the per-(query, doc) sum
    * is a LONG sum with no float-order hazard no matter how many query
    * terms hit a document; ranks tie-break by doc_id. A query whose terms
    * all miss the corpus produces no rows.
    *
    * 100 TB shape: corpus-side work = ONE tokenize filtered to the
    * query-term set (broadcast semi-join) before its (doc, term) shuffle;
    * df/N/avgdl are broadcast scalars; the query join fans each matching
    * (term, doc) posting by the number of queries containing the term
    * (queries broadcast — the batch-retrieval asymmetry); the final
    * top-K is one WindowGroupLimit window per query. */
  def bm25QueryTopK(docs: DataFrame, queries: DataFrame, k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    val qt = queries.select(col("query_id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy("query_id", "term").agg(count(lit(1)).as("qtf"))
    val terms = qt.select("term").distinct()
    val tokenized = withWords(docs)
      .select(col("doc_id"), col("__words"), size(col("__words")).as("dl"))
    val corpus = tokenized.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val tf = tokenized
      .select(col("doc_id"), col("dl"), explode(col("__words")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfD = col("tf").cast("double")
    val term = idf * tfD * (k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score_micro").desc, col("doc_id"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(corpus))
      .withColumn("__tm", round(round(term, 6) * 1e6).cast("long"))
      .join(broadcast(qt), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("qtf") * col("__tm")).as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "doc_id", "score_micro", "rank")
  }

  /** The BM25 ranking core shared by [[bm25Scores]] (direct) and
    * [[bm25FromIndex]] (persisted postings) — ONE implementation, so the
    * serving path cannot drift from the verified direct path. `tf` is
    * (term, doc_id, dl, tf) for the query terms only; `corpus` is the
    * one-row (n_docs, avgdl) frame. df derives from `tf` itself (rows per
    * term = docs containing it — identical from a tokenize pass or a
    * posting list). */
  private def bm25Rank(tf: DataFrame, corpus: DataFrame, k1: Double,
      b: Double, topK: Int): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfD = col("tf").cast("double")
    val score = idf * tfD * (k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(df), "term").crossJoin(broadcast(corpus))
      .withColumn("score", round(score, 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("term"), col("doc_id"), col("score"), col("rnk"))
  }

  /** Persisted inverted index — the keyword-retrieval SERVING shape, the
    * posting-list sibling of the MinHash band index and the IVF cell
    * layout (build once over the corpus, probe many times without
    * re-tokenizing a single document):
    *
    *  - `postings/` — one row per (term, doc) with the term frequency and
    *    the doc length BM25 needs, Hive-partitioned by
    *    `p = pmod(xxhash64(term), buckets)` so a query's terms resolve to
    *    a handful of partition directories and the scan PRUNES AT
    *    PLANNING TIME (the IVF-cells convention);
    *  - `manifest/` — one row: corpus doc count, total token count (exact
    *    integers; avgdl re-derives probe-side with the same double
    *    division the direct path uses), and the bucket modulus the probe
    *    must reuse.
    *
    * 100 TB posture: the build is one tokenize + one (term, doc) shuffle
    * — the same work ONE direct BM25 query pays, amortized over every
    * probe thereafter. A probe reads only the matched buckets (~|terms|/
    * buckets of the layout), never touches corpus text, and a fresh crawl
    * batch appends by writing its postings into the same bucket scheme
    * with the manifest counters bumped. */
  def writeInvertedIndex(docs: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val tokenized = withWords(docs)
      .select(col("doc_id"), col("__words"), size(col("__words")).as("dl"))
    tokenized
      .select(col("doc_id"), col("dl"), explode(col("__words")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("p", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .write.partitionBy("p").mode("overwrite").parquet(s"$path/postings")
    tokenized.agg(count(lit(1)).as("n_docs"), sum(col("dl")).cast("long").as("sum_dl"))
      .withColumn("buckets", lit(buckets))
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Fold a new batch into a [[writeInvertedIndex]] layout — the
    * continuous-ingest shape completing the append triple (MinHash band
    * index, IVF cells, posting lists). Already-indexed doc_ids SKIP
    * (idempotent re-append, the IVF-append convention); fresh docs
    * tokenize once, their postings land in the SAME bucket scheme
    * (manifest modulus, not a parameter — probes and appends can never
    * disagree), and the manifest counters bump by exactly the fresh
    * docs' contribution, so append-then-probe is bit-identical to a
    * full rebuild over the union (q121 runs under q74's full-corpus
    * oracle to prove it).
    *
    * Per-append cost ∝ batch (+ one doc_id-projected scan of the layout
    * for the skip set — ids only, never postings payload). */
  def appendToInvertedIndex(newDocs: DataFrame, path: String): Unit =
      graft.util.MaintenanceLease.withWriterLease(
        path, "appendToInvertedIndex") {
    val spark = newDocs.sparkSession
    val m = spark.read.parquet(s"$path/manifest").head()
    val nDocs = m.getAs[Long]("n_docs")
    val sumDl = m.getAs[Long]("sum_dl")
    val buckets = m.getAs[Int]("buckets")
    val existing = spark.read.parquet(s"$path/postings").select("doc_id").distinct()
    // eager localCheckpoint PINS the fresh set before any write below:
    // the postings append and the stats aggregate both re-derive from it,
    // and neither may re-scan the layout after the append has already
    // changed it (the second action would otherwise see its own output
    // and compute an empty batch)
    val fresh = newDocs.join(existing, Seq("doc_id"), "left_anti").localCheckpoint()
    val tokenized = withWords(fresh)
      .select(col("doc_id"), col("__words"), size(col("__words")).as("dl"))
    tokenized
      .select(col("doc_id"), col("dl"), explode(col("__words")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("p", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .write.partitionBy("p").mode("append").parquet(s"$path/postings")
    val st = tokenized.agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s")).head()
    val (dN, dS) = (st.getAs[Long]("n"), if (st.isNullAt(1)) 0L else st.getAs[Long]("s"))
    spark.range(1).select(lit(nDocs + dN).as("n_docs"),
        lit(sumDl + dS).as("sum_dl"), lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** COMPACT a [[writeInvertedIndex]] layout's postings to ONE file per
    * bucket — the vacuum continuous ingest needs:
    * [[appendToInvertedIndex]] adds a file per touched bucket per batch,
    * so after thousands of micro-batches a probe of one bucket opens
    * thousands of tiny files (the classic streaming small-files
    * problem). Content is untouched: the postings ROWS and the manifest
    * are identical before and after, so append+compact ≡ rebuild (q228
    * proves it under the full-corpus BM25 oracle). One file per bucket
    * because `repartition(buckets, p)` puts each p value in exactly one
    * task and `partitionBy` splits per value — bucket size stays the
    * scan/task unit, sized by the bucket modulus chosen at build time.
    * Same stopped-writer window as the serving compaction: the rewrite
    * lands in a temp dir and swaps in by two renames; a crash between
    * them leaves `postings_old` intact for manual recovery and readers
    * of the half-state fail loudly rather than read half data. */
  def compactInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = graft.util.MaintenanceLease.withLease(
      path, "compactInvertedIndex") {
    import graft.util.Fs
    val buckets = spark.read.parquet(s"$path/manifest").head().getAs[Int]("buckets")
    val tmp = s"$path/postings_compact_tmp"
    Fs.rmTree(tmp)
    spark.read.parquet(s"$path/postings")
      .repartition(buckets, col("p"))
      .write.partitionBy("p").mode("overwrite").parquet(tmp)
    val live = s"$path/postings"
    val old = s"$path/postings_old"
    Fs.rmTree(old)
    Fs.move(live, old)
    Fs.move(tmp, live)
    Fs.rmTree(old)
  }

  /** DELETE documents from a [[writeInvertedIndex]] layout — the
    * right-to-be-forgotten pass every persisted serving artifact needs
    * (a source retraction or user-data deletion must leave the index AS
    * IF the docs were never ingested; filtering probe-side is not
    * deletion — the data would still be at rest). Contract:
    * delete ≡ rebuild-without — postings rows of the deleted doc_ids
    * vanish and the manifest counters decrement by exactly those docs'
    * (count, Σdl) contribution, so every downstream probe (n_docs,
    * avgdl, df, tf) is bit-identical to an index never containing them
    * (q235 proves it under the filtered-corpus BM25 oracle).
    *
    * I/O is O(touched buckets): only bucket dirs actually holding a
    * deleted doc's postings rewrite (a doc's terms hash across many
    * buckets, so a single doc touches up to |distinct terms| buckets —
    * batch deletions to amortize). Crash protocol (the compaction
    * posture, per-bucket): every displaced piece of old state — each
    * touched bucket dir AND the pre-delete manifest — parks OUTSIDE the
    * live tree in `postings_old_del/`, and the park is deleted only
    * after the new state is fully installed. A parked dir's presence is
    * the loud signal a prior run crashed (this function refuses to
    * start over one), and recovery is uniform at EVERY crash point:
    * move the park's contents back over the live tree (that is the
    * complete pre-delete state), remove the tmp dir, retry. Run inside
    * the same stopped-writer window as compaction, with probes paused —
    * mid-swap the live tree is missing parked pieces. */
  def deleteFromInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deleteIds: DataFrame): Unit = {
    import graft.util.Fs
    // parked-dir precondition BEFORE the lease (see the MinHash delete)
    val parked = s"$path/postings_old_del"
    require(!Fs.exists(parked),
      s"$parked exists — a prior delete crashed mid-swap; restore its bucket " +
        "dirs into postings/ (the pre-delete state) before retrying")
    graft.util.MaintenanceLease.withLease(path, "deleteFromInvertedIndex") {
    val m = spark.read.parquet(s"$path/manifest").head()
    val (nDocs, sumDl, buckets) = (m.getAs[Long]("n_docs"),
      m.getAs[Long]("sum_dl"), m.getAs[Int]("buckets"))
    // localCheckpoint, not persist: a deletion set naturally derives FROM
    // the index (retraction sweeps select out of it), and an evicted
    // persisted partition would recompute against the half-mutated layout
    val ids = deleteIds.select("doc_id").distinct().localCheckpoint()
    try {
      val postings = spark.read.parquet(s"$path/postings")
      val hit = postings.join(ids, Seq("doc_id"), "left_semi")
      // the deleted docs' manifest contribution: each doc's dl rides on
      // every posting row, so one distinct over (doc_id, dl) recovers it
      val st = hit.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s")).head()
      val (dN, dS) = (st.getAs[Long]("n"), if (st.isNullAt(1)) 0L else st.getAs[Long]("s"))
      // bounded collect: ≤ bucket-modulus values by construction
      val touched = hit.select("p").distinct().collect().map(_.getInt(0)).sorted
      if (touched.nonEmpty) {
        val tmp = s"$path/postings_delete_tmp"
        Fs.rmTree(tmp)
        // the write EXECUTES the filtered read of the old bucket dirs —
        // it must complete before any rename below touches them
        postings.filter(col("p").isin(touched.toSeq: _*))
          .join(ids, Seq("doc_id"), "left_anti")
          .repartition(touched.length, col("p"))
          .write.partitionBy("p").mode("overwrite").parquet(tmp)
        // park every touched bucket, then install the rewrites; nothing
        // old is destroyed before the manifest commits below
        Fs.mkdirs(parked)
        touched.foreach { b =>
          Fs.move(s"$path/postings/p=$b", s"$parked/p=$b")
        }
        touched.foreach { b =>
          val next = s"$tmp/p=$b"
          // a bucket whose every row was deleted has no rewritten dir
          if (Fs.isDir(next)) Fs.move(next, s"$path/postings/p=$b")
        }
        // decremented manifest: staged, then swapped in with the OLD one
        // parked beside the old buckets — the park stays a complete
        // pre-delete snapshot until the very end
        val mtmp = s"$path/manifest_delete_tmp"
        Fs.rmTree(mtmp)
        spark.range(1).select(lit(nDocs - dN).as("n_docs"),
            lit(sumDl - dS).as("sum_dl"), lit(buckets).as("buckets"))
          .write.mode("overwrite").parquet(mtmp)
        Fs.move(s"$path/manifest", s"$parked/manifest")
        Fs.move(mtmp, s"$path/manifest")
        // install complete — seal + marker-last teardown: a partial
        // park without its marker can no longer exist, so a recovery
        // can never restore a remnant beside the already-decremented
        // manifest and double-decrement it on retry (r20 review #1)
        graft.util.MaintenanceLease.sealAndDismantlePark(parked)
        Fs.rmTree(tmp)
      }
    } finally { Dedup.releaseLocalCheckpoint(ids) }
    }
  }

  /** BM25 over a [[writeInvertedIndex]] layout — bit-identical to
    * [[bm25Scores]] on the same corpus (they share [[bm25Rank]]; q119
    * runs under q74's oracle to prove the layout loses nothing). The
    * query terms hash to their buckets in one bounded driver-side job
    * (≤ |terms| rows — the probed-cells convention), the postings scan
    * keeps only those partitions, and the manifest is read BY NAME. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25FromIndex needs at least one query term")
    val m = spark.read.parquet(s"$path/manifest").head()
    val nDocs = m.getAs[Long]("n_docs")
    val sumDl = m.getAs[Long]("sum_dl")
    val buckets = m.getAs[Int]("buckets")
    import spark.implicits._
    val bucketIds = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(buckets.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("p").isin(bucketIds: _*) && col("term").isin(terms.map(lit): _*))
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    val corpus = spark.range(1).select(lit(nDocs).as("n_docs"),
      (lit(sumDl).cast("double") / lit(nDocs).cast("double")).as("avgdl"))
    bm25Rank(tf, corpus, k1, b, topK)
  }

  /** Unicode script blocks counted by [[scriptStats]], in VERDICT
    * priority order (ties in the argmax resolve to the earliest entry).
    * Ranges are spelled `[\x{...}-\x{...}]` — the hex-codepoint class
    * syntax Java regex and RE2 share, so the SAME pattern strings drive
    * operator and oracle. */
  private[graft] val scriptBlocks: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]")

  /** Per-document Unicode SCRIPT profile — the routing signal a
    * multilingual corpus needs before any language-specific stage (which
    * tokenizer, which language-ID profile set, which quality model):
    * counts of characters in the major script blocks plus `main_script` =
    * the highest-count script (earliest [[scriptBlocks]] entry on ties,
    * `none` when no block character occurs — symbols/digits-only docs).
    *
    * Character COUNTS, not byte counts, and only dominant-block ranges —
    * full Unicode script property groups (`\p{IsCyrillic}`) are spelled
    * differently across engines, so the shared hex-range classes keep the
    * operator portable and the oracle exact.
    *
    * 100 TB shape: pure codegen'd projection (5 regex scans per row, each
    * O(len)); zero shuffle, zero UDF. */
  def scriptStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = scriptBlocks.foldLeft(docs.select(col("doc_id"), col(textCol))) {
      case (acc, (name, pat)) => acc.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))
    }
    val best = greatest(scriptBlocks.map { case (n, _) => col(s"n_$n") }: _*)
    val verdict = scriptBlocks.foldLeft(when(best === 0, "none")) {
      case (acc, (name, _)) => acc.when(col(s"n_$name") === best, name)
    }.otherwise("none") // null text counts as script-free
    counted.select(col("doc_id") +:
      scriptBlocks.map { case (n, _) => col(s"n_$n") } :+
      verdict.as("main_script"): _*)
  }

  /** Snapshot diff between two corpus versions — the audit report a
    * continuously-refreshed training corpus publishes alongside its
    * dataset card (what did the latest crawl ADD / REMOVE / REWRITE, and
    * how did the token volume move, per source): one row per source with
    * added / removed / changed / unchanged doc counts and the net word
    * delta. "Changed" = same doc_id, different content hash.
    *
    * 100 TB shape: both sides project to (doc_id, source, md5, words)
    * BEFORE the full-outer join — text never shuffles, the join carries
    * 4 slim columns, and the per-source rollup partial-aggregates
    * map-side into a handful of rows. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def prep(df: DataFrame, tag: String) = df.select(
      col("doc_id"), col("source").as(s"${tag}_source"),
      md5(col("text")).as(s"${tag}_h"),
      size(split(col("text"), " ")).cast("long").as(s"${tag}_nw"))
    val st = col("status")
    prep(oldDocs, "o").join(prep(newDocs, "n"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("n_source"), col("o_source")).as("source"),
        when(col("o_h").isNull, "added")
          .when(col("n_h").isNull, "removed")
          .when(col("o_h") =!= col("n_h"), "changed")
          .otherwise("unchanged").as("status"),
        (coalesce(col("n_nw"), lit(0L)) - coalesce(col("o_nw"), lit(0L))).as("dw"))
      .groupBy("source")
      .agg(
        sum(when(st === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(st === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(st === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(st === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(col("dw")).as("word_delta"))
  }

  /** Σ n·ln(n) over the equal-element runs of a SORTED string array,
    * folded in-row: element j of a run contributes j·ln j − (j−1)·ln(j−1)
    * (telescoping to n·ln n per run), so no per-run close-out state is
    * needed and the fold stays a flat struct. Since r21 this is the
    * REFERENCE formulation only — [[entropyStats]] runs the codegen'd
    * [[graft.functions.SortedRunNLnN]]; ExpressionsSpec pins the two
    * bit-identical (the lshSignatureInterpreted parity pattern). */
  private[graft] def runNLnN(sortedArr: Column): Column =
    aggregate(
      sortedArr,
      struct(lit("").as("prev"), lit(0L).as("r"), lit(0.0).as("s"), lit(true).as("first")),
      (acc, x) => {
        val r = when(acc("first") || x =!= acc("prev"), lit(1L)).otherwise(acc("r") + 1L)
        val rd = r.cast("double")
        val prevTerm = when(r === 1L, lit(0.0))
          .otherwise((rd - 1.0) * log(rd - 1.0))
        struct(x.as("prev"), r.as("r"),
          (acc("s") + rd * log(rd) - prevTerm).as("s"), lit(false).as("first"))
      },
      acc => acc("s"))

  /** Per-document Shannon ENTROPY signals — the Dolma/Gopher-family
    * gibberish-and-template detector: character entropy (base64 blobs /
    * binary-ish payloads score HIGH, single-character runs LOW) and word
    * unigram entropy (templated/repetitive text scores LOW for its
    * length). H = ln N − (Σ_v n_v·ln n_v)/N over the doc's own
    * char/word counts, computed ENTIRELY in-row: sort the array, fold
    * run lengths (the qualityRules longest-run idiom) — zero shuffle,
    * map-side at 100 TB like stats/readability. round-6 on the
    * transcendental outputs (the q60 policy). Empty-text docs are
    * excluded (the engines' char-split conventions diverge on '');
    * returns (doc_id, n_chars, char_entropy, n_words, word_entropy). */
  def entropyStats(docs: DataFrame): DataFrame = {
    // r21: sort + run fold compiled into ONE codegen'd expression
    // (SortedRunNLnN sorts internally in the same binary order array_sort
    // used and replays runNLnN's accumulation bit-for-bit — see its
    // scaladoc; the interpreted per-element fold dominated this operator's
    // row cost). The unsorted arrays still materialize as columns: each is
    // referenced twice (size + scan).
    val nonEmpty = docs.filter(length(col("text")) > 0)
    val nlnn = graft.functions.RunFunctions.sorted_run_nlnn _
    withWords(nonEmpty)
      .withColumn("__sc", split(col("text"), ""))
      .select(
        col("doc_id"),
        size(col("__sc")).cast("long").as("n_chars"),
        round(log(size(col("__sc")).cast("double")) -
          nlnn(col("__sc")) / size(col("__sc")).cast("double"), 6)
          .as("char_entropy"),
        size(col("__words")).cast("long").as("n_words"),
        round(log(size(col("__words")).cast("double")) -
          nlnn(col("__words")) / size(col("__words")).cast("double"), 6)
          .as("word_entropy"))
  }

  /** LINE-REPETITION signals (Rae et al. 2021 §A1.1, the line/paragraph
    * half of the repetition rulebook — [[qualityRules]] carries the
    * word/n-gram half): fraction of LINE occurrences that belong to a
    * line duplicated within the document, and the fraction of line
    * CHARACTERS those occurrences own — the boilerplate/template signal
    * ("subscribe" footers, navigation stubs repeated down a page) that
    * word-level rules dilute. Per doc: (doc_id, n_lines,
    * n_distinct_lines, dup_line_frac_e6, dup_char_frac_e6), fractions in
    * integer micro-units over exact counts.
    *
    * Entirely in-row (no shuffle at any scale): lines sort per row and a
    * single fold counts run starts (distinct), occurrences in runs of
    * length ≥ 2 and their characters — the [[entropyStats]] longest-run
    * idiom, with the r=2 step retro-counting the run's first member. An
    * empty document is its one empty line (split semantics, both
    * engines). */
  def lineRepetitionSignals(docs: DataFrame): DataFrame = {
    // materialize the sorted line array once (the words()/withWords PERF
    // note: per-element lambdas re-evaluate inline expressions)
    val sorted = array_sort(split(col("text"), java.util.regex.Pattern.quote("\n"), -1))
    val fold = aggregate(
      col("__ls"),
      struct(lit("").as("prev"), lit(0L).as("r"), lit(0L).as("nd"),
        lit(0L).as("occ"), lit(0L).as("chars"), lit(true).as("first")),
      (acc, x) => {
        val r = when(acc("first") || x =!= acc("prev"), lit(1L)).otherwise(acc("r") + 1L)
        val mult = when(r === 2L, lit(2L)).when(r > 2L, lit(1L)).otherwise(lit(0L))
        struct(x.as("prev"), r.as("r"),
          (acc("nd") + when(r === 1L, 1L).otherwise(0L)).as("nd"),
          (acc("occ") + mult).as("occ"),
          (acc("chars") + mult * length(x)).as("chars"),
          lit(false).as("first"))
      })
    docs
      .select(col("doc_id"), sorted.as("__ls"))
      .select(col("doc_id"),
        size(col("__ls")).cast("long").as("n_lines"),
        aggregate(col("__ls"), lit(0L), (a, x) => a + length(x)).as("__tc"),
        fold.as("__f"))
      .select(col("doc_id"), col("n_lines"),
        col("__f")("nd").as("n_distinct_lines"),
        expr("(1000000 * __f.occ) div n_lines").as("dup_line_frac_e6"),
        expr("(1000000 * __f.chars) div greatest(__tc, 1)").as("dup_char_frac_e6"))
  }

  /** WITHIN-document line dedup — the cleaning counterpart of
    * [[lineRepetitionSignals]] (detect → remove), and the within-doc
    * sibling of [[Dedup.removeCommonLines]]'s cross-doc gate: keep each
    * line's FIRST occurrence in document order, drop every repeat — the
    * Dolma/RefinedWeb "repeated navigation/footer lines" cleanup. Output
    * (doc_id, text_deduped, n_removed_lines), the q97 contract shape.
    *
    * Entirely in-row (no shuffle at any scale): a positional HOF filter
    * keeps line i iff it does not appear among lines 0..i-1 — O(n²) per
    * document in the line count, which is bounded by the document, not
    * the corpus (a 1000-line page is 10⁶ cheap comparisons). The oracle
    * replays it relationally (row_number per (doc, line) in position
    * order, keep rn = 1, re-aggregate) — an independent formulation. */
  def dedupeLinesWithinDoc(docs: DataFrame): DataFrame = {
    val ls = split(col("text"), java.util.regex.Pattern.quote("\n"), -1)
    docs.select(col("doc_id"), ls.as("__ls"))
      .select(col("doc_id"), col("__ls"),
        filter(col("__ls"),
          (x, i) => !array_contains(slice(col("__ls"), lit(1), i), x))
          .as("__kept"))
      .select(col("doc_id"),
        array_join(col("__kept"), "\n").as("text_deduped"),
        (size(col("__ls")) - size(col("__kept"))).cast("int").as("n_removed_lines"))
  }

  /** DEFLATE COMPRESSION-RATIO quality signal — the Dolma/Gopher
    * "gibberish or template" detector that [[entropyStats]] cannot see:
    * character entropy is memoryless, so a page that repeats a 40-word
    * template 50 times scores like prose, while DEFLATE's LZ77 window
    * catches the long-range repetition and crushes it. Conversely
    * near-incompressible text (hash dumps, minified blobs, encrypted
    * payloads) pins the ratio near 1. Per doc:
    * (doc_id, n_bytes, deflate_bytes, ratio_e6, verdict) with
    * ratio_e6 = 10⁶·deflate_bytes div n_bytes (integer micro-units) and
    * verdict 'empty' | 'repetitive' (≤ repetitiveMaxE6) |
    * 'random' (≥ randomMinE6) | 'ok'.
    *
    * Determinism: java.util.zip.Deflater at a FIXED level (6) with
    * nowrap=true (no zlib header/checksum — the byte count is the raw
    * stream) is a deterministic function of the input bytes for the
    * JDK's bundled zlib, so the ratio is rerun-stable; cross-engine
    * oracles can't deflate, so queries verify planted-class verdicts
    * structurally (the q136 posture) and unit pins fix exact byte
    * counts on hand-built strings.
    *
    * Scale: the textbook mapPartitions case (the [[Multimodal]]
    * boundary — a native-resource codec no Catalyst expression can
    * host): ONE Deflater per partition, reset per row, released via the
    * task-completion listener even on failure (native zlib buffers
    * otherwise wait for finalization — the round-8 Warc lesson). Text
    * never shuffles; only the 5-column metadata leaves the scan. */
  def compressionRatio(docs: DataFrame, textCol: String = "text",
      repetitiveMaxE6: Long = 250000L, randomMinE6: Long = 490000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(repetitiveMaxE6 < randomMinE6,
      s"thresholds must be ordered, got $repetitiveMaxE6 >= $randomMinE6")
    val sized = docs.selectExpr("doc_id", s"coalesce($textCol, '') AS __t")
      .as[(Long, String)]
      .mapPartitions { it =>
        val defl = new java.util.zip.Deflater(6, true)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => defl.end()))
        val buf = new Array[Byte](8192)
        it.map { case (id, t) =>
          val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          defl.reset(); defl.setInput(bytes); defl.finish()
          var out = 0L
          while (!defl.finished()) out += defl.deflate(buf)
          (id, bytes.length.toLong, out)
        }
      }.toDF("doc_id", "n_bytes", "deflate_bytes")
    sized.withColumn("ratio_e6",
        expr("(1000000 * deflate_bytes) div greatest(n_bytes, 1)"))
      .withColumn("verdict",
        when(col("n_bytes") === 0, "empty")
          .when(col("ratio_e6") <= repetitiveMaxE6, "repetitive")
          .when(col("ratio_e6") >= randomMinE6, "random")
          .otherwise("ok"))
  }

  /** Cross-source VOCABULARY OVERLAP — the corpus-composition report
    * beside [[corpusDiff]]: for every pair of sources, the exact Jaccard
    * similarity of their distinct-word sets (how lexically alike two
    * slices are — near-identical mirrors surface at the top, a fully
    * disjoint slice signals a language/domain outlier or an extraction
    * bug). One row per unordered pair with src_a < src_b:
    * (src_a, src_b, n_common, jaccard_e6), Jaccard in integer
    * micro-units (10⁶·|A∩B| div (|A|+|B|−|A∩B|), the q113/q126 policy —
    * bit-exact in any engine). Pairs with an EMPTY intersection are
    * absent (they never meet the join).
    *
    * 100 TB shape: the corpus reduces to distinct (source, word) pairs —
    * vocabulary × sources rows, partial-distinct map-side — and the
    * word-keyed self-join fans each word out to at most |sources|²
    * pairs, a CONSTANT per word (this is the exact small-|sources| path;
    * thousands of slices would want per-source MinHash signatures — ≤
    * |sources| signature rows, the [[Dedup]] banding machinery — traded
    * against estimate error). */
  def sourceOverlap(docs: DataFrame, srcCol: String = "source"): DataFrame = {
    val sw = withWords(docs)
      .select(col(srcCol).as("src"), explode(col("__words")).as("word"))
      .distinct()
    val sizes = sw.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = sw.toDF("src_a", "word")
      .join(sw.toDF("src_b", "word"), "word")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        expr("(1000000 * n_common) div (n_a + n_b - n_common)").as("jaccard_e6"))
  }

  /** Canonical text normalization — the standard prep step before exact
    * dedup so that case / punctuation / whitespace variants of the same
    * content collapse to one key: lowercase, strip every character outside
    * `[a-z0-9 ]`, collapse runs of spaces, trim. Patterns are plain
    * character classes so Java regex (Spark) and RE2 (DuckDB/Go) agree
    * byte-for-byte. Pure map-side projection. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Exact dedup on NORMALIZED text ([[normalizeText]]) — catches the
    * shouting / re-punctuated / re-spaced copies that byte-exact dedup
    * ([[Dedup.exact]]) misses. Same output contract as `Dedup.exact`: one
    * row per distinct normalized form, smallest doc_id as the canonical
    * keeper, plus the collapsed-copy count.
    *
    * 100 TB shape: identical to Dedup.exact — normalization and hashing are
    * map-side, so the one shuffle carries (md5, doc_id) and never the
    * document body. */
  def normalizedDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), normalizeText(col("text")).as("__norm"))
      .groupBy(md5(col("__norm")).as("norm_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Blocklist (badword) screening — the C4 "naughty words" / RefinedWeb
    * UT1 content filter: per document, count token occurrences that hit a
    * pinned term list and flag documents for removal. Policy knobs cover
    * both published conventions: C4 drops on ANY hit (`maxFracMicro = 0`),
    * RefinedWeb-style soft filters drop above an occurrence FRACTION
    * (`keep` compares `bad_count / n_words` against the threshold with an
    * integer cross-multiply — no float division, so the verdict is
    * bit-identical cross-engine).
    *
    * Tokens are lowercased alphanumeric runs (`[^a-z0-9]+` split — the
    * same engine-portable class [[normalizeText]] uses), so punctuation
    * and case can't smuggle a listed term past the filter.
    *
    * 100 TB shape: ZERO shuffle — a pure codegen'd projection. The term
    * list ships as a literal array and `array_intersect` builds its hash
    * set once per row: O(tokens + terms) membership, then the occurrence
    * count rescans tokens only against the (almost always tiny, usually
    * empty) per-doc hit set. Term lists are blocklist-sized (hundreds to
    * a few thousand); a list too large for a literal belongs in the
    * explode + broadcast-join shape instead — at that point revisit. */
  def badwordStats(docs: DataFrame, terms: Seq[String],
      maxFracMicro: Long = 0L, textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase(java.util.Locale.ROOT)),
      "terms must be non-empty and lowercase (tokens are lowercased before matching)")
    require(maxFracMicro >= 0, s"maxFracMicro must be >= 0, got $maxFracMicro")
    val termArr = array(terms.map(lit): _*)
    docs.select(col("doc_id"),
        expr(s"filter(split(lower($textCol), '[^a-z0-9]+'), x -> x != '')").as("__toks"))
      .withColumn("__hits", array_intersect(col("__toks"), termArr))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_words"),
        expr("cast(size(filter(__toks, x -> array_contains(__hits, x))) as long)")
          .as("bad_count"))
      // keep iff bad_count/n_words <= maxFracMicro/1e6, integer-exact;
      // an empty doc has nothing listed on it and keeps. FENCED (r21) so a
      // downstream filter on the verdict cannot re-inline the tokenize +
      // intersect chain into a scan-level Filter (the quality_pass note).
      .withColumn("keep",
        graft.functions.OptimizerFence.fence(
          col("bad_count") * 1000000L <= col("n_words") * maxFracMicro))
  }

  /** Corpus-level top-`k` word n-grams by exact count — the frequency
    * profile that feeds stopword lists, boilerplate detection, and the
    * hot-gram guards of the dedup operators. Ties break lexicographically.
    *
    * 100 TB shape: the explode's output partial-aggregates map-side
    * (hash-agg combine) before the one shuffle on `gram`; the final top-k
    * plans as TakeOrderedAndProject below the single-partition rank window —
    * each upstream partition forwards at most k (gram, count) pairs. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // docs shorter than n words yield no grams; without the filter,
    // sequence(0, negative) would generate a DESCENDING index sequence
    val grams = withWords(docs)
      .filter(size(col("__words")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("__words")) - n),
        i => array_join(slice(col("__words"), i + 1, lit(n)), " "))).as("gram"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("gram"))
    // r22: top-k via orderBy().limit(k) — a parallel TakeOrderedAndProject
    // over the partial-aggregated gram counts — instead of a one-partition
    // row_number window over EVERY distinct gram (the gram vocabulary
    // grows with the corpus, so that window was a real serial point at
    // scale). (cnt DESC, gram) is a total order, so the kept set is
    // identical; the rank window now runs over k rows only.
    grams.groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram")).limit(k)
      .withColumn("rnk", row_number().over(w))
      .select(col("gram"), col("cnt"), col("rnk"))
  }

  /** Model-based quality score (the DCLM-style step past [[qualityRules]]'
    * hard gates): ONE linear scorer over the already-verified features,
    * with a PINNED weight vector so the filter is deterministic and the
    * oracle is the same linear form in SQL. Weights follow the public
    * rationale of the Gopher/CCNet/DCLM filter families:
    *   +0.20 · min(n_words, 256)/256      (longer docs, saturating)
    *   +0.25 · alpha_frac                 (prose, not markup/symbol soup)
    *   +0.15 · min(2·stopword_ratio, 1)   (function words ⇒ natural text)
    *   +0.20 · clamp((lm + 8)/5, 0, 1)    (corpus-typical wording; the
    *                                       window spans per-word ln P of
    *                                       perplexity ≈ 20…3000 text)
    *   −0.10 · dup_word_frac              (repetition penalties)
    *   −0.10 · top_bigram_frac
    * quality_keep = score ≥ 0.40, a threshold that splits this corpus
    * ~40/60 at every SF (a discriminating operating point, not a
    * vacuous one). Score rounds to 6 decimals (the q60/q74 policy).
    *
    * 100 TB shape: the feature inputs are the verified operators' own
    * plans — map-side projections plus [[lmScore]]'s vocabulary-sized
    * aggregates — and the three feature frames co-partition on doc_id
    * after the first exchange. Docs outside [[lmScore]]'s output (no
    * words) default to the window floor, keeping the scorer total. */
  def qualityScore(docs: DataFrame): DataFrame =
    qualityScoreFeatures(docs).select("doc_id", "quality_score", "quality_keep")

  /** [[qualityScore]] widened by the rule features it is computed from
    * (n_words, dup_word_frac, top_bigram_frac, alpha_frac, quality_pass,
    * stopword_ratio) — for composites like the curation scorecard that
    * consume the score AND the hard gates: one fused chain instead of two
    * parallel rule evaluations joined back on doc_id (r21). Score-only
    * callers go through [[qualityScore]]; Catalyst prunes the unused
    * feature expressions there. */
  private[graft] def qualityScoreFeatures(docs: DataFrame): DataFrame = {
    val lp = coalesce(col("avg_logprob"), lit(-8.0))
    // rules + stopword ratio come out of ONE fused projection (r21 —
    // previously a second whole-corpus tokenization joined back on doc_id)
    qualityRuleFeatures(docs)
      .join(lmScore(docs).select(col("doc_id"), col("avg_logprob")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
        col("top_bigram_frac"), col("alpha_frac"), col("quality_pass"),
        col("stopword_ratio"),
        // the score is FENCED like quality_pass above: a pushed filter on
        // quality_keep would re-derive the whole feature chain inside a
        // scan-level Filter (r21; same mechanism, same zero value change)
        graft.functions.OptimizerFence.fence(round(
          lit(0.2) * (least(col("n_words"), lit(256)).cast("double") / lit(256.0)) +
            lit(0.25) * col("alpha_frac") +
            lit(0.15) * least(col("stopword_ratio") * lit(2.0), lit(1.0)) +
            lit(0.2) * greatest(lit(0.0), least(lit(1.0), (lp + lit(8.0)) / lit(5.0))) -
            lit(0.1) * col("dup_word_frac") -
            lit(0.1) * col("top_bigram_frac"), 6)).as("quality_score"))
      .withColumn("quality_keep", col("quality_score") >= 0.4)
  }

  // ───────────────────────── encoding repair ──────────────────────────
  //
  // ftfy's deterministic core for crawl text: cp1252-in-UTF-8 mojibake
  // reversal ("Ã©" → "é"), double-encoded UTF-8 (one more round of the
  // same reversal), and control-character stripping. Everything is pure
  // codegen'd expression work — map-side at any scale.

  /** windows-1252 byte→char image for bytes 0x80–0xFF (WHATWG table: the
    * 0x80–0x9F specials, the five undefined bytes passing through as the
    * matching C1 controls — Java's own windows-1252 charset agrees — and
    * 0xA0–0xFF straight latin-1). Index = byte − 0x80. */
  private[graft] val cp1252Image: String = {
    val specials = Map(
      0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192, 0x84 -> 0x201E,
      0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02C6,
      0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039, 0x8C -> 0x0152,
      0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201C,
      0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
      0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161, 0x9B -> 0x203A,
      0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    (0x80 to 0xFF).map(b => specials.getOrElse(b, b).toChar).mkString
  }

  /** The non-latin-1 cp1252 image chars, codepoint → byte — the only
    * lookups the reverse map needs (every other char's byte IS its
    * codepoint); 27 entries, so the literal-map scan is negligible. */
  private[graft] val cp1252SpecialByte: Map[Int, Int] =
    cp1252Image.zipWithIndex.collect {
      case (c, i) if c.toInt != i + 0x80 => c.toInt -> (i + 0x80)
    }.toMap

  /** Character class of the cp1252 image of bytes [lo, hi] (none of the
    * image chars are class metacharacters, so no escaping needed). */
  private def imgCls(lo: Int, hi: Int): String =
    "[" + cp1252Image.substring(lo - 0x80, hi - 0x80 + 1) + "]"

  /** One well-formed-UTF-8 multibyte sequence, seen through cp1252 eyes —
    * the mojibake "cluster". Alternatives follow the standard well-formed
    * byte-range table (C2–DF, E0 A0–BF, E1–EC, ED 80–9F, EE–EF, F0 90–BF,
    * F1–F3, F4 80–8F + trail bytes 80–BF), so a guarded string always
    * reconstructs to VALID UTF-8 — no replacement-char fallback can fire —
    * and every alternative starts with a DISJOINT lead class, so the
    * regex match is single-choice at each position (linear, no
    * backtracking blowup on long documents). */
  private[graft] val mojibakeClusterRe: String = {
    val trail = imgCls(0x80, 0xBF)
    "(?:" + imgCls(0xC2, 0xDF) + trail +
      "|" + imgCls(0xE0, 0xE0) + imgCls(0xA0, 0xBF) + trail +
      "|" + imgCls(0xE1, 0xEC) + trail + trail +
      "|" + imgCls(0xED, 0xED) + imgCls(0x80, 0x9F) + trail +
      "|" + imgCls(0xEE, 0xEF) + trail + trail +
      "|" + imgCls(0xF0, 0xF0) + imgCls(0x90, 0xBF) + trail + trail +
      "|" + imgCls(0xF1, 0xF3) + trail + trail + trail +
      "|" + imgCls(0xF4, 0xF4) + imgCls(0x80, 0x8F) + trail + trail + trail + ")"
  }

  /** Full-string guard: every char is ASCII or part of a well-formed
    * cluster. This is the precision lever — genuine latin-1 text ("déjà
    * vu", "À la carte") has standalone accented chars that belong to no
    * cluster, so it NEVER converts; only text whose every non-ASCII char
    * lines up into valid UTF-8-through-cp1252 sequences does. */
  private[graft] val mojibakeFullRe: String =
    "^(?:[\\x00-\\x7F]|" + mojibakeClusterRe + ")*$"

  /** C0 controls except \t \n \r, DEL, and C1 controls — stripped AFTER
    * mojibake reversal (a C1 char may be a legitimate mojibake trail
    * byte's image before reversal, e.g. 0x9D). */
  private[graft] val controlCharRe: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"

  /** One round of mojibake reversal: if the WHOLE string passes the
    * cluster guard and contains at least one cluster, re-read it as the
    * cp1252 bytes it displays as, decoded as UTF-8; otherwise unchanged.
    * The char→byte step is arithmetic (codepoint IS the byte for ASCII
    * and latin-1; a 27-entry literal map covers the cp1252 specials) —
    * O(1) per char inside codegen, not a 128-entry map scan. */
  private def fixMojibakeOnce(c: Column): Column = {
    val ch = (x: Column) => {
      val cp = ascii(x)
      // cp <= 0xFF → byte IS the codepoint: ASCII, latin-1, and the five
      // C1 passthrough images (0x81 8D 8F 90 9D — the guard admits no
      // OTHER char in 0x80–0x9F, since only image chars are in the trail
      // class); everything else is one of the 27 cp1252 specials
      val b = when(cp <= 0xFF, cp)
        .otherwise(element_at(typedLit(cp1252SpecialByte), cp))
      lpad(hex(b), 2, "0")
    }
    val decoded = decode(unhex(array_join(transform(split(c, ""), ch), "")), "UTF-8")
    // guard order matters for throughput: the unanchored cluster probe is
    // a cheap scan that fails fast on clean (ASCII-dominated) text, while
    // the anchored whole-string alternation is the expensive check — && is
    // left-to-right, so the probe must come FIRST (measured: the swapped
    // order charged every clean page the anchored scan, ~3 s of q96's
    // 4.3 s at sf0.1)
    when(c.rlike(mojibakeClusterRe) && c.rlike(mojibakeFullRe), decoded).otherwise(c)
  }

  /** Encoding repair as a column expression: up to TWO rounds of mojibake
    * reversal (round two catches double-encoded UTF-8; singly-encoded text
    * comes out clean after round one, fails the guard — its accents are
    * standalone now — and passes round two untouched), then the control
    * strip. NULL in, NULL out. */
  def fixEncodingCol(c: Column): Column =
    regexp_replace(fixMojibakeOnce(fixMojibakeOnce(c)), controlCharRe, "")

  /** Encoding repair over a corpus: adds `fixed_text` alongside the input
    * columns. Pure projection — no shuffle at any scale. */
  def fixEncoding(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fixed_text", fixEncodingCol(col(textCol)))

  /** Unicode NFC normalization as a column expression (see
    * [[graft.functions.NfcNormalize]]): canonicalize composed/decomposed
    * variants before any hash-based stage. Codegen'd; ASCII and
    * already-NFC rows pass through without re-encoding. */
  def nfcNormalizeCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** NFC normalization over a corpus: adds `text_nfc` alongside the input
    * columns. Pure projection — no shuffle at any scale; belongs directly
    * after encoding repair and before any dedup/tokenization. */
  def nfcNormalize(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("text_nfc", nfcNormalizeCol(col(textCol)))
}
