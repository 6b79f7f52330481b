package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning (SFT) data preparation: the stage a training-data
  * pipeline runs AFTER curation, when curated interaction logs become
  * supervised conversations — threading events into sessions, rendering
  * each session through a chat template, computing the per-turn LOSS-MASK
  * spans a trainer needs (loss on assistant turns only — the standard SFT
  * recipe), and constructing preference pairs (chosen, rejected) for
  * DPO/RLHF-style training from quality-scored documents.
  *
  * Conversation semantics: events thread into sessions with the
  * [[graft.SparkEntry]] q33 gap rule (> 30 min of silence opens a new
  * session per user); within a session, turns order by (ts, event_id) and
  * roles ALTERNATE user/assistant by turn parity (turn 0 = user) — the
  * canonical SFT shape. Turn text renders through a `<|role|>` template
  * over the event's type and its integer `k` prop; the transcript joins
  * turns with `\n`. Everything downstream (char offsets, context-length
  * gates) is exact integer arithmetic over those strings, so a SQL oracle
  * replays the whole family verbatim (`string_agg ... ORDER BY`).
  *
  * 100 TB shape: sessionization and turn indexing are two windows over
  * the SAME (user_id)-family partitioning — one shuffle, no global
  * window; rendering is one (user_id, session_id) aggregation with an
  * in-group `array_sort` (deterministic regardless of arrival order);
  * preference pairs use per-bucket rank windows whose `rank <= k` filters
  * prune via WindowGroupLimit (each partition forwards at most k rows per
  * side) plus a broadcast of the per-bucket counts — never a cartesian.
  */
object Dialogue {

  /** Session gap: 30 minutes, the q33 constant (nanoseconds). */
  private val gapNs = 1800000000000L

  private def roleOf(turnIdx: Column): Column =
    when(pmod(turnIdx, lit(2)) === 0, lit("user")).otherwise(lit("assistant"))

  /** Events threaded into conversation turns: q33 sessionization + per-
    * session turn index + alternating role + chat-template turn text
    * `<|role|>{event_type} k={k}` (k = the integer prop — the one piece
    * of event payload that renders identically in both engines; floats
    * never enter a transcript). The k extraction coalesces to '' so
    * `turn_txt` is TOTAL even on a null-`props` event (r13 ADVICE: a
    * null turn_txt would silently drop the turn from
    * [[tokenLossMasks]]'s profile join while [[lossMaskSpans]] kept it,
    * breaking the documented char-span agreement between the two). */
  def turns(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("props"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(byUser).cast("int"))
      .withColumn("turn_idx", (row_number().over(bySession) - 1).cast("int"))
      .withColumn("role", roleOf(col("turn_idx")))
      .withColumn("turn_txt",
        concat(lit("<|"), col("role"), lit("|>"), col("event_type"),
          lit(" k="), coalesce(regexp_extract(col("props"), "(\\d+)", 1), lit(""))))
      .select("event_id", "user_id", "session_id", "turn_idx", "role", "turn_txt")
  }

  /** Render each session to one training example: (user_id, session_id,
    * n_turns, transcript, n_chars, fits_context). The transcript joins
    * turn texts with `\n` in turn order (an in-group `array_sort` on
    * (turn_idx, txt) structs — bit-deterministic under any partitioning);
    * `fits_context` is the context-length gate (chars ≤ `maxChars`) an
    * SFT pipeline drops or truncates on. */
  def renderConversations(events: DataFrame, maxChars: Int = 32): DataFrame =
    turns(events)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).cast("int").as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("turn_idx"), col("turn_txt")))),
            x => x.getField("turn_txt")),
          "\n").as("transcript"))
      .withColumn("n_chars", length(col("transcript")).cast("long"))
      .withColumn("fits_context", col("n_chars") <= maxChars)

  /** Per-turn LOSS-MASK spans into the rendered transcript: character
    * offsets [char_start, char_end) of each turn (the `\n` separators
    * accounted — turn i starts at Σ_{j<i}(len_j + 1)), with `loss` true
    * exactly on assistant turns — the standard SFT masking (loss on model
    * turns, none on user turns). `substring(transcript, char_start + 1,
    * n_chars) == turn_txt` by construction (pinned in DialogueSpec).
    * Pure integer window arithmetic — one running sum per session. */
  def lossMaskSpans(events: DataFrame): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_id").orderBy("turn_idx")
    turns(events)
      .withColumn("n_chars", length(col("turn_txt")).cast("long"))
      .withColumn("char_start",
        (sum(col("n_chars") + 1).over(bySession) - col("n_chars") - 1).cast("long"))
      .withColumn("char_end", (col("char_start") + col("n_chars")).cast("long"))
      .withColumn("loss", col("role") === "assistant")
      .select("user_id", "session_id", "turn_idx", "role", "n_chars",
        "char_start", "char_end", "loss")
  }

  /** TOKEN-aligned loss masks: [[lossMaskSpans]]'s per-turn spans lifted
    * from character offsets to WordPiece token ranges — what a trainer
    * actually masks is token positions, not characters. Each turn's
    * token count is the sum of [[WordPiece.tokenize]] over the turn
    * text's letter runs (`[A-Za-z]+` — the template's `<|`/`|>`/`k=N`
    * punctuation and digits separate words and contribute no tokens, so
    * per-turn tokenization concatenates to exactly the rendered
    * transcript's token stream: a letter run never spans the `\n` turn
    * separator); `[tok_start, tok_end)` is the per-session running sum
    * in turn order, beside the q192 char spans from the SAME window.
    *
    * 100 TB shape: `turn_txt` is a pure function of (role, event_type,
    * k), so the token-count profile derives from a DIMENSION-sized
    * distinct over the raw events (partial-agg distinct, no session
    * windows on that branch), its distinct words tokenize once against
    * the broadcast vocabulary ([[WordPiece.wordTokenDict]], the q188
    * posture), and the profile broadcasts back onto the turn stream —
    * the fact keeps q192's single user-family shuffle, with the char
    * and token running sums sharing one window partitioning. */
  def tokenLossMasks(events: DataFrame, vocab: Seq[String]): DataFrame = {
    val combos = events
      .select(col("event_type"),
        coalesce(regexp_extract(col("props"), "(\\d+)", 1), lit("")).as("k"))
      .distinct()
      .withColumn("role", explode(array(lit("user"), lit("assistant"))))
      .withColumn("turn_txt", concat(lit("<|"), col("role"), lit("|>"),
        col("event_type"), lit(" k="), col("k")))
      .select("turn_txt")
    val comboWords = combos.select(col("turn_txt"),
      explode(expr("regexp_extract_all(turn_txt, '[A-Za-z]+', 0)")).as("word"))
    val dict = WordPiece.wordTokenDict(
      comboWords.select("word").distinct(), vocab)
    val profile = comboWords
      .join(broadcast(dict), "word")
      .groupBy("turn_txt")
      .agg(sum("n_wp").cast("long").as("n_tokens"))
    val bySession = Window.partitionBy("user_id", "session_id").orderBy("turn_idx")
    turns(events)
      .join(broadcast(profile), "turn_txt")
      .withColumn("n_chars", length(col("turn_txt")).cast("long"))
      .withColumn("char_start",
        (sum(col("n_chars") + 1).over(bySession) - col("n_chars") - 1).cast("long"))
      .withColumn("char_end", (col("char_start") + col("n_chars")).cast("long"))
      .withColumn("tok_start",
        (sum(col("n_tokens")).over(bySession) - col("n_tokens")).cast("long"))
      .withColumn("tok_end", (col("tok_start") + col("n_tokens")).cast("long"))
      .withColumn("loss", col("role") === "assistant")
      .select("user_id", "session_id", "turn_idx", "role", "n_chars",
        "char_start", "char_end", "n_tokens", "tok_start", "tok_end", "loss")
  }

  /** Exact conversation dedup, keep-first: identical rendered transcripts
    * collapse to the (user_id, session_id)-smallest keeper with a
    * duplicate count — the "dedup your SFT set" step every
    * instruction-tuning pipeline runs before training (duplicate
    * conversations overweight their gradient exactly like duplicate
    * documents do). Grouping key is md5(transcript) — fixed-width shuffle
    * key, the q20 exact-dedup posture; the transcript itself never
    * becomes a shuffle key.
    *
    * 100 TB shape: argmax-as-AGGREGATE (the [[Dedup.exactBest]] posture),
    * not a per-hash window — the struct-min over (user_id, session_id)
    * partial-aggregates map-side, so a viral transcript duplicated
    * millions of times collapses before the exchange where a window
    * would serialize the hot hash onto one reducer. */
  def dedupConversations(events: DataFrame): DataFrame =
    renderConversations(events)
      .withColumn("t_hash", md5(col("transcript")))
      .groupBy("t_hash")
      .agg(count(lit(1)).as("n_dups"),
        min(struct(col("user_id"), col("session_id"))).as("__keep"))
      .select(col("t_hash"), col("__keep.user_id").as("keep_user_id"),
        col("__keep.session_id").as("keep_session_id"), col("n_dups"))

  /** The SFT mini-capstone: render → exact-dedup (keep-first) → context
    * gate → pack surviving conversations into fixed character budgets —
    * the [[TextAnalysis.packSequences]] layout contract (sharded streams,
    * running-sum offsets, globally unique seq ids, boundary-straddle
    * flag) keyed by conversation. Shard = (user_id + session_id) mod
    * `shards` — pure integer, oracle-replayable; within a shard the
    * stream orders by (user_id, session_id). One plan end to end: the
    * user-keyed render shuffle, the hash-keyed dedup aggregate, the shard
    * repartition — each keyed by what it groups, nothing global.
    *
    * The context gate is `gateChars` (default 32, the render default) —
    * independent of `maxChars`, which sets only the PACK budget; a
    * 128-char bin holds several 32-char-gated conversations.
    *
    * 100 TB shape: dedup is the [[dedupConversations]] argmax-AGGREGATE
    * (struct-min keeper, map-side partial collapse of viral transcripts),
    * re-joined to the rendered rows on (t_hash, user_id, session_id) —
    * the keeper side holds ONE row per hash and duplicate transcripts
    * differ in (user, session), so the join key never concentrates. */
  def packConversations(events: DataFrame, maxChars: Int = 128,
      shards: Int = 8, gateChars: Int = 32): DataFrame = {
    val byShard = Window.partitionBy("shard").orderBy("user_id", "session_id")
    val rendered = renderConversations(events, gateChars)
      .withColumn("t_hash", md5(col("transcript")))
    val keepers = rendered.groupBy("t_hash")
      .agg(min(struct(col("user_id"), col("session_id"))).as("__keep"))
      .select(col("t_hash"), col("__keep.user_id").as("user_id"),
        col("__keep.session_id").as("session_id"))
    rendered.join(keepers, Seq("t_hash", "user_id", "session_id"))
      .filter(col("fits_context"))
      .select(col("user_id"), col("session_id"),
        pmod(col("user_id") + col("session_id"), lit(shards.toLong))
          .cast("int").as("shard"),
        col("n_chars"))
      .withColumn("start_off",
        (sum(col("n_chars")).over(byShard) - col("n_chars")).cast("long"))
      .withColumn("local_seq", floor(col("start_off") / maxChars).cast("long"))
      .select(
        col("user_id"), col("session_id"), col("shard"), col("n_chars"),
        col("start_off"),
        (col("shard").cast("long") * (1L << 48) + col("local_seq")).as("seq_id"),
        (col("local_seq") =!=
          floor((col("start_off") + col("n_chars") - 1) / maxChars).cast("long"))
          .as("crosses_boundary"))
  }

  /** Few-shot (in-context-learning) prompt assembly — the eval-side data
    * prep every benchmark harness runs: hold out a query slice
    * (doc_id ≡ 0 mod `queryMod` — disjoint from the pool by
    * construction, so a query can never retrieve itself), retrieve the
    * top-k most lexically similar pool documents per query
    * ([[Similarity.invertedRetrievalTopK]] — the held-out slice is
    * 1/`queryMod` OF THE CORPUS, i.e. BOTH retrieval sides grow linearly
    * with the data, the regime where the bounded-batch 256-bucket
    * [[Similarity.hashedRetrievalTopK]] contract goes quadratic (r13
    * stress ledger: 78 s at 10x) and a forced broadcast would OOM;
    * instead: 16-bit hash space, pool-df hot-bucket guard, no join
    * hint — AQE decides — and a WindowGroupLimit top-k), then render
    * the classic
    * `Input: …\nLabel: …` few-shot block with the query's own snippet
    * last, label blank — exemplar selection BY SIMILARITY, the standard
    * ICL recipe. Snippets truncate to `snippetChars` so prompt size is
    * bounded by k, not by document length.
    *
    * Output: (query_id, n_exemplars, prompt, n_chars). Rendering uses
    * the in-group array_sort idiom (bit-deterministic under any
    * partitioning); every downstream byte is a pure function of the
    * retrieval ranks, so the SQL oracle replays retrieval AND rendering. */
  def fewShotPrompts(docs: DataFrame, k: Int = 3, snippetChars: Int = 40,
      buckets: Int = 65536, queryMod: Long = 100,
      maxDocFrequency: Double = 0.05): DataFrame = {
    require(k > 0 && snippetChars > 0, s"need k > 0 and snippetChars > 0")
    val queries = docs.filter(col("doc_id") % queryMod === 0)
      .select(col("doc_id").as("query_id"), col("text"))
    val pool = docs.filter(col("doc_id") % queryMod =!= 0)
      .select(col("doc_id"), lit(0L).as("chunk_id"), col("text").as("chunk_text"))
    // BOTH sides are corpus-proportional here, so retrieval goes through
    // the inverted-index scale path (16-bit hash space + pool-df hot-
    // bucket guard) — the 256-bucket dense profiles of the bounded-batch
    // hashedRetrievalTopK contract go quadratic in this regime (measured:
    // 78 s at the 10x stress point before this switch, BENCH_NOTES r13)
    val top =
      Similarity.invertedRetrievalTopK(pool, queries, buckets, k, maxDocFrequency)
    val ex = top
      .join(docs.select(col("doc_id"),
        substring(col("text"), 1, snippetChars).as("snippet"), col("source")),
        "doc_id")
      .select(col("query_id"), col("rank"),
        concat(lit("Input: "), col("snippet"), lit("\nLabel: "),
          col("source"), lit("\n\n")).as("piece"))
    val qp = queries.select(col("query_id"),
      concat(lit("Input: "), substring(col("text"), 1, snippetChars),
        lit("\nLabel:")).as("qpiece"))
    ex.groupBy("query_id")
      .agg(count(lit(1)).cast("int").as("n_exemplars"),
        array_join(
          transform(array_sort(collect_list(struct(col("rank"), col("piece")))),
            x => x.getField("piece")), "").as("shots"))
      .join(qp, "query_id")
      .select(col("query_id"), col("n_exemplars"),
        concat(col("shots"), col("qpiece")).as("prompt"))
      .withColumn("n_chars", length(col("prompt")).cast("long"))
  }

  /** DPO/RLHF preference-pair construction from scored documents: within
    * each `bucketCol` bucket, pair the rank-k best with the rank-k worst
    * (by `scoreCol` — ties on doc_id, the deterministic rank), up to
    * `maxPairs` pairs and never past n/2 (the two sides stay DISJOINT:
    * 2k ≤ n means top-k and bottom-k cannot overlap, so no document is
    * ever both chosen and rejected). Output carries both scores and the
    * round-6 margin — the pair-quality dial a preference dataset filters
    * on (tiny margins = label noise).
    *
    * Scale: the two rank windows partition by bucket and their
    * `rank <= maxPairs` filters prune via WindowGroupLimit (each
    * partition forwards ≤ maxPairs rows per side before the join); the
    * per-bucket counts are a bucket-sized aggregate joined by broadcast.
    * The pair join is a (bucket, rank) equi-join on two maxPairs-bounded
    * sides — never a cartesian. */
  def preferencePairs(scored: DataFrame, bucketCol: String = "source",
      scoreCol: String = "quality_score", maxPairs: Int = 4): DataFrame = {
    require(maxPairs > 0, s"maxPairs must be positive, got $maxPairs")
    val top = Window.partitionBy(bucketCol)
      .orderBy(col(scoreCol).desc, col("doc_id"))
    val bot = Window.partitionBy(bucketCol)
      .orderBy(col(scoreCol).asc, col("doc_id").desc)
    // eager pin (r21, the q118/tokenBudget posture): `base` has THREE
    // consumers (per-bucket counts + both rank windows), and `scored` is
    // typically an expensive scorer chain (q191 feeds qualityScore's
    // rules+LM composition) — pin the slim 3-column projection once
    // instead of re-deriving the scorer per consumer. Selection-sized:
    // (bucket, id, score) rows only, never text.
    val base = scored.select(col(bucketCol), col("doc_id"), col(scoreCol))
      .localCheckpoint()
    val counts = base.groupBy(bucketCol).agg(count(lit(1)).as("__n"))
    val chosen = base
      .withColumn("pair_rank", row_number().over(top))
      .filter(col("pair_rank") <= maxPairs)
      .select(col(bucketCol), col("pair_rank"),
        col("doc_id").as("chosen_id"), col(scoreCol).as("chosen_score"))
    val rejected = base
      .withColumn("pair_rank", row_number().over(bot))
      .filter(col("pair_rank") <= maxPairs)
      .select(col(bucketCol), col("pair_rank"),
        col("doc_id").as("rejected_id"), col(scoreCol).as("rejected_score"))
    chosen.join(rejected, Seq(bucketCol, "pair_rank"))
      .join(broadcast(counts), bucketCol)
      .filter(lit(2) * col("pair_rank") <= col("__n"))
      .select(col(bucketCol), col("pair_rank").cast("int").as("pair_rank"),
        col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        round(col("chosen_score") - col("rejected_score"), 6).as("margin"))
  }
}
