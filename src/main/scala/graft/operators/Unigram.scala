package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (the SentencePiece `--model_type=unigram` family;
  * Kudo 2018): the OTHER production subword tokenizer beside [[Bpe]] —
  * T5/Llama-lineage multilingual models train unigram-LM vocabularies at
  * least as often as BPE. Where BPE composes tokens bottom-up from learned
  * merges, unigram-LM keeps an explicit piece vocabulary with a log-prob
  * per piece and segments each word into the MAXIMUM-LIKELIHOOD piece
  * sequence (Viterbi over the word's positions).
  *
  * Deterministic simplifications (documented, pinned by unit tests):
  *  - Viterbi-EM with HARD counts (each word's best segmentation counts
  *    once per occurrence) instead of full forward-backward expected
  *    counts — every statistic stays an exact integer.
  *  - Log-probs live as LONG MICRO-UNITS: lp = round(ln(c/total)·10⁶),
  *    the one transcendental rounded immediately (the q60 round-6 policy
  *    scaled to integers). Inference then sums LONGS — no float ever
  *    crosses the engine boundary, so a SQL oracle replays segmentation
  *    bit-for-bit from the same pinned table.
  *  - Pruning drops the least-USED multi-char pieces per EM round (25%
  *    per round toward the target) rather than SentencePiece's
  *    likelihood-loss ranking; single-char pieces are never pruned
  *    (coverage guarantee, as in SentencePiece).
  *
  * Viterbi tie-break (the cross-engine contract): maximize
  * (score, then lexicographically-SMALLEST path string), where the path
  * string is each piece followed by chr(1). Equal-score paths cover the
  * same characters, so they first differ strictly before either ends and
  * appending a common suffix preserves the order — which makes the
  * composite order a valid dynamic-programming objective, and the same
  * `ORDER BY score DESC, path` an exact SQL replay. A character with no
  * piece segments as itself at [[unkLogpMicro]] (SentencePiece's
  * character-fallback); an empty word is ZERO pieces.
  *
  * Unicode contract: segmentation operates on CODE POINTS (a piece
  * boundary can never split a surrogate pair, so the single-char
  * fallback emits whole characters even for supplementary-plane text)
  * and every tie-break/ordering comparison runs over UTF-8 BYTES —
  * DuckDB's memcmp order, which diverges from Java's UTF-16 `compareTo`
  * exactly for supplementary-plane code points. Both together make the
  * `ORDER BY score DESC, path` replay exact for ALL of Unicode, not
  * just the BMP.
  *
  * 100 TB shape (the [[Bpe]] posture exactly): TRAINING runs on the
  * driver over the bounded (word, count) dictionary — Heaps'-law
  * vocabulary-sized, never the corpus, capped deterministically by
  * `maxVocabWords`. INFERENCE tokenizes each DISTINCT word once (a
  * vocabulary-sized dictionary built with one UDF over a broadcast piece
  * map) and broadcast-joins the per-word piece counts onto the per-doc
  * word groups; the corpus-sized side shuffles only for its own
  * (doc_id, word) aggregation and the hot path stays codegen'd.
  */
object Unigram {

  /** Character-fallback log-prob (micro-units): well below any trained
    * piece, so fallback fires only when NO piece covers a character. */
  val unkLogpMicro: Long = -20000000L

  /** Code-point boundary offsets into `w`: offs(k) = UTF-16 index of the
    * k-th code point, offs(last) = w.length — segmentation slices between
    * these, so supplementary-plane characters stay atomic. */
  private def cpOffsets(w: String): Array[Int] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Int](w.length + 1)
    var i = 0
    while (i < w.length) { buf += i; i = w.offsetByCodePoints(i, 1) }
    buf += w.length
    buf.toArray
  }

  /** `w` as a sequence of single-code-point strings. */
  private def cpUnits(w: String): Seq[String] = {
    val off = cpOffsets(w)
    (0 until off.length - 1).map(k => w.substring(off(k), off(k + 1)))
  }

  /** UTF-8 byte (memcmp) string order — DuckDB's collation, which the
    * cross-engine replay contract pins everywhere this object sorts or
    * tie-breaks on strings. */
  private[graft] val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Train a unigram-LM piece table. Returns (piece, logp_micro) sorted by
    * piece — a pinnable constant (the [[graft.SparkEntry.bpeMerges]]
    * convention: train once, pin, oracle-share).
    *
    * `vocabSize` counts MULTI-char pieces; every character seen in the
    * (capped) word dictionary is always kept besides them. */
  def trainPieces(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 4,
      emRounds: Int = 4, seedSize: Int = 1024,
      maxVocabWords: Int = 1 << 16): Seq[(String, Long)] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    trainFromCounts(Bpe.collectWordCounts(docs, maxVocabWords),
      vocabSize, maxPieceLen, emRounds, seedSize)
  }

  /** DISTRIBUTED unigram-LM training — the open-vocabulary scale path
    * (the [[Bpe.trainMergesDistributed]] posture): the (word, count)
    * dictionary stays a DataFrame with NO vocabulary cap, and every
    * corpus-shaped aggregation runs in Spark — weighted code-point
    * counts, the substring seed counts, and each EM round's hard Viterbi
    * usage counts (one explode + one shuffle per round over the
    * vocabulary-sized table, segmenting against the BROADCAST piece
    * table). Only bounded sets ever reach the driver: the alphabet, the
    * seedSize-capped seed list, and per-round usage keyed by the ≤
    * (alphabet + seedSize) live pieces. Pruning/M-step arithmetic is the
    * driver trainer's verbatim, so on any corpus whose dictionary fits
    * the driver cap the two trainers return identical tables (pinned by
    * UnigramSpec's equivalence test). Spark's string ordering is UTF-8
    * binary — the same [[utf8Order]] the driver trainer sorts by — so
    * the seed cut-off ties break identically. */
  def trainPiecesDistributed(docs: DataFrame, vocabSize: Int,
      maxPieceLen: Int = 4, emRounds: Int = 4,
      seedSize: Int = 1024): Seq[(String, Long)] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    val spark = docs.sparkSession
    val words = TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // re-read by every seed/EM aggregation below
    try {
      val unitsUdf = udf((w: String) => cpUnits(w))
      val charCounts: Seq[(String, Long)] = words
        .select(explode(unitsUdf(col("word"))).as("ch"), col("cnt"))
        .groupBy("ch").agg(sum("cnt").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy(_._1)(utf8Order)
      val chars = charCounts.map(_._1)
      val maxLen = maxPieceLen
      val subUdf = udf((w: String) => {
        val off = cpOffsets(w)
        val m = off.length - 1
        for { l <- 2 to maxLen; i <- 0 to m - l }
          yield w.substring(off(i), off(i + l))
      })
      val seeds = words.select(explode(subUdf(col("word"))).as("p"), col("cnt"))
        .groupBy("p").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("p"))
        .limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      var multi: Seq[String] = seeds.map(_._1)
      val seedCount = seeds.toMap
      var table: Map[String, Long] = logProbs(
        charCounts ++ multi.map(p => p -> seedCount(p)))
      val byCountThenPiece = Ordering.by[(String, Long), Long](-_._2)
        .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order))
      var round = 0
      while (round < emRounds) {
        val bc = spark.sparkContext.broadcast(table)
        val vitUdf = udf((w: String) => viterbi(w, bc.value, maxLen))
        val use = words.select(explode(vitUdf(col("word"))).as("p"), col("cnt"))
          .groupBy("p").agg(sum("cnt").as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        bc.destroy()
        val ranked = multi.filter(use.contains)
          .map(p => (p, use(p))).sorted(byCountThenPiece).map(_._1)
        val keep = if (round == emRounds - 1) vocabSize
          else math.max(vocabSize, ranked.size - math.max(1, (ranked.size - vocabSize) / 4))
        multi = ranked.take(keep)
        table = logProbs(
          chars.map(ch => ch -> use.getOrElse(ch, 0L)) ++
            multi.map(p => p -> use(p)))
        round += 1
      }
      table.toSeq.sortBy(_._1)(utf8Order)
    } finally {
      words.unpersist(blocking = false)
      ()
    }
  }

  /** Driver-side trainer over a (word, count) dictionary — seed by
    * substring frequency, Viterbi-EM with hard counts, prune by usage. */
  private[graft] def trainFromCounts(wordCounts: Seq[(String, Long)],
      vocabSize: Int, maxPieceLen: Int, emRounds: Int,
      seedSize: Int): Seq[(String, Long)] = {
    val chars: Seq[String] = wordCounts.iterator.flatMap(wc => cpUnits(wc._1))
      .toSeq.distinct.sorted(utf8Order)
    // seed multi-char candidates by total weighted occurrence count
    // (lengths and slices in CODE POINTS)
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- wordCounts) {
      val off = cpOffsets(w)
      val m = off.length - 1
      for (l <- 2 to maxPieceLen; i <- 0 to m - l)
        sub.updateWith(w.substring(off(i), off(i + l)))(v => Some(v.getOrElse(0L) + c))
    }
    val byCountThenPiece = Ordering.by[(String, Long), Long](-_._2)
      .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order))
    var multi: Seq[String] = sub.toSeq
      .sorted(byCountThenPiece).take(seedSize).map(_._1)
    // initial scores straight from the seed counts
    var table: Map[String, Long] = logProbs(
      chars.map(ch => ch -> charCount(wordCounts, ch)) ++
        multi.map(p => p -> sub(p)))
    var round = 0
    while (round < emRounds) {
      // E-step: hard Viterbi counts over the word dictionary
      val use = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- wordCounts; p <- viterbi(w, table, maxPieceLen))
        use.updateWith(p)(v => Some(v.getOrElse(0L) + c))
      // prune the least-used multi-char pieces, 25% of the excess per
      // round (all the way to the target on the last round)
      val ranked = multi.filter(use.contains)
        .map(p => (p, use(p))).sorted(byCountThenPiece).map(_._1)
      val keep = if (round == emRounds - 1) vocabSize
        else math.max(vocabSize, ranked.size - math.max(1, (ranked.size - vocabSize) / 4))
      multi = ranked.take(keep)
      // M-step: recompute log-probs from the surviving usage counts;
      // a char Viterbi never used keeps the fallback floor
      table = logProbs(
        chars.map(ch => ch -> use.getOrElse(ch, 0L)) ++
          multi.map(p => p -> use(p)))
      round += 1
    }
    table.toSeq.sortBy(_._1)(utf8Order)
  }

  private def charCount(wordCounts: Seq[(String, Long)], ch: String): Long =
    wordCounts.iterator.map { case (w, c) =>
      c * cpUnits(w).count(_ == ch)
    }.sum

  /** counts → micro-unit log-probs; zero-count entries get the unk floor. */
  private def logProbs(counts: Seq[(String, Long)]): Map[String, Long] = {
    val total = counts.iterator.map(_._2).sum.toDouble
    counts.iterator.map { case (p, c) =>
      p -> (if (c <= 0L) unkLogpMicro
            else math.round(StrictMath.log(c / total) * 1e6))
    }.toMap
  }

  /** Maximum-likelihood segmentation of one word under a piece table —
    * the DP described in the object doc: per position the best
    * (score, path) with score desc / path asc, character fallback at
    * [[unkLogpMicro]] for uncovered characters, empty word → no pieces. */
  private[graft] def viterbi(word: String, table: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    // positions are CODE-POINT indices (off maps them back to UTF-16),
    // so a candidate slice can never split a surrogate pair and the
    // single-char fallback always emits a whole character
    val off = cpOffsets(word)
    val n = off.length - 1
    // best(i): (score, path-as-UTF-8, pieces) over segmentations of the
    // first i code points; paths compare as unsigned bytes = DuckDB order
    val bestScore = Array.fill(n + 1)(Long.MinValue)
    val bestPath = Array.fill[Array[Byte]](n + 1)(Array.emptyByteArray)
    val bestPieces = Array.fill[List[String]](n + 1)(Nil)
    bestScore(0) = 0L
    def pathPlus(i: Int, cand: String): Array[Byte] =
      bestPath(i) ++ (cand + '\u0001')
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < n) {
      if (bestScore(i) != Long.MinValue) {
        var l = 1
        val maxL = math.min(maxPieceLen, n - i)
        while (l <= maxL) {
          val cand = word.substring(off(i), off(i + l))
          val lp = table.get(cand) match {
            case Some(v) => v
            case None => if (l == 1) unkLogpMicro else Long.MinValue
          }
          if (lp != Long.MinValue) {
            val s = bestScore(i) + lp
            val j = i + l
            if (s > bestScore(j) || (s == bestScore(j) &&
                java.util.Arrays.compareUnsigned(pathPlus(i, cand), bestPath(j)) < 0)) {
              bestScore(j) = s
              bestPath(j) = pathPlus(i, cand)
              bestPieces(j) = cand :: bestPieces(i)
            }
          }
          l += 1
        }
      }
      i += 1
    }
    bestPieces(n).reverse
  }

  /** Persist a trained piece table — the serving artifact a pipeline
    * ships to every later job (the q119 inverted-index / q110 IVF
    * persistence posture applied to tokenizers): one tiny parquet of
    * (piece, logp_micro) rows. [[loadPieces]] restores the exact table
    * (sorted by piece, the trainer's canonical order), so a job using
    * the loaded artifact is bit-identical to one holding the constant —
    * which is exactly what q183 proves by sharing q171's oracle. */
  def writePieces(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[(String, Long)], path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "logp_micro").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a piece table written by [[writePieces]]. */
  def loadPieces(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, Long)] =
    spark.read.parquet(path)
      .select(col("piece"), col("logp_micro"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)(utf8Order).toSeq

  /** Per-document tokenizer-faithful counts under a pinned piece table:
    * (doc_id, n_words, n_unigram_tokens) — [[Bpe.tokenCounts]]'s exact
    * distributed shape (distinct words tokenized once over a broadcast
    * table, dictionary broadcast-joined onto per-doc word groups). The
    * Viterbi lookahead derives from the TABLE (longest piece), so a
    * table trained at any maxPieceLen segments correctly here — no
    * silently-mismatched length knob. */
  def tokenCounts(docs: DataFrame, pieces: Seq[(String, Long)]): DataFrame = {
    val spark = docs.sparkSession
    val maxPieceLen = math.max(1, pieces.iterator
      .map(p => p._1.codePointCount(0, p._1.length)).maxOption.getOrElse(1))
    val bcTable = spark.sparkContext.broadcast(pieces.toMap)
    val nUni = udf((w: String) => viterbi(w, bcTable.value, maxPieceLen).length)
    val dict = TextAnalysis.withWords(docs)
      .select(explode(col("__words")).as("word"))
      .distinct()
      .select(col("word"), nUni(col("word")).cast("long").as("n_uni"))
    val docWord = TextAnalysis.withWords(docs)
      .select(col("doc_id"), explode(col("__words")).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
    docWord.join(broadcast(dict), "word")
      .groupBy("doc_id")
      .agg(sum("n").as("n_words"),
        sum(col("n") * col("n_uni")).as("n_unigram_tokens"))
  }

  /** Sequence packing budgeted in unigram-LM tokens —
    * [[graft.operators.TextAnalysis.packSequences]]'s layout contract
    * (sharded streams, per-shard running sum, globally unique seq ids)
    * with the token column swapped for this tokenizer's count, exactly
    * as [[Bpe.packSequencesBpe]] does for BPE: whichever tokenizer a
    * pipeline trains, its packing budgets in the SAME tokens. */
  def packSequencesUnigram(docs: DataFrame, pieces: Seq[(String, Long)],
      maxTokens: Int = 2048, shards: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    tokenCounts(docs, pieces)
      .select(
        col("doc_id"),
        pmod(col("doc_id"), lit(shards.toLong)).cast("int").as("shard"),
        col("n_unigram_tokens").as("n_tokens"))
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

  /** Unigram-LM fertility by corpus slice — [[Bpe.fertilityReport]]'s
    * twin, so the two tokenizers' per-source tokens-per-word diagnostics
    * compare directly (the multilingual-survey table). Integer-exact
    * micro-unit ratio, one slice-keyed shuffle of three longs per doc. */
  def fertilityReport(docs: DataFrame, pieces: Seq[(String, Long)],
      sliceCol: String = "source"): DataFrame =
    tokenCounts(docs, pieces)
      .join(docs.select(col("doc_id"), col(sliceCol)), "doc_id")
      .groupBy(sliceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_unigram_tokens").as("n_unigram_tokens"))
      .withColumn("unigram_fertility_micro",
        expr("(1000000 * n_unigram_tokens) div n_words"))
}
