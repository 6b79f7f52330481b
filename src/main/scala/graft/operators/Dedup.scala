package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over a `documents`
  * table (doc_id, text, ...).
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-shuffle on a 128-bit content hash — the
  *    shuffle carries (hash, doc_id) only, never the text;
  *  - n-gram Jaccard is EXACT pairwise similarity; its gram self-join
  *    explodes quadratically on hot grams, so at scale it runs AFTER MinHash
  *    LSH banding has cut candidates (minHashLsh below) — the exact variant
  *    here doubles as the verifier for LSH candidates;
  *  - MinHash: 16 hash slots from xxhash64(seed, gram) folded map-side via
  *    aggregate(), so the shuffle carries one 16-long signature per doc;
  *    banding (4 bands × 4 rows) turns near-dup search into an equi-join —
  *    Catalyst plans a plain shuffle-hash join that scales linearly;
  *  - SimHash: one 64-bit signature per doc, computed in a single map-side
  *    fold (no explode, no shuffle); banding into 4×16-bit keys finds
  *    candidates within small Hamming distance.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Exact dedup by content hash: one row per distinct `textCol` value with
    * the smallest doc_id as the canonical keeper and the duplicate count.
    * MD5 (128-bit) over the raw text; collision probability is negligible
    * and the shuffle never carries the document body. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping the BEST copy instead of [[exact]]'s first-id:
    * within each identical-text group the keeper maximizes `priorityCol`
    * (smallest doc_id breaks ties) — what curation actually wants when
    * duplicates differ in metadata-derived quality (the same article from
    * a clean mirror vs an ad-wrapped scraper copy scores differently
    * upstream even when the extracted text matches). Priority should be
    * an integer column (quality micro-units — the q113/q126 policy) so
    * the argmax is exact.
    *
    * 100 TB shape: argmax-as-AGGREGATE, not a per-hash window — the
    * shuffle carries (hash, id, priority) and a hot text (same boilerplate
    * page duplicated millions of times) collapses map-side via partial
    * max/count before the exchange, where a window would serialize the
    * hot hash onto one reducer. The struct max orders by (priority,
    * −doc_id), so ties take the SMALLEST id deterministically. */
  def exactBest(docs: DataFrame, priorityCol: String,
      textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), md5(col(textCol)).as("content_hash"),
        col(priorityCol).cast("long").as("__p"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_dups"),
        max(struct(col("__p"), (-col("doc_id")).as("__nid"))).as("__best"))
      .select(col("content_hash"), (-col("__best.__nid")).as("keep_id"),
        col("n_dups"))

  /** SOFT dedup — reweight duplicates instead of dropping them (the
    * SoftDeDup observation, He et al. 2024: hard removal throws away the
    * signal that a text's duplication frequency carries; downweighting
    * keeps every document but makes each duplicate GROUP contribute one
    * unit of expected training mass). Every document gets
    * weight_e6 = 10⁶ div |its exact-duplicate group| — integer
    * micro-units (the q113/q126 policy) so the weights are bit-exact in
    * any engine, ready for [[Sampling]]'s weighted passes or a loss
    * scaler. Output: (doc_id, group_size, weight_e6), row count = input
    * row count (nothing is dropped — that is the point).
    *
    * 100 TB shape: the group size is an AGGREGATE on the content hash —
    * (hash, doc_id) shuffle, text never moves, a boilerplate page
    * duplicated millions of times collapses map-side via partial count —
    * then a hash-keyed equi-join carries the count back to the doc rows
    * (AQE handles the hot-hash join side; a per-hash window here would
    * serialize the hot hash onto one reducer, the [[exactBest]]
    * rationale). */
  def softDedupWeights(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col("doc_id"), md5(col(textCol)).as("content_hash"))
    val counts = keyed.groupBy("content_hash").agg(count(lit(1)).as("group_size"))
    keyed.join(counts, "content_hash")
      .select(col("doc_id"), col("group_size"),
        expr("1000000 div group_size").as("weight_e6"))
  }

  /** Cross-source exact-duplicate MATRIX — mirror detection at the slice
    * level (the report that catches "source A is a re-crawl of source B
    * under another name" BEFORE doc-level dedup silently merges them):
    * for every source pair, how many distinct texts they share and how
    * many cross-source duplicate PAIRS those texts induce (Σ n_a·n_b over
    * shared hashes — the count doc-level dedup will collapse). One row
    * per unordered pair with src_a < src_b, empty overlaps absent.
    *
    * 100 TB shape: the corpus reduces to per-(hash, source) COUNTS first
    * (map-side combine absorbs hot texts — the shuffle carries a hash,
    * a source and a long), and the hash-keyed self-join fans each hash
    * to ≤ |sources|² rows, a constant per hash — never a doc×doc join. */
  def crossSourceDupMatrix(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val hs = docs.select(md5(col(textCol)).as("h"), col(srcCol).as("src"))
      .groupBy("h", "src").agg(count(lit(1)).as("n"))
    hs.toDF("h", "src_a", "n_a").join(hs.toDF("h", "src_b", "n_b"), "h")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_texts"),
        sum(col("n_a") * col("n_b")).as("n_dup_pairs"))
  }

  /** Per-doc DISTINCT gram-hash array (graft.functions.WordGramHashes) —
    * grams travel as 64-bit hashes because every consumer needs only gram
    * equality, and the dedup happens map-side with array_distinct: a
    * (doc_id, gram) distinct-shuffle would move the same data for nothing.
    * Words materialize in their own projection so tokenization runs once. */
  private def gramArrays(docs: DataFrame, n: Int): DataFrame =
    TextAnalysis.withWords(docs)
      .select(col("doc_id"),
        array_distinct(graft.functions.HashFunctions.word_gram_hashes(col("__words"), n))
          .as("grams"))

  /** Distinct (doc_id, gram) pairs, exploded from [[gramArrays]] — no shuffle. */
  private def gramSet(docs: DataFrame, n: Int): DataFrame =
    gramArrays(docs, n).select(col("doc_id"), explode(col("grams")).as("gram"))

  /** Unguarded-at-scale warning: the exact pairwise path (maxDocFrequency
    * = 1.0, guard off) has a Θ(Σ df²) gram self-join that stopword grams
    * dominate at corpus scale. Above this input size the production route
    * is [[minHashLshPairs]] at its measured operating point (32 hashes,
    * 8 bands × 4 rows — the q53 configuration, oracle-verified), with this
    * exact path reserved for verifying LSH candidates or sub-threshold
    * corpora. Returns the warning text so the policy is unit-testable
    * without capturing logs. */
  private[graft] val unguardedWarnBytes: Long = 4L << 30
  private[graft] def unguardedScaleWarning(
      sizeInBytes: BigInt, maxDocFrequency: Double): Option[String] =
    if (maxDocFrequency >= 1.0 && sizeInBytes > unguardedWarnBytes)
      Some(s"ngramJaccardPairs with the hot-gram guard OFF (maxDocFrequency=1.0) on a " +
        s"~${sizeInBytes / (1L << 30)} GiB input: the gram self-join grows with the square " +
        "of per-gram document frequency and stopword grams will dominate at this scale. " +
        "Pass maxDocFrequency < 1 (e.g. 0.01) to drop ubiquitous grams, or use " +
        "minHashLshPairs(numHashes=32, bands=8) — the verified production configuration — " +
        "and reserve this exact path for verifying its candidates.")
    else None

  /** EXACT n-gram Jaccard near-duplicate pairs: all (doc1 < doc2) with
    * |grams1 ∩ grams2| / |grams1 ∪ grams2| >= threshold.
    *
    * Implementation: distinct gram explode → self-equi-join on gram →
    * pair-count = intersection; union from per-doc gram counts. Jaccard is a
    * single exact integer division — bit-identical to any SQL engine.
    *
    * `maxDocFrequency` is the hot-gram guard for the self-join's quadratic
    * blowup: a gram appearing in k docs contributes k² join rows, and at
    * corpus scale stopword n-grams make that the dominant cost. With
    * f < 1.0, grams present in more than f of all docs are dropped from the
    * documents' gram SETS before any pairing (standard near-dup practice —
    * ubiquitous grams carry no dedup signal), and Jaccard is computed over
    * the reduced sets — a deliberate semantic change, so the default 1.0
    * keeps the guard off and the exact map-side-count path intact. At scale
    * prefer the guard on, or [[minHashLshPairs]] outright (see
    * [[unguardedScaleWarning]], logged when the guard is off above ~4 GiB). */
  def ngramJaccardPairs(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.2,
      maxDocFrequency: Double = 1.0): DataFrame = {
    unguardedScaleWarning(docs.queryExecution.optimizedPlan.stats.sizeInBytes, maxDocFrequency)
      .foreach(m => log.warn(m))
    val arrays =
      if (maxDocFrequency >= 1.0) gramArrays(docs, n)
      else {
        // The guard needs per-gram document frequency, so the gram arrays
        // get FOUR consumers (df probe + pair self-join ×2 + per-doc
        // counts): cache the one compact projection they share — ~16
        // bytes/gram of hashes, no text — instead of tokenizing the corpus
        // four times. One job (count) sizes the corpus and warms the cache.
        val arrays0 = gramArrays(docs, n).cache()
        val nDocs = arrays0.count()
        // SKEW-SAFE document frequency: groupBy(gram) partial-aggregates
        // map-side, so a hot gram ships one row per map partition into the
        // shuffle — NOT its full occurrence list into one task (a
        // window-over-gram would do exactly that, concentrating the hottest
        // gram's rows on a single straggler at corpus scale — the very
        // blowup this guard exists to prevent). The hot set is BOUNDED BY
        // CONSTRUCTION at avg-grams-per-doc / f rows independent of corpus
        // size (Σ df = total gram occurrences, each hot gram has df >
        // f·nDocs), so it collects to the driver and the removal happens
        // map-side inside each document's gram ARRAY — no second pass over
        // the exploded set, no anti-join shuffle. Callers running many
        // guarded corpora in one session should clearCache() between runs.
        val hot = arrays0.select(explode(col("grams")).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFrequency * nDocs)
          .select("gram").collect().map(_.getLong(0))
        if (hot.isEmpty) arrays0
        else arrays0.select(col("doc_id"),
          array_except(col("grams"), typedLit(hot.toSeq)).as("grams"))
      }
    // per-doc set size straight off the (reduced) array — map-side, no agg
    val grams = arrays.select(col("doc_id"), explode(col("grams")).as("gram"))
    val counts = arrays.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
    val inter = grams.as("g1")
      .join(grams.as("g2"), col("g1.gram") === col("g2.gram") && col("g1.doc_id") < col("g2.doc_id"))
      .groupBy(col("g1.doc_id").as("doc1"), col("g2.doc_id").as("doc2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_grams", "n1"), "doc1")
      .join(counts.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_grams", "n2"), "doc2")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "n_common", "jaccard")
  }

  /** Benchmark-contamination screen: for every corpus document, the fraction
    * of its n-grams that appear anywhere in the `bench` set — the standard
    * eval-decontamination signal (a training doc overlapping an eval set
    * inflates benchmark scores; docs above a contamination threshold get
    * dropped before training).
    *
    * 100 TB shape: the benchmark side is tiny relative to the corpus, so its
    * DISTINCT gram set broadcasts and the whole screen is a map-side
    * left join + per-doc aggregation — the corpus shuffles only (doc_id,
    * counts), never grams or text across the cluster. */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 3): DataFrame = {
    val benchGrams = broadcast(gramSet(bench, n).select("gram").distinct()
      .withColumn("__hit", lit(1L)))
    gramSet(docs, n)
      .join(benchGrams, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_grams").cast("double"))
  }

  /** MinHash signatures: for each of `numHashes` seeds, the minimum
    * xxhash64(seed, gram) over the document's n-gram set. Computed as a
    * map-side fold over the gram array — no explode, no extra shuffle;
    * output is one compact row per document. */
  def minHashSignatures(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      riderCols: Seq[String] = Nil): DataFrame = {
    // Gram hashes and the slot-minima fold both run as codegen'd expressions
    // (WordGramHashes → MinHashSignature); no gram dedup needed — duplicate
    // grams can't change a minimum. Slot j = min over grams of
    // xxh64(gramHash, seed=j), the one-hash minhash construction.
    // `riderCols` (e.g. the event-time column in the streaming operator)
    // pass through untouched.
    TextAnalysis.withWords(docs).select(col("doc_id") +: riderCols.map(col) :+
      graft.functions.HashFunctions.minhash_signature(
        graft.functions.HashFunctions.word_gram_hashes(col("__words"), n), numHashes)
        .as("minhash"): _*)
  }

  /** MinHash LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket-join on (band index, band slice), then estimate
    * similarity as the fraction of matching slots. Docs with < n words (empty
    * gram set → all-sentinel signature) are excluded. The equi-join on band
    * keys is the scale path: candidates ~ true near-dups, not n². */
  def minHashLshPairs(
      docs: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      minEstimate: Double = 0.5): DataFrame = {
    val sigs = minHashSignatures(docs, n, numHashes)
      .filter(element_at(col("minhash"), 1) =!= Long.MaxValue)
    val banded = bandedKeys(sigs, numHashes, bands)
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.minhash").as("mh1"), col("b.minhash").as("mh2"))
      .distinct()
    cands
      .withColumn("est_jaccard",
        size(filter(zip_with(col("mh1"), col("mh2"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= minEstimate)
      .select("doc1", "doc2", "est_jaccard")
  }

  /** Candidate PAIRS only — [[minHashLshPairs]] without the slot-match
    * estimate: the dedup shuffle (distinct) carries two longs per candidate
    * instead of two `numHashes`-long signature arrays. The right feed for a
    * pipeline that exact-verifies candidates anyway ([[lshDedupClusters]]),
    * where the estimate would be discarded. */
  def minHashLshCandidates(
      docs: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 16): DataFrame = {
    val sigs = minHashSignatures(docs, n, numHashes)
      .filter(element_at(col("minhash"), 1) =!= Long.MaxValue)
    val banded = bandedKeys(sigs, numHashes, bands).drop("minhash")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
  }

  /** One row per band with its hashed band key; every input column (doc_id,
    * minhash, and any rider like an event-time column) is preserved. Shared
    * by the batch LSH joins and the streaming candidate operator so the two
    * can never disagree on the banding formula. */
  private[graft] def bandedKeys(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands) — " +
        "otherwise trailing signature slots are silently ignored")
    val rows = numHashes / bands
    sigs.select(
      col("*"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("minhash"), b * rows + 1, rows))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
  }

  /** EXACT n-gram Jaccard computed only for given candidate pairs — the
    * verifier stage of the scale dedup pipeline. Each candidate pair joins
    * its two (distinct) gram arrays back by doc_id and measures
    * |∩| / |∪| with a single array_intersect — no gram explode, no gram
    * self-join, cost linear in the candidate count. Output schema matches
    * [[ngramJaccardPairs]] so the two are interchangeable downstream.
    *
    * 100 TB shape: candidates (from [[minHashLshPairs]]) are ~true near-dups,
    * not n²; the joins shuffle gram ARRAYS only for candidate docs. */
  def jaccardVerify(
      docs: DataFrame, candidates: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val g = gramArrays(docs, n)
    candidates.select("doc1", "doc2")
      .join(g.select(col("doc_id").as("doc1"), col("grams").as("g1")), "doc1")
      .join(g.select(col("doc_id").as("doc2"), col("grams").as("g2")), "doc2")
      // r22: intersection COUNT without materializing the intersection
      // array per pair (graft.functions.IntersectCount ≡
      // size(array_intersect), ExpressionsSpec-pinned) — the verify loop
      // is the hottest per-pair work in every near-dup pipeline
      .withColumn("n_common",
        graft.functions.HashFunctions.intersect_count(col("g1"), col("g2")).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "n_common", "jaccard")
  }

  /** The end-to-end scale dedup pipeline: MinHash-LSH candidate generation →
    * exact-Jaccard verification of candidates only → connected components →
    * (doc_id, cluster_id). This is THE shape that survives 100 TB: every
    * stage is an equi-join or a map-side fold, and the only pairwise work is
    * over LSH candidates.
    *
    * Verified-subgraph determinism: with `bands` = `numHashes` (one slot per
    * band) a true pair at Jaccard j is missed by LSH with probability
    * (1-j)^bands — ≤ 7e-12 at j ≥ 0.8, bands=16 — so on any corpus whose
    * near-dup pairs sit above the threshold the verified pair set EQUALS the
    * exact-Jaccard pair set and the result is oracle-checkable against a
    * plain all-pairs recursive-CTE ground truth. Production tuning trades
    * recall for candidate volume via (numHashes, bands).
    */
  def lshDedupClusters(
      docs: DataFrame, n: Int = 3, numHashes: Int = 16, bands: Int = 16,
      threshold: Double = 0.5, maxIterations: Int = 20): DataFrame =
    connectedComponents(
      jaccardVerify(docs, minHashLshCandidates(docs, n, numHashes, bands), n, threshold),
      maxIterations)

  /** Connected components over near-duplicate pairs: assigns every document
    * that appears in `pairs` the smallest doc_id reachable through the
    * pair graph — the canonical keeper of its duplicate cluster. The final
    * dedup stage: candidate pairs (from LSH or exact Jaccard) → clusters →
    * keep one doc per cluster.
    *
    * Min-label propagation with POINTER DOUBLING: each round (a) takes the
    * min over self + neighbors' labels (one shuffle join + one aggregation),
    * then (b) shortcuts label ← label(label) (one more self-join) — valid
    * because labels only ever decrease and every label value is itself a
    * node, so the lookup is total. The shortcut doubles the propagation
    * distance per round, cutting rounds from O(diameter) to O(log diameter)
    * — the property that matters at 100 TB, where each round costs a full
    * shuffle plus a driver action and a path-shaped cluster would otherwise
    * stall the job (OperatorsSpec pins a diameter-127 path converging in
    * ≤ 10 rounds). The label table is localCheckpoint'ed every round:
    * caching alone keeps the DATA but the logical plan still nests per
    * iteration and grows exponentially (driver OOM in plan stringification
    * by ~10 rounds) — checkpointing truncates the lineage to a leaf.
    * Deterministic.
    */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // No edge-level distinct (r21): every label step is a MIN aggregation,
    // so duplicate edges cannot change any result — they only add
    // proportional rows to the per-round propagation join. Callers pass
    // deduplicated pair sets (groupBy'd or distinct'd by construction), so
    // the distinct was a pure extra corpus-scale shuffle before round 1.
    val edges = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
      .unionAll(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      .cache()
    // Initialization FUSED with the first propagation round (r21): with
    // identity labels, round 0's min over self + neighbors is just
    // least(node, min(neighbor id)) — one aggregation over the edge list,
    // the same single shuffle the old identity-map init (distinct nodes)
    // paid, so the first round is free. The loop below then always runs
    // the full three-branch round (shortcut included); `iter` starts at 1
    // because one propagation round has already happened.
    var labels = edges.groupBy("src").agg(min(col("dst")).as("__mn"))
      .select(col("src").as("node"), least(col("src"), col("__mn")).as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 1
    while (!converged && iter < maxIterations) {
      // One union → one aggregation → ONE job per round, taking the min over
      // three label sources read straight off the checkpoint LEAF
      // (self-joining a Union-shaped plan trips the analyzer's constraint
      // rewrite; a separate pre-shortcut frame would execute its join twice —
      // once under the edges join, once under the union):
      //  (a) the node's own label — which also carries the PREVIOUS label
      //      through the aggregation as `old`, so convergence is decided from
      //      the same job that materializes the round (no follow-up join),
      //  (b) neighbors' labels (propagation),
      //  (c) the label's own label — POINTER DOUBLING (valid from the
      //      fused init on: labels are already min(self, neighbors)).
      val nullOld = lit(null).cast("long")
      val self = labels.select(col("node"), col("label"), col("label").as("old"))
      val viaNeighbors = edges.join(labels, edges("dst") === labels("node"))
        .select(col("src").as("node"), col("label"), nullOld.as("old"))
      val branches = {
        val lookup = labels.select(col("node").as("l_node"), col("label").as("l_label"))
        val viaShortcut = labels.join(lookup, col("label") === col("l_node"))
          .select(col("node"), col("l_label").as("label"), nullOld.as("old"))
        Seq(self, viaNeighbors, viaShortcut)
      }
      // The changed-count rides the materializing action as an observed
      // metric (CollectMetricsExec accumulates during the checkpoint job and
      // the listener delivers it right after) — the r2 shape ran a second
      // join-job per round just to decide convergence, doubling round latency.
      val obs = org.apache.spark.sql.Observation()
      val next = branches.reduce(_ unionAll _)
        .groupBy("node").agg(min("label").as("label"), max("old").as("old"))
        .observe(obs, sum(when(col("label") =!= col("old"), 1L).otherwise(0L)).as("changed"))
        .select("node", "label").localCheckpoint()
      val changed = observedChanged(obs).getOrElse {
        // listener-bus delivery is asynchronous with no hard guarantee; the
        // fallback scans the just-checkpointed leaf (local blocks, no join)
        next.join(labels.withColumnRenamed("label", "old"), "node")
          .filter(col("label") =!= col("old")).limit(1).count()
      }
      releaseLocalCheckpoint(labels) // next is materialized; the old snapshot is dead weight
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations — " +
          "a duplicate cluster has diameter beyond 2^maxIterations reach; raise it.")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Poll the round's observed changed-count off the listener bus: the
    * checkpoint action has already completed synchronously, so the metric
    * arrives as soon as the bus drains — normally well under a millisecond.
    * Bounded wait (~5 s) so a dropped listener event can never hang the
    * driver; `None` routes the caller to the leaf-scan fallback. A null
    * metric (sum over zero groups — empty edge set) reads as converged. */
  private def observedChanged(obs: org.apache.spark.sql.Observation): Option[Long] = {
    try {
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(5, "s"))
      Some(row.getAs[Any]("changed") match {
        case null => 0L
        case n: Number => n.longValue()
      })
    } catch {
      // ANY delivery failure (timeout, interruption, a failed Observation
      // future) routes to the working leaf-scan fallback one line away in
      // the caller — only fatal errors rethrow. Interruption restores the
      // thread's interrupt flag so the caller's next blocking call still
      // sees the cancellation.
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        System.err.println("[graft] connectedComponents: interrupted while awaiting " +
          s"observed metric (${e.getMessage}); using leaf-scan fallback")
        None
      case e if scala.util.control.NonFatal(e) =>
        System.err.println("[graft] connectedComponents: observed metric not delivered " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage}); using leaf-scan fallback")
        None
    }
  }

  /** Free a superseded localCheckpoint's storage eagerly — otherwise up to
    * maxIterations label snapshots pile up until driver GC gets around to
    * them. Best-effort: falls through silently if the plan isn't the
    * expected LogicalRDD leaf. */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** 64-bit SimHash over the word multiset: bit j of the signature is the
    * sign of Σ_w (±1 by bit j of hash(w)). One map-side fold per doc — the
    * 64-counter state lives in a single array column, no shuffle.
    *
    * `portableHash = false` (production): words hash with the codegen'd
    * xxhash64 path (WordGramHashes) — fastest, engine-specific.
    * `portableHash = true`: words hash to the first 60 bits of their md5
    * (bits 60–63 of the signature are then always 0 — every word
    * contributes −1 — identically in any engine), so the signature and
    * everything derived from it reproduces bit-for-bit in any SQL engine
    * with md5: the variant that makes [[simHashPairs]] exact-oracle
    * checkable END TO END on raw corpora, not just on planted fixtures.
    * The bit-counter fold is the same codegen'd SimHashSignature either
    * way — only the word-hash column differs. */
  def simHash(docs: DataFrame, portableHash: Boolean = false): DataFrame = {
    // Hash each word once, then fold the 64 bit-counters in a codegen'd
    // expression (graft.functions.SimHashSignature) — the pure-HOF version
    // costs ~500 interpreted ops per word.
    // r22: the portable hash is a codegen'd expression too — the
    // transform/conv/substring HOF spelling ran the md5 + two string
    // materializations per word in the INTERPRETED evaluator (the same
    // hazard SimHashSignature's scaladoc records); Md5WordHashes computes
    // the identical 60-bit value in one digest + shift per word
    // (ExpressionsSpec pins the bit-equality against the HOF form).
    val wordHashes =
      if (portableHash) graft.functions.HashFunctions.md5_word_hashes(col("__words"))
      else graft.functions.HashFunctions.word_gram_hashes(col("__words"), 1)
    TextAnalysis.withWords(docs).select(col("doc_id"),
      graft.functions.HashFunctions.simhash_signature(wordHashes).as("simhash"))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into four 16-bit
    * keys; docs sharing any band are candidates. By pigeonhole this is
    * COMPLETE only for Hamming distance <= 3 (4 bands can't all differ);
    * pairs at distance 4..maxHamming appear only if their differing bits
    * happen to spare one band — treat larger maxHamming as best-effort
    * recall, not a guarantee. Reports the exact Hamming distance.
    * `portableHash` selects [[simHash]]'s engine-portable md5 word hash. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
      portableHash: Boolean = false): DataFrame =
    hammingPairs64(simHash(docs, portableHash), "simhash", maxHamming)

  /** Shared banded Hamming pair-finder over ANY 64-bit signature column —
    * the engine behind [[simHashPairs]] and the perceptual image-hash dedup
    * ([[Multimodal.dHashDupPairs]]). Bands the signature into four 16-bit
    * equi-join keys (pigeonhole-COMPLETE only for Hamming ≤ 3 — four bands
    * cannot all differ), dedups candidate pairs map-side, then verifies
    * the exact distance with one bit_count. `maxHamming` > 3 is accepted
    * but is BEST-EFFORT recall, not a guarantee: a distance-4+ pair whose
    * differing bits cover every band never becomes a candidate (the
    * [[simHashPairs]] contract, shared verbatim).
    * Input: (doc_id, `sigCol`: BIGINT); output: (doc1, doc2, hamming).
    * 100 TB shape: the only shuffle is the band equi-join on a bounded
    * 18-bit key space — no signature ever compares against the full corpus. */
  def hammingPairs64(sigs: DataFrame, sigCol: String, maxHamming: Int): DataFrame = {
    val banded = sigs.select(col("doc_id"), col(sigCol).as("__sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col(sigCol), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val hamming = {
      val x = col("s1").bitwiseXOR(col("s2"))
      bit_count(x)
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"),
        col("a.__sig").as("s1"), col("b.__sig").as("s2"))
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select("doc1", "doc2", "hamming")
  }

  /** Exact-substring duplicated-span detection (the span-level sibling of
    * document dedup, after Lee et al. 2022's ExactSubstr): every maximal
    * token span covered by `k`-grams that occur in ≥ 2 DISTINCT documents —
    * or, with `crossDocOnly = false`, ≥ 2 times ANYWHERE (so a document
    * repeating its own content also gets spans: the Gopher repetition rules
    * as a SCRUB rather than a doc-level flag, complementing
    * [[TextAnalysis.qualityRules]]). Output is one row per merged span —
    * (doc_id, span_start, span_end, n_tokens), 0-based inclusive token
    * positions — ready to drive span removal or repetition audits.
    *
    * Pipeline: positions come free from the ORDERED codegen'd gram-hash
    * array (posexplode — no string grams materialize); cross-doc gram
    * frequency is a partial-aggregated groupBy over distinct (gram, doc)
    * pairs (skew-safe: a hot gram ships one row per map partition, the same
    * posture as the hot-gram guard) — the occurrence-count mode aggregates
    * the position rows directly, equally partial. Duplicated positions then
    * merge into maximal spans per doc with a gaps-and-islands window — two
    * k-gram hits at starts p, q belong to one span iff q - p <= k (their
    * token ranges touch or overlap). Grams travel as 64-bit hashes: only
    * equality matters, and a collision is vanishing (~n²·2⁻⁶⁴).
    *
    * 100 TB shape: gram-keyed equi-joins and per-doc windows only — the
    * window partitions by doc_id, so no global sort; nothing quadratic
    * anywhere (contrast [[ngramJaccardPairs]]'s pair join: span detection
    * never forms document PAIRS at all). */
  def duplicatedSpans(docs: DataFrame, k: Int = 5,
      crossDocOnly: Boolean = true, broadcastHot: Boolean = false): DataFrame = {
    val pos = TextAnalysis.withWords(docs)
      .select(col("doc_id"),
        posexplode(graft.functions.HashFunctions.word_gram_hashes(col("__words"), k)))
      .withColumnRenamed("pos", "start").withColumnRenamed("col", "gram")
    // cross-doc gram frequency over [[gramSet]]'s map-side-distinct (doc,
    // gram) pairs — a .distinct() over the position rows would shuffle the
    // corpus's entire gram multiset just to deduplicate per doc. The
    // occurrence-count mode counts the position rows themselves.
    val hot = (if (crossDocOnly) gramSet(docs, k) else pos)
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2).select("gram")
    // (doc_id, start) is unique (one k-gram per position), so the semi-join
    // needs no distinct afterwards
    val dup = semiJoinHotGrams(pos, hot, broadcastHot).select("doc_id", "start")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("start")
    // gaps-and-islands: NULL lag (first row) compares to NULL → otherwise(1)
    // opens the first island, matching SQL CASE semantics exactly
    dup
      .withColumn("__new",
        when(col("start") - lag("start", 1).over(w) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("__island", sum("__new").over(w))
      .groupBy("doc_id", "__island")
      .agg(min(col("start")).as("span_start"), (max(col("start")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"),
        col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int").as("n_tokens"))
  }

  /** Span REMOVAL — the enforcement half of [[duplicatedSpans]] (ExactSubstr
    * dedup proper): rebuilds each document with every cross-doc duplicated
    * span dropped, keeping the surviving tokens in their original order.
    * Emits every input document: untouched docs pass through verbatim
    * (n_removed_tokens = 0) and a fully-covered doc yields the empty string —
    * row counts are stable, which downstream joins rely on.
    *
    * 100 TB shape: [[duplicatedSpans]]' equi-joins/windows, then one
    * (doc_id, pos) anti-join and a per-doc ordered fold (sort_array over
    * collected (pos, word) structs) — everything keys on doc_id, nothing
    * quadratic. The rebuild shuffles surviving tokens once; span-heavy
    * corpora shuffle LESS as more is removed. */
  def removeDuplicatedSpans(docs: DataFrame, k: Int = 5,
      crossDocOnly: Boolean = true, broadcastHot: Boolean = false): DataFrame = {
    val covered = duplicatedSpans(docs, k, crossDocOnly, broadcastHot).select(col("doc_id"),
      explode(sequence(col("span_start"), col("span_end"))).as("pos"))
    val toks = TextAnalysis.withWords(docs)
      .select(col("doc_id"), posexplode(col("__words")))
      .withColumnRenamed("col", "word")
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")), " ").as("__kept"),
        count(lit(1)).as("__n_kept"))
    TextAnalysis.withWords(docs)
      .select(col("doc_id"), size(col("__words")).as("__nw"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__kept"), lit("")).as("text_deduped"),
        (col("__nw") - coalesce(col("__n_kept"), lit(0L))).cast("int").as("n_removed_tokens"))
  }

  /** BYTE-level ExactSubstr span detection — the published formulation
    * (Lee et al. 2021 work on the byte stream, not word tokens): every
    * maximal byte span covered by `k`-byte windows occurring in ≥ 2
    * distinct documents (or ≥ 2 times anywhere with `crossDocOnly =
    * false`). Catches the sub-word and whitespace-variant duplication the
    * word-gram [[duplicatedSpans]] misses ("the cat sat." vs "the cat
    * sat" share no word 5-gram tail but 10+ byte windows). Positions are
    * byte offsets into the UTF-8 encoding — (doc_id, span_start,
    * span_end, n_bytes), 0-based inclusive.
    *
    * Same non-quadratic shape as the word version: the codegen'd
    * [[graft.functions.ByteGramHashes]] array gives positions free
    * (in-place window hashing, zero substring copies); hot-window
    * frequency partial-aggregates over map-side-distinct per-doc window
    * sets; islands merge per doc (q − p ≤ k ⇔ the byte ranges touch or
    * overlap). The suffix-array of the paper is the single-machine data
    * structure; the gram-join IS its distributed equivalent — both find
    * identical length-≥ k repeats, the join trades the paper's O(n log n)
    * construction for shuffle-parallel equi-joins that scale out. */
  def duplicatedByteSpans(docs: DataFrame, k: Int = 20,
      crossDocOnly: Boolean = true, broadcastHot: Boolean = false): DataFrame = {
    val hashes = graft.functions.HashFunctions.byte_gram_hashes(col("text"), k)
    val pos = docs.select(col("doc_id"), posexplode(hashes))
      .withColumnRenamed("pos", "start").withColumnRenamed("col", "gram")
    val hot = (if (crossDocOnly)
        docs.select(col("doc_id"), explode(array_distinct(hashes)).as("gram"))
      else pos)
      .groupBy("gram").agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2).select("gram")
    val dup = semiJoinHotGrams(pos, hot, broadcastHot).select("doc_id", "start")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("start")
    dup
      .withColumn("__new",
        when(col("start") - lag("start", 1).over(w) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("__island", sum("__new").over(w))
      .groupBy("doc_id", "__island")
      .agg(min(col("start")).as("span_start"), (max(col("start")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"),
        col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("int").as("n_bytes"))
  }

  /** Position ⋈ hot-gram semi-join with a DETERMINISTIC broadcast decision.
    *
    * Left to Catalyst, whether this semi-join broadcasts depends on the
    * PLANNING-TIME size estimate of the hot-gram aggregate — small corpora
    * get the broadcast, but at scale the estimate inflates past the
    * auto-broadcast threshold and the plan silently degrades to a
    * sort-merge join that shuffles one row PER TOKEN/BYTE POSITION (AQE
    * can rewrite the join at runtime, but only after the position side has
    * already written its shuffle files — the cost is paid either way). The
    * explicit hint pins the broadcast in the PLAN, so the position side
    * never enters a shuffle, and stays LAZY — no eager materialization, so
    * consumers that build on spans (removal, self-repetition) keep full
    * Catalyst pruning through the operator.
    *
    * The default is `broadcastHot = false` — the SAFE-AT-SCALE shape:
    * the hot set is every ≥2-doc gram, which grows with the corpus
    * without bound, so forcing a broadcast by default would OOM exactly
    * the 100 TB first-pass runs these operators advertise. Callers whose
    * corpus (or post-dedup batch) bounds the hot set opt INTO the
    * broadcast for the deterministic no-shuffle-of-positions plan — the
    * gate queries do, and PlanSpec pins the resulting broadcast semi-join.
    * With the flag off, Catalyst/AQE still broadcast small hot sets on
    * their own stats. (The span windows downstream partition by doc_id
    * either way.) */
  private def semiJoinHotGrams(pos: DataFrame, hot: DataFrame,
      broadcastHot: Boolean): DataFrame =
    if (broadcastHot) pos.join(broadcast(hot), Seq("gram"), "left_semi")
    else pos.join(hot, Seq("gram"), "left_semi")

  /** Byte-span REMOVAL — enforcement half of [[duplicatedByteSpans]].
    * Unlike the word version's per-token anti-join, the rebuild here is
    * pure INTERVAL COMPLEMENT: merged spans are disjoint and sorted, so
    * each doc's kept text is the concatenation of the gaps between
    * consecutive spans plus the tail — one window (lag of span_end), one
    * vocabulary-of-spans-sized collect per doc, substring slicing against
    * the original text. No per-byte (or per-token) explode ever
    * materializes: the shuffled data is one row per SPAN, which at any
    * scale is orders below the corpus byte count. Row-stable like the
    * word version: untouched docs pass through verbatim, fully-covered
    * docs yield the empty string. */
  def removeDuplicatedByteSpans(docs: DataFrame, k: Int = 20,
      crossDocOnly: Boolean = true, broadcastHot: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("span_start")
    val pieces = duplicatedByteSpans(docs, k, crossDocOnly, broadcastHot)
      .withColumn("piece_start",
        coalesce(lag(col("span_end"), 1).over(w) + 1, lit(0)))
      .withColumn("piece_end", col("span_start") - 1) // may be empty (< start)
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(
          col("piece_start").as("s"), col("piece_end").as("e")))).as("__gaps"),
        (max(col("span_end")) + 1).as("__tail_start"),
        sum(col("span_end") - col("span_start") + 1).as("__n_removed"))
    // span offsets are BYTE positions into the UTF-8 encoding (that is
    // ByteGramHashes' contract), so the rebuild slices the encoded BYTES —
    // substring over binary is byte-addressed — and decodes once at the
    // end. Char-based substr would land on the wrong characters for any
    // non-ASCII document (char index ≠ byte index). A span boundary that
    // splits a multi-byte character decodes that fragment to U+FFFD — the
    // published byte-level formulation operates below char granularity
    // and this is its documented edge, not a slicing bug.
    val bytes = encode(col("text"), "UTF-8")
    docs.select(col("doc_id"), col("text"))
      .join(pieces, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("__gaps").isNull, coalesce(col("text"), lit("")))
          .otherwise(decode(concat(
            aggregate(col("__gaps"), lit(Array.emptyByteArray), (acc, p) =>
              concat(acc, when(p.getField("e") >= p.getField("s"),
                bytes.substr(p.getField("s") + 1,
                  p.getField("e") - p.getField("s") + 1)).otherwise(lit(Array.emptyByteArray)))),
            bytes.substr(col("__tail_start") + 1, length(bytes))), "UTF-8"))
          .as("text_deduped"),
        coalesce(col("__n_removed"), lit(0L)).cast("int").as("n_removed_bytes"))
  }

  /** LINE-level cross-document dedup — the CCNet/RefinedWeb paragraph
    * stage: drop every line (text between `sep` occurrences) that appears
    * in at least `minDocFrequency` DISTINCT documents. The lines this
    * removes are the per-site boilerplate a crawl carries in-body —
    * "subscribe to our newsletter", cookie banners, share bars — which
    * block-level HTML extraction can miss when sites inline them into the
    * article container. Within-doc repeats of an otherwise-unique line are
    * kept (df counts documents, not occurrences); untouched docs pass
    * through verbatim and a fully-boilerplate doc yields the empty string —
    * row counts are stable.
    *
    * 100 TB shape: line frequency aggregates over per-doc-DISTINCT line
    * HASHES (text never enters the df shuffle; a ubiquitous line
    * partial-aggregates to one row per map partition — no hot-line
    * straggler), the removal is a hash-keyed anti-join, and the rebuild
    * shuffles only SURVIVING lines once, keyed by doc_id — boilerplate-
    * heavy corpora shuffle LESS as more is removed. Cardinality of the
    * line-hash aggregate is bounded by distinct lines, typically far under
    * distinct k-gram windows ([[duplicatedByteSpans]]' key space). */
  def removeCommonLines(docs: DataFrame, minDocFrequency: Long = 2,
      sep: String = "\n"): DataFrame = {
    require(minDocFrequency >= 2,
      s"minDocFrequency must be >= 2 (1 would remove every line), got $minDocFrequency")
    // a NULL text reads as the empty doc: one empty line, normal rules
    // (posexplode of a null array would silently DROP the row and break
    // the row-stability contract)
    val txt = coalesce(col("text"), lit(""))
    val lines = docs
      .select(col("doc_id"), posexplode(split(txt, java.util.regex.Pattern.quote(sep))))
      .select(col("doc_id"), col("pos"), col("col").as("line"), md5(col("col")).as("__h"))
    val hot = docs
      .select(col("doc_id"),
        explode(array_distinct(transform(
          split(txt, java.util.regex.Pattern.quote(sep)), l => md5(l)))).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFrequency).select("__h")
    val kept = lines.join(hot, Seq("__h"), "left_anti")
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), sep).as("__kept"),
        count(lit(1)).as("__n_kept"))
    docs
      .select(col("doc_id"),
        size(split(txt, java.util.regex.Pattern.quote(sep))).as("__nl"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__kept"), lit("")).as("text_deduped"),
        (col("__nl") - coalesce(col("__n_kept"), lit(0L))).cast("int").as("n_removed_lines"))
  }

  /** Incremental EXACT dedup — the production shape of a growing corpus:
    * dedup a NEW batch of documents against itself (first doc_id wins) and
    * against the content hashes of everything already ingested, returning
    * only the genuinely novel batch rows (all input columns preserved).
    * Batch and corpus doc_ids are assumed to come from disjoint id spaces
    * (the caller owns id allocation).
    *
    * 100 TB shape: the corpus — however large — is reduced map-side to
    * DISTINCT 128-bit hashes (text never shuffles); the batch's in-batch
    * winner window and the anti-join both key on that same hash, so the
    * batch is shuffled ONCE and the exchange is reused across the two
    * steps. Store the corpus hash set as its own table and this runs
    * without touching corpus text at all. */
  def dedupAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
      textCol: String = "text"): DataFrame = {
    val corpusHashes = corpus.select(md5(col(textCol)).as("__h")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h").orderBy("doc_id")
    newDocs.withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(corpusHashes, Seq("__h"), "left_anti")
      .drop("__h", "__rn")
  }

  /** Bloom-gated incremental exact dedup — output IDENTICAL to
    * [[dedupAgainstCorpus]] (shares its oracle): the corpus-hash Bloom
    * filter is a pure pruning lever with no semantic effect. One aggregate
    * pass compresses the corpus to a `numBits`-bit filter (Spark's
    * mergeable `BloomFilterAggregate` — the runtime-join-filter machinery,
    * partial-aggregates map-side; ~1.2 MB at 1M items / 1% fpp), collected
    * to the driver as ONE bounded row and pinned into the plan as a
    * literal (`might_contain` requires a constant filter side). The batch
    * then splits:
    *  - `might_contain` = false → the hash is PROVABLY absent (Bloom has
    *    no false negatives) — the row keeps without touching any join;
    *  - true (or null hash) → possibly present — only these rows pay the
    *    exact hash anti-join, which removes the fpp false positives.
    *
    * 100 TB posture: the continuous-ingest front gate. A mostly-novel
    * batch sends only ~(dup_rate + fpp) of its rows into the anti-join
    * shuffle, and the filter is a build-once artifact a long-running
    * ingest holds across batches (rebuild cadence = corpus growth /
    * `expectedItems`). Spark caps the filter at the runtime-filter conf
    * bounds (4M items / 2²⁶ bits by default) — beyond that, shard the
    * corpus and gate against per-shard filters. */
  def bloomGatedDedupAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
      textCol: String = "text", expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(expectedItems >= 0,
      s"expectedItems must be >= 0 (0 = size to the corpus), got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    // auto-size to the corpus: the filter literal travels inside the
    // generated code and every task binary, so a fixed worst-case size
    // taxes EVERY batch — one count pass right-sizes it (probe-measured:
    // a 1.2 MB always-1M-items literal made the sf0.1 query 2.5 s; sized
    // filters + the pinned batch below bring it to the q67 baseline)
    val items = if (expectedItems > 0) expectedItems
      else math.max(64L, corpus.count())
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val corpusHashes = corpus.select(md5(col(textCol)).as("__h"))
    val bloomRow = corpusHashes.agg(column(new BloomFilterAggregate(
        expression(xxhash64(col("__h"))), Literal(items), Literal(numBits))
      .toAggregateExpression()).as("__bf")).head()
    val bloomLit = Literal.create(
      if (bloomRow.isNullAt(0)) null else bloomRow.getAs[Array[Byte]](0), BinaryType)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__h").orderBy("doc_id")
    // eager localCheckpoint: the keep/verify branches below would each
    // re-derive the batch + window + bloom probe; pinning runs that once
    // (batch-scale storage — the batch is the small side by design)
    val firsts = newDocs.withColumn("__h", md5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      // null text → null hash → might_contain null → verify path, where
      // the anti-join's null-never-matches keeps the row — dedupAgainstCorpus's
      // exact behavior
      .withColumn("__maybe", coalesce(
        column(BloomFilterMightContain(bloomLit,
          expression(xxhash64(col("__h"))))), lit(true)))
      .localCheckpoint()
    val out = (c: DataFrame) => c.drop("__h", "__rn", "__maybe")
    out(firsts.filter(!col("__maybe")))
      .unionByName(out(firsts.filter(col("__maybe"))
        .join(corpusHashes.distinct(), Seq("__h"), "left_anti")))
  }

  /** Incremental NEAR-duplicate dedup: drop batch documents whose exact
    * n-gram Jaccard against ANY existing corpus document reaches
    * `threshold`. Same LSH-candidates → exact-verify structure as
    * [[lshDedupClusters]], with the join one-sided (batch × corpus, never
    * corpus × corpus): band keys from both sides meet in an equi-join, and
    * only candidate pairs pay the exact array_intersect verification.
    * In-batch near-dups are deliberately NOT handled here — run the batch
    * operators ([[lshDedupClusters]]) for that; doc_ids must come from
    * disjoint id spaces.
    *
    * Recall follows the [[lshDedupClusters]] banding math: with the default
    * one-slot bands, a true pair at Jaccard j is missed with probability
    * (1-j)^bands — ≤ 7e-12 at j ≥ 0.8, bands=16. */
  def nearDupAgainstCorpus(newDocs: DataFrame, corpus: DataFrame, n: Int = 3,
      numHashes: Int = 16, bands: Int = 16, threshold: Double = 0.5): DataFrame =
    nearDupCore(newDocs,
      bandedSide(corpus, n, numHashes, bands).withColumnRenamed("doc_id", "doc2"),
      gramArrays(corpus, n), n, numHashes, bands, threshold)

  /** One side's (doc_id, band, band_key) rows — what the persisted index
    * stores per corpus document. */
  private def bandedSide(docs: DataFrame, n: Int, numHashes: Int, bands: Int): DataFrame =
    bandedKeys(
      minHashSignatures(docs, n, numHashes)
        .filter(element_at(col("minhash"), 1) =!= Long.MaxValue),
      numHashes, bands)
      .drop("minhash")

  /** The shared candidates→verify→anti-join tail of the direct and
    * index-backed incremental near-dup paths — one implementation, so the
    * two entry points cannot drift.
    *
    * The BATCH side tokenizes ONCE (r22): band keys and verification grams
    * both derive from one pinned (doc_id, distinct-gram-hashes) frame —
    * the minhash signature is a per-seed MIN over gram hashes, so feeding
    * it the array_distinct'd gram array is bit-identical to feeding the
    * raw one (duplicates cannot change a minimum; MinHashIndexSpec pins
    * the equality). Before, `bandedSide(newDocs)` and `gramArrays(newDocs)`
    * were two independent subtrees, each re-running batch construction +
    * tokenization + gram hashing. The pin is batch-scale by the operator's
    * own contract (the batch is the small side by design — the
    * [[bloomGatedDedupAgainstCorpus]] pin argument), and the band join
    * still ships only (doc_id, band, band_key) keys, never gram payloads. */
  private def nearDupCore(newDocs: DataFrame, corpusBanded: DataFrame,
      corpusGrams: DataFrame, n: Int, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    val batchGrams = gramArrays(newDocs, n).localCheckpoint()
    val batchBanded = bandedKeys(
      batchGrams.select(col("doc_id"),
        graft.functions.HashFunctions.minhash_signature(col("grams"), numHashes)
          .as("minhash"))
        .filter(element_at(col("minhash"), 1) =!= Long.MaxValue),
      numHashes, bands).drop("minhash")
    val cands = batchBanded.withColumnRenamed("doc_id", "doc1")
      .join(corpusBanded, Seq("band", "band_key"))
      .select("doc1", "doc2").distinct()
    val dropIds = cands
      .join(batchGrams.select(col("doc_id").as("doc1"), col("grams").as("g1")), "doc1")
      .join(corpusGrams.select(col("doc_id").as("doc2"), col("grams").as("g2")), "doc2")
      // r22: count-only intersection, same as jaccardVerify below
      .withColumn("n_common",
        graft.functions.HashFunctions.intersect_count(col("g1"), col("g2")).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("g1")) + size(col("g2")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1").as("doc_id")).distinct()
    newDocs.join(dropIds, Seq("doc_id"), "left_anti")
  }

  /** Persist the CORPUS side of incremental near-dup dedup — the
    * build-once / probe-many production shape for continuous ingest (the
    * MinHash sibling of `Similarity.writeIvfIndex`): per-doc band keys and
    * verification gram arrays land as parquet, plus a one-row manifest
    * pinning (n, numHashes, bands) so a probe can never run with
    * mismatched parameters. A growing corpus appends new docs' rows to
    * both tables (append mode) without ever re-signing old documents.
    *
    * 100 TB shape: building costs ONE pass over the corpus; every later
    * batch probes against precomputed band keys — corpus text is never
    * re-tokenized, re-hashed, or even read. The probe's joins key on
    * (band, band_key) and doc_id exactly as the direct path's do. */
  def writeMinHashIndex(corpus: DataFrame, path: String, n: Int = 3,
      numHashes: Int = 16, bands: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    bandedSide(corpus, n, numHashes, bands)
      .write.mode("overwrite").parquet(s"$path/bands")
    gramArrays(corpus, n).write.mode("overwrite").parquet(s"$path/grams")
    Seq((n, numHashes, bands)).toDF("n", "num_hashes", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
  }

  /** Incremental near-dup dedup against a [[writeMinHashIndex]] layout:
    * identical semantics (and, by construction, identical code path from
    * candidates on) to [[nearDupAgainstCorpus]], with the corpus sides
    * read from the index instead of recomputed. */
  def nearDupAgainstIndex(newDocs: DataFrame, path: String,
      threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    // fields read BY NAME: a positional read would silently swap the
    // parameters under any manifest-schema reorder/widening and produce
    // wrong Jaccard verification instead of an error
    val m = spark.read.parquet(s"$path/manifest").head()
    val (n, numHashes, bands) =
      (m.getAs[Int]("n"), m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"))
    nearDupCore(newDocs,
      spark.read.parquet(s"$path/bands").withColumnRenamed("doc_id", "doc2"),
      spark.read.parquet(s"$path/grams"), n, numHashes, bands, threshold)
  }

  /** Fold a new batch of documents into a [[writeMinHashIndex]] layout —
    * continuous ingest's missing half: batch N's survivors join the corpus
    * that batch N+1 probes against WITHOUT recomputing any existing band
    * key or gram array (corpus text is never re-read, re-tokenized, or
    * re-hashed — per-append cost is proportional to the batch, not the
    * corpus). Parameters come FROM the manifest, so a mismatched-parameter
    * append is impossible by construction — the same invariant
    * [[nearDupAgainstIndex]] relies on. Within the append, duplicate rows
    * collapse (distinct) and doc_ids already present in the index are
    * skipped, making re-appends idempotent; the skip's anti-join ships
    * doc_ids only, never text. (Near-dup screening WITHIN a batch is the
    * probe step's contract — q68's pipeline — not a side effect here; two
    * rows sharing a doc_id with different text are a caller error.)
    *
    * The filtered batch materializes (persist + count) before the first
    * write: both appended tables derive from an anti-join against the
    * index being appended to, and without pinning, the second write could
    * re-list the directory and see the first write's own files. An ingest
    * batch is bounded by definition, so pinning it is safe at any corpus
    * size.
    *
    * Equivalence contract (MinHashIndexSpec): appending B1 then B2 to an
    * index over C holds row-for-row the same bands/grams/manifest as a
    * one-shot [[writeMinHashIndex]] over C ∪ B1 ∪ B2, and probes against
    * the two layouts return identical results. */
  def appendToMinHashIndex(newDocs: DataFrame, path: String): Unit =
      graft.util.MaintenanceLease.withWriterLease(
        path, "appendToMinHashIndex") {
    val spark = newDocs.sparkSession
    val m = spark.read.parquet(s"$path/manifest").head()
    val (n, numHashes, bands) =
      (m.getAs[Int]("n"), m.getAs[Int]("num_hashes"), m.getAs[Int]("bands"))
    // presence check against GRAMS (not bands): a doc too short to yield a
    // signature has gram rows but no band rows, and must still be skipped
    // on a re-append
    val existing = spark.read.parquet(s"$path/grams").select("doc_id").distinct()
    val batch = newDocs.select(col("doc_id"), col("text")).distinct()
      .join(existing, Seq("doc_id"), "left_anti")
      .persist()
    try {
      batch.count()
      bandedSide(batch, n, numHashes, bands)
        .write.mode("append").parquet(s"$path/bands")
      gramArrays(batch, n).write.mode("append").parquet(s"$path/grams")
    } finally { batch.unpersist(blocking = false); () }
  }

  /** COMPACT a [[writeMinHashIndex]] layout: rewrite `bands/` and
    * `grams/` each to `outFiles` files, collapsing the per-append file
    * accumulation — the MinHash member of the compaction triple
    * (postings buckets, IVF cells, band/gram tables). This layout is
    * flat (no partition dirs), so compaction here is pure file-count
    * control: size `outFiles` so one file ≈ one scan task of the
    * steady-state index. Rows are untouched — q230 probes the
    * appended+compacted index under the full-corpus oracle. Same
    * stopped-writer window as the other compactions; each table swaps
    * in via temp dir + two renames, and a crash between the two
    * table swaps leaves both tables complete (rows never change, only
    * file layout). */
  def compactMinHashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, outFiles: Int = 16): Unit = {
    import graft.util.Fs
    require(outFiles >= 1, s"outFiles must be >= 1, got $outFiles")
    graft.util.MaintenanceLease.withLease(path, "compactMinHashIndex") {
    def rewrite(sub: String): Unit = {
      val tmp = s"$path/${sub}_compact_tmp"
      Fs.rmTree(tmp)
      spark.read.parquet(s"$path/$sub").repartition(outFiles)
        .write.mode("overwrite").parquet(tmp)
      val live = s"$path/$sub"
      val old = s"$path/${sub}_old"
      Fs.rmTree(old)
      Fs.move(live, old)
      Fs.move(tmp, live)
      Fs.rmTree(old)
    }
    rewrite("bands")
    rewrite("grams")
    }
  }

  /** DELETE documents from a [[writeMinHashIndex]] layout — the
    * right-to-be-forgotten pass completing the deletion triple
    * (postings, IVF cells, band/gram tables). Contract:
    * delete ≡ rebuild-without — every band and gram row of the deleted
    * doc_ids vanishes, so a probe can never match against retracted
    * text (q237 proves it under the filtered-corpus oracle; filtering
    * probe-side instead would leave the data at rest). The manifest
    * (parameters only, no counters) is untouched.
    *
    * Unlike the two partitioned layouts, this one is FLAT — no
    * partition key isolates a doc's rows, so a delete pass rewrites
    * BOTH tables in full, O(index). That makes batching mandatory at
    * scale, and since the full rewrite is exactly what
    * [[compactMinHashIndex]] pays, deletion FUSES with compaction:
    * one rewrite does both (`outFiles` re-sizes the tables as the
    * compaction would), so a steady-state ingest runs its periodic
    * compaction with the accumulated deletion set for free. Same
    * stopped-writer window as the other deletes.
    *
    * Crash protocol (the parked-dir posture of the postings/IVF
    * deletes, here two-table): BOTH rewrites stage to temp dirs while
    * both live tables are intact (the writes execute the reads), then
    * both old tables park OUTSIDE the live tree in `mh_old_del/`, both
    * rewrites install, and the park is deleted only at the very end. A
    * parked dir's presence is the loud signal a prior run crashed
    * (this function refuses to start over one); recovery is uniform:
    * for each of bands/grams whose LIVE dir is missing, move its
    * parked dir back, then remove the park and any `*_delete_tmp`
    * dirs and retry with the SAME deletion set (the set must not be
    * re-derived from the index — a half-installed table would yield
    * an empty re-derivation). */
  def deleteFromMinHashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, deleteIds: DataFrame, outFiles: Int = 16): Unit = {
    import graft.util.Fs
    require(outFiles >= 1, s"outFiles must be >= 1, got $outFiles")
    // parked-dir precondition BEFORE the lease: a refusal-to-start must
    // not strand a fresh marker on top of the crash signal it reports
    // (the operator would face two interleaved recoveries — r18 review)
    val parked = s"$path/mh_old_del"
    require(!Fs.exists(parked),
      s"$parked exists — a prior delete crashed mid-swap; restore any " +
        "missing live table from it (see scaladoc) before retrying")
    graft.util.MaintenanceLease.withLease(path, "deleteFromMinHashIndex") {
    val subs = Seq("bands", "grams")
    // localCheckpoint, not persist: the deletion set naturally derives
    // FROM the index (a retraction sweep selects doc_ids out of it) —
    // an evicted persisted partition would recompute its lineage against
    // a mutated table and silently come back empty (the appendToIvfIndex
    // hazard, here across a mutation this function itself performs)
    val ids = deleteIds.select("doc_id").distinct().localCheckpoint()
    try {
      // stage BOTH rewrites first — every read of old state completes
      // before any rename displaces it
      subs.foreach { sub =>
        val tmp = s"$path/${sub}_delete_tmp"
        Fs.rmTree(tmp)
        val survivors = spark.read.parquet(s"$path/$sub")
          .join(ids, Seq("doc_id"), "left_anti")
        survivors.repartition(outFiles)
          .write.mode("overwrite").parquet(tmp)
        // a deletion set covering EVERY indexed doc leaves a rewrite
        // with no data file (empty partitions write nothing), and a
        // later read of the installed table would fail schema
        // inference. An emptied index is a legitimate state — keep it
        // READABLE with one schema-carrying empty file, the serving
        // table's tombstone-everything posture (r18 ADVICE)
        if (!Fs.listChildren(tmp).exists { case (name, isDir) =>
            !isDir && !name.startsWith("_") && !name.startsWith(".") })
          survivors.limit(0).coalesce(1)
            .write.mode("overwrite").parquet(tmp)
      }
      Fs.mkdirs(parked)
      subs.foreach(sub => Fs.move(s"$path/$sub", s"$parked/$sub"))
      subs.foreach(sub => Fs.move(s"$path/${sub}_delete_tmp", s"$path/$sub"))
      // install complete — the park seals (marker) and tears down
      // MARKER-LAST, so a crash mid-teardown can never leave a partial
      // park that recovery would mistake for a complete pre-delete
      // state (r20 review #1)
      graft.util.MaintenanceLease.sealAndDismantlePark(parked)
    } finally { releaseLocalCheckpoint(ids) }
    }
  }

  /** Fuzzy duplicate pairs by EDIT DISTANCE with prefix blocking — the
    * record-linkage screen for typo'd / suffix-edited copies that token-set
    * measures (Jaccard over grams) under-weight: candidates share their
    * first `blockChars` characters (standard prefix blocking), and only
    * candidates pay the O(len²) Levenshtein verification.
    *
    * Recall contract: a true pair whose edit falls INSIDE the first
    * `blockChars` characters is missed — prefix blocking trades that for
    * an equi-join candidate step, the same shape-for-recall trade as the
    * LSH operators (run multiple passes with different block keys — e.g.
    * a suffix block — to cover edits anywhere). The oracle mirrors the
    * blocking, so correctness is checked at the operator's own contract.
    *
    * 100 TB shape: block keys derive map-side; the candidate join is an
    * equi-join on the block key, so cost tracks block sizes (bounded by
    * prefix collisions), never the corpus square; `levenshtein` is
    * codegen'd (Spark's built-in StringExpressions) and runs only on
    * co-blocked pairs. */
  def fuzzyDupPairs(docs: DataFrame, maxDist: Int = 8,
      blockChars: Int = 12): DataFrame = {
    require(maxDist >= 0 && blockChars >= 1,
      s"need maxDist >= 0 and blockChars >= 1, got $maxDist / $blockChars")
    val a = docs.select(col("doc_id").as("id1"), col("text").as("t1"),
      substring(col("text"), 1, blockChars).as("bk"))
    val b = docs.select(col("doc_id").as("id2"), col("text").as("t2"),
      substring(col("text"), 1, blockChars).as("bk"))
    // three-stage pruning before any full distance computation:
    //  1. id order halves the pairs;
    //  2. |len1 - len2| <= maxDist is a free lower bound on the distance —
    //     it discards most co-blocked NON-duplicates without touching a DP
    //     cell;
    //  3. the THRESHOLDED levenshtein runs a banded DP — O(len · maxDist)
    //     instead of O(len²), returning -1 past the threshold (an ~18×
    //     cell-count cut at 300-char docs, maxDist 8). Exact distances for
    //     every surviving pair, so the SQL oracle is unchanged.
    a.join(b, Seq("bk"))
      .filter(col("id1") < col("id2") &&
        abs(length(col("t1")) - length(col("t2"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("t1"), col("t2"), maxDist))
      .filter(col("edit_dist") >= 0)
      .select(col("id1"), col("id2"), col("edit_dist"))
  }

  /** Content-defined chunking (CDC) — the storage-dedup primitive under
    * systems like LBFS/restic/borg, here at WORD granularity so the SQL
    * oracle replays it: a chunk boundary falls AFTER every word whose
    * 16-bit md5 bucket (the q40 `hashBucket16` idiom) is ≡ 0 mod `divisor`,
    * giving expected chunk length `divisor` words. Because each boundary
    * depends only on the word AT the boundary, an edit inside one chunk
    * never shifts any other chunk's boundaries — exactly the property that
    * lets near-duplicate documents share every chunk outside the edited
    * region, where fixed-size chunking would misalign the whole tail.
    *
    * Entirely IN-ROW: one higher-order `aggregate` fold builds the chunk
    * texts left-to-right (linear, no per-word explode, no shuffle), then
    * posexplode emits one row per chunk — (doc_id, chunk_idx, n_words,
    * chunk_hash). Cross-doc sharing is then a plain groupBy on chunk_hash.
    * The fold tracks an explicit `has` flag rather than testing `cur = ''`
    * so empty words (doubled spaces) join exactly like the oracle's
    * `string_agg(word, ' ')`. Docs with empty/null text emit no chunks
    * (documented, the q63 convention).
    *
    * At 100 TB: the fold is map-side per document; only (hash, counts)
    * ever needs to shuffle for the dedup report — the text never does.
    */
  def cdcChunks(docs: DataFrame, divisor: Int = 16): DataFrame = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    // r21: the boundary walk is ONE codegen'd expression (CdcChunkSplit —
    // the HOF fold ran interpreted with an md5 per word per element and
    // re-copied the growing chunk text each step; see the expression's
    // scaladoc for the bit-identical value contract)
    val folded = graft.functions.CdcFunctions.cdc_chunk_split(
      split(col("text"), " ", -1), divisor)
    docs
      .filter(length(coalesce(col("text"), lit(""))) > 0)
      .select(col("doc_id"), posexplode(folded))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
        size(split(col("col"), " ", -1)).cast("long").as("n_words"),
        md5(col("col")).as("chunk_hash"))
  }
}
