package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * All randomness derives from md5 of a caller-chosen key, so results are
  * (a) stable across runs, partitionings, and cluster sizes — re-running the
  * pipeline never shuffles a document between train and test; (b) portable —
  * md5 is identical in every engine, so the same split reproduces in SQL
  * warehouses (and in the DuckDB oracle). Everything is map-side except the
  * per-stratum top-k, which is one shuffle + WindowGroupLimit.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, 65536) from the key's md5. */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Train/val/test assignment by md5 bucket. Fractions are quantized to
    * 1/65536 — exact thresholds, zero per-run variance. */
  def hashSplit(df: DataFrame, key: Column,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val trainUpper = (trainFrac * 65536).toInt
    val valUpper = ((trainFrac + valFrac) * 65536).toInt
    val b = hashBucket16(key)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainUpper, "train")
          .when(col("bucket") < valUpper, "val")
          .otherwise("test"))
  }

  /** LEAKAGE-SAFE split: assignment by DEDUP CLUSTER, not by document.
    * Doc-keyed [[hashSplit]] cannot prevent test-set contamination —
    * two near-identical documents flip independent md5 coins, so a
    * held-out doc's near-duplicate lands in train with probability
    * trainFrac. Here every doc keys by its cluster canonical
    * (`clusters` = (doc_id, cluster_id), e.g.
    * [[graft.operators.Dedup.lshDedupClusters]]; docs in no cluster key
    * by themselves) and then flips the SAME md5 bucket coin as
    * [[hashSplit]] — proportions hold in expectation over cluster
    * keys, and ZERO near-dup pairs straddle splits by construction
    * (cluster members share the key, hence the coin, hence the split).
    *
    * 100 TB shape: `clusters` holds only docs that HAVE a near-dup —
    * tiny against the corpus — so the left join BROADCASTS (hinted:
    * the cluster frame is a checkpoint leaf with unknown stats, and
    * without the hint Catalyst sort-merge-joins the full corpus —
    * measured on the q238 plan). A corpus where near-dup membership
    * rivals corpus size has a bigger problem than this join; drop the
    * hint if that's genuinely you. The coin is a map-side projection. */
  def clusterSafeSplit(docs: DataFrame, clusters: DataFrame,
      trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val keyed = docs
      .join(broadcast(clusters.select(col("doc_id"), col("cluster_id"))),
        Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .drop("cluster_id")
    hashSplit(keyed, col("split_key"), trainFrac, valFrac)
  }

  /** Exactly k rows per stratum, chosen by deterministic md5 order with the
    * key as tiebreak. Spark plans this as WindowGroupLimit: only k rows per
    * stratum survive to the final sort — no full-stratum materialization. */
  def stratifiedSample(df: DataFrame, stratum: String, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Source-mixture downsampling — hit a target domain composition (e.g.
    * 50% web / 30% books / 20% code) without upsampling: the most
    * weight-constrained source keeps ALL its rows and every other source
    * downsamples proportionally, giving the largest corpus with exactly the
    * requested mixture. keep_s = T·w_s / n_s with T = min_s(n_s / w_s),
    * applied as an md5-bucket threshold quantized UP to 1/65536 (ceil, not
    * floor: for the constrained source the exact keep fraction is 1.0 but
    * the FP round-trip (n/w)·w/n can land a hair below it, and flooring
    * would shave bucket-65535 rows off the source that must keep
    * everything) — the deterministic/portable coin every sampler here uses.
    * Sources absent from `weights` (weight 0) drop entirely.
    *
    * Scale shape: one tiny groupBy for the per-source counts, thresholds
    * broadcast back, then a map-side filter — the corpus itself shuffles
    * nothing. Threshold arithmetic is plain double division/floor in-frame,
    * so the SQL oracle reproduces it bit-for-bit. */
  def mixSources(df: DataFrame, weights: Map[String, Double],
      sourceCol: String = "source", key: Column = col("doc_id")): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixSources needs at least one source with positive weight")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, wt)) =>
      when(col(sourceCol) === s, wt).otherwise(acc)
    }
    val weighted = df.withColumn("__w", w).filter(col("__w") > 0)
    val counts = weighted.groupBy(sourceCol, "__w").agg(count(lit(1)).as("__n"))
    val total = counts.agg(min(col("__n") / col("__w")).as("__t"))
    val thresholds = counts.crossJoin(broadcast(total))
      .withColumn("__thr",
        ceil(col("__t") * col("__w") / col("__n") * 65536).cast("long"))
      .select(col(sourceCol), col("__thr"))
    weighted.join(broadcast(thresholds), sourceCol)
      .filter(hashBucket16(key).cast("long") < col("__thr"))
      .drop("__w", "__thr")
  }

  /** Deterministic corpus shuffle — the training-order stage: a dataloader
    * must see documents in pseudo-random order, reproducibly (restarts,
    * re-runs, and audits replay the exact order), without any global sort.
    * Each row gets a `shard` (md5-bucket of (seed, key) mod `shards`) and a
    * `pos` — its rank within the shard by full-md5 order, key tiebreak.
    * Shard-local positions are the scale posture: one shuffle on the shard
    * key, window per shard, NO global row_number (a single-partition window
    * is the classic 100 TB killer); a dataloader reads shards in parallel
    * and walks each by pos, which is exactly how sharded training input is
    * consumed. New seed → completely new order (per-epoch reshuffling). */
  def deterministicShuffle(df: DataFrame, key: Column = col("doc_id"),
      shards: Int = 8, seed: String = "shuffle"): DataFrame = {
    require(shards > 0, s"shards must be > 0, got $shards")
    val h = md5(concat(lit(seed + ":"), key.cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(conv(substring(col("__h"), 1, 4), 16, 10)
        .cast("int"), lit(shards)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("__h"), key)).cast("long"))
      .drop("__h")
  }

  /** Shard manifest — the integrity record published beside an exported
    * dataset (the WebDataset/HuggingFace convention of a sidecar stats
    * file per shard): for each shard of [[deterministicShuffle]]'s
    * assignment, the document count, whitespace-token count, and an
    * ORDER-INDEPENDENT exact checksum — bit_xor over a 60-bit integer
    * image of md5(doc_id ‖ ':' ‖ text). XOR commutes, so the checksum is
    * partition-order-proof (no float/ordering hazard), and hashing the
    * (id, text) PAIR means two different docs sharing text still
    * contribute distinct terms — the classic XOR-cancellation trap only
    * fires on fully identical rows, which ids preclude. A consumer
    * re-derives the manifest after transfer and compares row-for-row.
    * One groupBy(shard) with map-side combine; text never shuffles. */
  def shardManifest(docs: DataFrame, shards: Int = 8,
      seed: String = "shuffle"): DataFrame = {
    require(shards > 0, s"shards must be > 0, got $shards")
    val shard = pmod(conv(substring(
      md5(concat(lit(seed + ":"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("int"), lit(shards))
    docs.select(shard.as("shard"),
        size(split(col("text"), " ")).cast("long").as("__t"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))),
          1, 15), 16, 10).cast("long").as("__c"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"),
        expr("bit_xor(__c)").as("checksum"))
  }

  /** Weighted EPOCH upsampling — the other half of mixture control:
    * [[mixSources]] hits a target composition by downsampling (largest
    * corpus, nothing repeats); this hits it by UPsampling (nothing drops —
    * the standard practice when high-quality sources are small: Wikipedia
    * at 3 epochs while web stays at 1). The most over-weighted source runs
    * exactly one epoch (rate 1), every other source repeats at rate
    * r_s = T·w_s/n_s ≥ 1 with T = max_s(n_s/w_s): ⌊r⌋ full epochs for every
    * row plus one extra copy for the md5-bucket fraction of rows that
    * covers the remainder — deterministic fractional epochs, no RNG. The
    * output gains an `epoch` column (0-based copy index) so downstream
    * packing/shuffling can keep copies distinguishable.
    *
    * Rate passes through round(·, 6) before ⌊·⌋/remainder (the repo float
    * policy: the constrained source's exact 1.0 can land an ulp off after
    * (n/w)·w/n). The extra-copy coin hashes key||":up" — independent of the
    * split/shard coins so upsampling never correlates with fold assignment.
    * Scale shape: tiny count aggregate, broadcast rates, then a map-side
    * explode of at most ⌈r⌉ copies — the corpus shuffles nothing. */
  def epochMix(df: DataFrame, weights: Map[String, Double],
      sourceCol: String = "source", key: Column = col("doc_id")): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "epochMix needs at least one source with positive weight")
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, wt)) =>
      when(col(sourceCol) === s, wt).otherwise(acc)
    }
    val weighted = df.withColumn("__w", w).filter(col("__w") > 0)
    val counts = weighted.groupBy(sourceCol, "__w").agg(count(lit(1)).as("__n"))
    val total = counts.agg(max(col("__n") / col("__w")).as("__t"))
    val rates = counts.crossJoin(broadcast(total))
      .withColumn("__r", round(col("__t") * col("__w") / col("__n"), 6))
      .withColumn("__full", floor(col("__r")).cast("int"))
      .withColumn("__thr",
        ceil((col("__r") - floor(col("__r"))) * 65536).cast("long"))
      .select(col(sourceCol), col("__full"), col("__thr"))
    weighted.join(broadcast(rates), sourceCol)
      .withColumn("__extra",
        when(hashBucket16(concat(key.cast("string"), lit(":up")))
          .cast("long") < col("__thr"), 1).otherwise(0))
      .withColumn("epoch",
        explode(sequence(lit(0), col("__full") + col("__extra") - 1)))
      .drop("__w", "__full", "__thr", "__extra")
  }

  /** Temperature-based source mixing — the τ-weighted rebalancing used for
    * multilingual / multi-domain training mixtures: target share ∝ n_s^τ,
    * so τ = 1 keeps natural proportions and τ → 0 approaches uniform.
    * Downsampling-only (same most-constrained rule as [[mixSources]]): with
    * τ < 1 the SMALLEST source keeps everything and source s keeps
    * (n_min/n_s)^(1−τ) of its rows.
    *
    * The keep fraction passes through round(·, 6) BEFORE the 1/65536
    * quantization: unlike mixSources' exact integer ratios, pow() can
    * differ by an ulp across engines, and the 6-decimal round absorbs that
    * before any ceil boundary (the repo-wide float policy). Same scale
    * shape as mixSources: tiny count aggregate, broadcast thresholds,
    * map-side filter. */
  def temperatureMix(df: DataFrame, tau: Double, sourceCol: String = "source",
      key: Column = col("doc_id")): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", pow(col("__n").cast("double"), tau))
    val total = counts.agg(min(col("__n") / col("__w")).as("__t"))
    val thresholds = counts.crossJoin(broadcast(total))
      .withColumn("__thr",
        ceil(round(col("__t") * col("__w") / col("__n"), 6) * 65536).cast("long"))
      .select(col(sourceCol), col("__thr"))
    df.join(broadcast(thresholds), sourceCol)
      .filter(hashBucket16(key).cast("long") < col("__thr"))
      .drop("__thr")
  }

  /** Token-budget selection — "take the best documents until N tokens":
    * rows ordered by (`scoreCol` DESC, md5(doc_id), doc_id) are kept while
    * the running `weightCol` total stays ≤ `budget`. The curation step
    * that turns a scored corpus into a fixed-size training mix.
    *
    * A naive prefix sum is ONE global window — the single-reducer killer.
    * Instead: (1) `buckets`−1 approximate score quantiles (one tiny
    * aggregate, collected as literals) split rows into score-monotonic
    * buckets; (2) exact per-bucket weight totals (≤ `buckets` rows on the
    * driver) locate the budget boundary; (3) buckets wholly inside the
    * budget pass through with NO window, buckets past it drop at the
    * filter, and only the ONE boundary bucket runs a window over its
    * ~N/buckets rows. The output is provably the global-prefix-sum
    * selection for ANY monotonic bucketing — quantile-sketch imprecision
    * moves bucket edges, never the verdict — which is why an approximate
    * sketch is safe in an exact operator. Ties across equal scores break
    * by md5 then doc_id, so the kept set is unique and rerun-stable.
    *
    * 100 TB posture: two bounded driver collects (boundaries, totals —
    * the IVF-centroids convention), shuffles carry only (doc_id, score,
    * weight), and the boundary window sorts one bucket on one reducer —
    * size `buckets` so corpus/buckets fits an executor. */
  def tokenBudget(docs0: DataFrame, budget: Long,
      scoreCol: String = "quality_score", weightCol: String = "n_tokens",
      buckets: Int = 64): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // eager localCheckpoint: the selection makes FOUR passes over the
    // input (boundary sketch, bucket totals, kept buckets, boundary
    // bucket) — pinning evaluates an expensive upstream (e.g. a quality
    // scorer) once instead of four times (probe-measured 4.3 s → 0.35 s
    // on the q118 composition) and guarantees all passes see identical
    // rows. Callers should project to the needed columns first; the pin
    // holds exactly the input selection.
    val docs = docs0.localCheckpoint()
    val outCols = docs.columns.map(col).toSeq
    val bdRow = docs.agg(percentile_approx(col(scoreCol),
      array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*),
      lit(10000)).as("bd")).head()
    if (bdRow.isNullAt(0)) return docs.filter(lit(false)) // empty input
    val bds = bdRow.getSeq[Any](0).map(_.toString.toDouble)
    // bucket 0 = top scores: count of boundaries strictly above the score
    // is monotonic non-increasing in score, which is all correctness needs.
    // A NULL score sorts LAST in the (score DESC, …) selection order (both
    // engines default DESC to nulls-last), so its bucket must be the LAST
    // one — coalesce to -∞ makes every boundary sit above it. Without the
    // coalesce, `b > NULL` is NULL → the when() falls to 0 and null-score
    // rows land in bucket 0, the top FULLY-KEPT bucket — breaking the
    // global-prefix-selection guarantee the operator proves.
    val bdArr = array(bds.map(lit): _*)
    val scoreKey = coalesce(col(scoreCol).cast("double"), lit(Double.NegativeInfinity))
    val withB = docs.withColumn("__bkt",
      aggregate(bdArr, lit(0),
        (acc, b) => acc + when(b > scoreKey, 1).otherwise(0)))
    val totals = withB.groupBy("__bkt")
      .agg(sum(col(weightCol).cast("long")).as("__w")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets).scanLeft(0L)((acc, k) => acc + totals.getOrElse(k, 0L))
    val fullyKept = (0 until buckets).filter(k => offsets(k) + totals.getOrElse(k, 0L) <= budget)
    val boundary = (0 until buckets).find(k =>
      offsets(k) < budget && offsets(k) + totals.getOrElse(k, 0L) > budget)
    val keepAll = withB.filter(
      if (fullyKept.isEmpty) lit(false) else col("__bkt") <= fullyKept.max)
    val atBoundary = boundary match {
      case None => withB.filter(lit(false))
      case Some(k) =>
        val w = Window.partitionBy("__bkt")
          .orderBy(col(scoreCol).desc, md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        withB.filter(col("__bkt") === k)
          .withColumn("__cum", lit(offsets(k)) + sum(col(weightCol).cast("long")).over(w))
          .filter(col("__cum") <= budget)
    }
    keepAll.select(outCols: _*).unionByName(atBoundary.select(outCols: _*))
  }

  /** UniMax source allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling") — distribute a total token `budget`
    * across sources as uniformly as possible subject to a per-source
    * repetition cap of `epochCap` epochs: walk sources ASCENDING by size;
    * each takes min(its cap, remaining budget ÷ remaining sources), and
    * whatever a small source can't absorb rolls forward to the larger ones.
    * The published fix for both natural-proportion (head-language-dominated)
    * and temperature mixing (tail languages repeated hundreds of epochs).
    *
    * ALL arithmetic is integer (floor division), so the allocation is
    * bit-reproducible in any engine — the oracle replays the walk as a
    * recursive CTE. Output: one row per source —
    * (source, n_tokens, alloc_tokens, epochs_e6, share_e6), epochs/share in
    * integer micro-units of alloc/n_tokens and alloc/budget.
    *
    * 100 TB shape: the per-source sizes are ONE partial-aggregated groupBy
    * over (source, weight); the walk itself runs on the driver over the
    * per-source rows — bounded by construction (sources are a handful of
    * corpus slices, the IVF-centroids collect convention), and inherently
    * sequential: each source's take depends on every smaller source's.
    * Micro-unit numerators cap at alloc·10⁶ — callers above ~9·10¹² tokens
    * per source should rescale the budget unit (e.g. kilotokens) before
    * the walk; the epoch cap n·epochCap is the walk's own first overflow
    * point and is guarded (saturates to Long.MaxValue, where min() then
    * picks the fair share), so the allocation itself cannot overflow. */
  def uniMaxMix(docs: DataFrame, budget: Long, epochCap: Int,
      sourceCol: String = "source",
      weight: Column = size(split(col("text"), " ")).cast("long")): DataFrame =
    docs.sparkSession
      .createDataFrame(uniMaxWalk(docs, budget, epochCap, sourceCol, weight))
      .toDF(sourceCol, "n_tokens", "alloc_tokens", "epochs_e6", "share_e6")

  /** The [[uniMaxMix]] walk itself — per-source
    * (source, n_tokens, alloc, epochs_e6, share_e6) rows. */
  private def uniMaxWalk(docs: DataFrame, budget: Long, epochCap: Int,
      sourceCol: String, weight: Column): Seq[(String, Long, Long, Long, Long)] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(epochCap > 0, s"epochCap must be positive, got $epochCap")
    val sizes = docs.groupBy(sourceCol)
      .agg(coalesce(sum(weight), lit(0L)).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (n, s) } // the walk's ascending-size order
    var rem = budget
    var m = sizes.length.toLong
    sizes.toSeq.map { case (src, n) =>
      val cap = if (n > Long.MaxValue / epochCap) Long.MaxValue else n * epochCap
      val alloc = math.min(cap, rem / m)
      rem -= alloc; m -= 1
      (src, n, alloc, if (n > 0) alloc * 1000000L / n else 0L,
        alloc * 1000000L / budget)
    }
  }

  /** Proportional stratified selection by LARGEST REMAINDER (Hamilton
    * apportionment) — draw EXACTLY `k` rows total, allocated across
    * strata proportionally to their sizes: each stratum gets
    * ⌊k·n_s/N⌋ seats, and the k − Σ⌊·⌋ leftover seats go to the largest
    * fractional remainders (ties by stratum name). The eval-set shape
    * "exactly 1000 held-out docs, mirroring the corpus mix" — a plain
    * per-stratum fraction can't hit an exact total, and a global top-k
    * ignores the mix. Within a stratum rows are chosen by md5 rank (the
    * [[stratifiedSample]] determinism), so the draw is rerun- and
    * partition-stable.
    *
    * ALL allocation arithmetic is integer (remainder comparison via
    * k·n_s mod N — no fractions materialize), and the seat table is a
    * driver-side walk over the ≤\|strata\| size rows (the uniMaxMix
    * convention); the per-stratum pick is one WindowGroupLimit window. */
  def proportionalSplit(df: DataFrame, k: Long, stratumCol: String = "source",
      key: Column = col("doc_id")): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = sizes.map(_._2).sum
    require(k <= total, s"k=$k exceeds the corpus size $total")
    val base = sizes.map { case (s, n) => (s, n, k * n / total, k * n % total) }
    val leftover = (k - base.map(_._3).sum).toInt
    val bumped = base.sortBy { case (s, _, _, rem) => (-rem, s) }
      .zipWithIndex
      .map { case ((s, n, seats, _), i) =>
        (s, n, seats + (if (i < leftover) 1L else 0L)) }
    val quota = spark.createDataFrame(bumped.toSeq)
      .toDF(stratumCol, "__n", "__seats")
      .select(col(stratumCol), col("__seats"))
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(key.cast("string")), key)
    df.join(broadcast(quota), stratumCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__seats"))
      .drop("__rn", "__seats")
  }

  /** MATERIALIZE the [[uniMaxMix]] allocation: each document repeats
    * ⌊epochs⌋ times plus one md5-coin extra copy with probability equal to
    * the fractional epoch (the [[epochMix]] realization idiom, threshold
    * quantized to 1/65536 with INTEGER ceiling arithmetic — no float
    * anywhere), so each source's expected token count equals its walk
    * allocation and the draw is per-document deterministic. A source whose
    * allocation floors to zero epochs contributes only its coin-selected
    * rows (and none when the fraction is zero too — the explicit filter;
    * Spark's `sequence(0, -1)` would otherwise DESCEND, not empty out).
    * Output = input columns + `epoch`. Scale: the walk rows broadcast; the
    * expansion is one map-side generator, no shuffle. */
  def uniMaxApply(docs: DataFrame, budget: Long, epochCap: Int,
      sourceCol: String = "source",
      weight: Column = size(split(col("text"), " ")).cast("long"),
      key: Column = col("doc_id")): DataFrame = {
    val spark = docs.sparkSession
    val alloc = spark
      .createDataFrame(uniMaxWalk(docs, budget, epochCap, sourceCol, weight))
      .toDF(sourceCol, "n_tokens", "alloc_tokens", "epochs_e6", "share_e6")
      .select(col(sourceCol),
        expr("epochs_e6 div 1000000").cast("int").as("__full"),
        // ceil(frac_e6 · 65536 / 10⁶) without floats
        expr("((epochs_e6 % 1000000) * 65536 + 999999) div 1000000").as("__thr"))
    docs.join(broadcast(alloc), sourceCol)
      .withColumn("__extra",
        when(hashBucket16(concat(key.cast("string"), lit(":up"))).cast("long")
          < col("__thr"), 1).otherwise(0))
      .filter(col("__full") + col("__extra") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("__full") + col("__extra") - 1)))
      .drop("__full", "__thr", "__extra")
  }
}
