package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for interactive profiling of 100 TB tables, where
  * the exact versions (countDistinct's double shuffle, exact percentile's
  * full sort) are the wrong tool. All built-ins: HyperLogLog++ for distinct
  * counts, KLL-style quantile sketches for percentiles — both one-pass,
  * mergeable partial aggregates, so they stay map-side until a single
  * compact sketch per group crosses the wire.
  *
  * Results are approximate by construction (HLL++ default rsd 5%,
  * approx_percentile accuracy 1/10000), so these are NOT DuckDB-hash-
  * comparable — the unit tests assert error bounds against exact answers
  * instead.
  */
object Sketches {

  /** Per-group distinct counts and quantiles in one pass over lineitem-shaped
    * data: HLL++ distinct orders/parts + approx median and p95 quantity. */
  def profile(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col("l_orderkey")).as("approx_orders"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("approx_median_qty"),
      approx_percentile(col("l_quantity"), lit(0.95), lit(10000)).as("approx_p95_qty"))

  /** [[profile]] with its error CONTRACT evaluated in-query: the exact
    * distinct counts and an exact quantile band are computed beside the
    * sketches, and each approximate value is reduced to a deterministic
    * `*_within_bound` boolean — HLL++ within 3×rsd (rsd 0.05 ⇒ ±15%,
    * ≥ 99.7% per the sketch's error model, deterministic here because the
    * hash is seedless), approx percentiles inside the exact ±0.01-rank
    * band (guarantee is ±1/10000). This is the VERIFICATION harness, not
    * the production path — the exact side pays countDistinct's Expand
    * shuffle and a full percentile sort, exactly the cost [[profile]]
    * exists to avoid; run it when validating a profile pipeline, not
    * inside one. */
  def profileChecked(li: DataFrame): DataFrame = {
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact_orders"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      percentile(col("l_quantity"), lit(0.49)).as("q49"),
      percentile(col("l_quantity"), lit(0.51)).as("q51"),
      percentile(col("l_quantity"), lit(0.94)).as("p94"),
      percentile(col("l_quantity"), lit(0.96)).as("p96"))
    def withinRel(approx: Column, ex: Column, tol: Double): Column =
      abs(approx.cast("double") - ex.cast("double")) <= lit(tol) * ex.cast("double")
    profile(li).join(exact, "l_returnflag").select(
      col("l_returnflag"), col("n_rows"), col("exact_orders"), col("exact_parts"),
      withinRel(col("approx_orders"), col("exact_orders"), 0.15).as("orders_within_bound"),
      withinRel(col("approx_parts"), col("exact_parts"), 0.15).as("parts_within_bound"),
      col("approx_median_qty").cast("double").between(col("q49"), col("q51"))
        .as("median_within_bound"),
      col("approx_p95_qty").cast("double").between(col("p94"), col("p96"))
        .as("p95_within_bound"))
  }

  /** Persist one DISTINCT-COUNT SHARD: per-group Datasketches HLL
    * sketches (plus partial row counts) for one ingest wave / shard /
    * day of data, written as a small parquet artifact. This is the
    * persisted form of [[profile]]'s mergeable-summaries posture: the
    * sketch column is a `binary` Datasketches HllSketch, so later
    * arrivals append their own shard and ANY subset of shards answers
    * "distinct per group" by register-wise union — no rescan of data
    * already profiled, the incremental-analytics shape the postings /
    * IVF artifacts use for search. Artifact size is
    * O(groups × sketch size), independent of the wave's row count.
    *
    * A `shard<id>`-named artifact COMMITS to the shards root's live-set
    * manifest after its data lands (see [[writeShardArtifact]]): a
    * reader listing mid-write resolves the previous manifest and never
    * sees the half-written wave — including a foreachBatch REPLAY of an
    * already-committed wave, which lands under a fresh dir and flips
    * the manifest entry rather than overwriting the live dir in place.
    * Any other name is a standalone artifact addressed by explicit
    * path, outside the manifest. */
  def writeDistinctShard(wave: DataFrame, groupCol: String,
      distinctCol: String, path: String): Unit =
    withShardWriterLease(path, "writeDistinctShard") {
      writeShardArtifact(
        wave.groupBy(groupCol).agg(
          count(lit(1)).as("n_rows"),
          hll_sketch_agg(col(distinctCol)).as("sketch")),
        path)
    }

  /** Writer-side lease at the shards ROOT (the dir holding the
    * `shard<id>` artifacts), held for the wave write — the enforcement
    * twin of [[compactDistinctShards]]' maintenance lease: a wave
    * landing mid-compaction would be missed by the manifest swap, so
    * it refuses loudly instead, exactly the serving-table posture. */
  private def withShardWriterLease[T](shardPath: String,
      writer: String)(body: => T): T =
    graft.util.MaintenanceLease.withWriterLease(
      new org.apache.hadoop.fs.Path(shardPath).getParent.toString, writer)(body)

  /** Answer per-group totals + approximate distincts from persisted
    * [[writeDistinctShard]] artifacts alone: sum the partial counts,
    * union the sketches (`hll_union_agg` — register-wise max, the
    * order-insensitive merge), estimate once per group. Reads only the
    * artifacts — bytes ∝ groups × shards, never the profiled data. */
  def distinctFromShards(s: org.apache.spark.sql.SparkSession,
      shardPaths: Seq[String], groupCol: String): DataFrame =
    s.read.parquet(shardPaths: _*).groupBy(groupCol).agg(
      sum(col("n_rows")).as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_uniques"))

  /** [[distinctFromShards]] with its contract evaluated in-query
    * against a full scan of the same corpus (the verification harness,
    * not the production path — exactly [[profileChecked]]'s split):
    * `union_within_bound` pins the unioned estimate within ±5% of the
    * exact distinct (3σ for the default lgK=12 sketch, and exact by
    * construction while the sketch is still in sparse mode);
    * `union_eq_rebuild` pins shard-union ≡ rebuild on the SAME corpus —
    * the append-≡-rebuild gate the index artifacts use, here byte-free:
    * the final REGISTERS are a pure function of the value set (slot-wise
    * max), so any union over any shard split of the corpus estimates
    * identically, and a union fed wrong data diverges.
    *
    * The rebuild arm must itself go through a ≥2-input sketch UNION: a
    * directly-built sketch estimates via Datasketches' HIP accumulator,
    * which is UPDATE-PATH-dependent in dense mode (it tracks the insert
    * history, not just the registers), while a multi-input union is
    * flagged out-of-order and estimates from the registers alone. The
    * original one-pass `hll_sketch_agg` rebuild compared HIP against
    * composite — equal in sparse mode (both exact, which is all the
    * sf0.01 gate ever exercised) but ±1%-divergent once the sketches go
    * dense (caught at sf0.1, r19). Splitting the rebuild by a value
    * hash and unioning the halves puts both sides on the register
    * estimator, making the equality a property of the registers rather
    * than a topology accident. */
  def distinctShardsChecked(s: org.apache.spark.sql.SparkSession,
      shardPaths: Seq[String], full: DataFrame, groupCol: String,
      distinctCol: String): DataFrame = {
    val unioned = distinctFromShards(s, shardPaths, groupCol)
    val exact = full.groupBy(groupCol).agg(
      countDistinct(col(distinctCol)).as("exact_uniques"))
    val rebuild = full
      .withColumn("__h", pmod(xxhash64(col(distinctCol)), lit(2L)))
      .groupBy(col(groupCol), col("__h"))
      .agg(hll_sketch_agg(col(distinctCol)).as("__s"))
      .groupBy(groupCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("__s"))).as("__rebuild_est"))
    unioned.join(exact, groupCol).join(rebuild, groupCol).select(
      col(groupCol), col("n_rows"), col("exact_uniques"),
      (abs(col("approx_uniques").cast("double") -
        col("exact_uniques").cast("double")) <=
        lit(0.05) * col("exact_uniques").cast("double"))
        .as("union_within_bound"),
      (col("approx_uniques") === col("__rebuild_est"))
        .as("union_eq_rebuild"))
  }

  /** Persist one QUANTILE SHARD: per-group Datasketches KLL sketches
    * (plus partial row counts) for one ingest wave / shard / day of
    * data — the PERCENTILE sibling of [[writeDistinctShard]]'s HLL
    * contract. The sketch column is a binary KllDoublesSketch (one-pass,
    * O(k·log n) size, merge associative+commutative), so ANY subset of
    * shards answers "p99 so far" by sketch union — no rescan of data
    * already profiled. Artifact size is O(groups × sketch size),
    * independent of the wave's row count. */
  def writeQuantileShard(wave: DataFrame, groupCol: String, valueCol: String,
      path: String, k: Int = 200): Unit =
    withShardWriterLease(path, "writeQuantileShard") {
      writeShardArtifact(
        wave.groupBy(groupCol).agg(
          // count the VALUES the sketch profiles (non-NULL — the sketch
          // skips NULLs), not the rows: a count(*) here would break the
          // checked reader's N pin on the first NULL value (r18 review #5)
          count(col(valueCol)).as("n_rows"),
          graft.functions.HashFunctions
            .kll_sketch(col(valueCol).cast("double"), k).as("sketch")),
        path)
    }

  /** Answer per-group totals + approximate quantiles from persisted
    * [[writeQuantileShard]] artifacts alone: sum the partial counts,
    * union the sketches, read the requested ranks once per group.
    * Reads only the artifacts — bytes ∝ groups × shards, never the
    * profiled data. Output: groupCol, n_rows, sketch_n (the union
    * sketch's EXACT update count), approx_q<rank> per rank. */
  def quantilesFromShards(s: org.apache.spark.sql.SparkSession,
      shardPaths: Seq[String], groupCol: String,
      ranks: Seq[Double], k: Int = 200): DataFrame = {
    val merged = s.read.parquet(shardPaths: _*).groupBy(groupCol).agg(
      sum(col("n_rows")).as("n_rows"),
      graft.functions.HashFunctions
        .kll_merge_summary(col("sketch"), ranks, k).as("__s"))
    merged.select(Seq(col(groupCol), col("n_rows"),
      col("__s.n").as("sketch_n")) ++
      ranks.zipWithIndex.map { case (r, i) =>
        element_at(col("__s.quantiles"), i + 1)
          .as(s"approx_q${(r * 100).round}")
      }: _*)
  }

  /** [[quantilesFromShards]] with its contract evaluated in-query
    * against a full scan of the same corpus (the verification harness,
    * not the production path — [[profileChecked]]'s split): p50/p95
    * from the shard UNION and from a one-pass REBUILD must both land
    * inside the exact ±4-rank-point band (k=200's normalized rank
    * error is ~1.65% at 99% confidence — the band is far outside the
    * error model), and `union_n_eq_rebuild` pins the mergeability
    * invariant that IS exact: the union's total update count equals
    * the rebuild's equals the true row count (KLL compaction is
    * randomized, so byte equality — the HLL shards' register-wise
    * gate — is not a property of this sketch; N-equality plus
    * both-paths-in-band is its order-insensitive analogue). The exact
    * percentiles ride along rounded for the oracle. */
  def quantileShardsChecked(s: org.apache.spark.sql.SparkSession,
      shardPaths: Seq[String], full: DataFrame, groupCol: String,
      valueCol: String, k: Int = 200): DataFrame = {
    val ranks = Seq(0.5, 0.95)
    val v = col(valueCol).cast("double")
    val unioned = s.read.parquet(shardPaths: _*).groupBy(groupCol).agg(
      sum(col("n_rows")).as("n_rows"),
      graft.functions.HashFunctions
        .kll_merge_summary(col("sketch"), ranks, k).as("__u"))
    val exact = full.groupBy(groupCol).agg(
      // non-NULL values only, matching the shard writer and the sketch
      count(v).as("__exact_n"),
      percentile(v, lit(0.5)).as("__p50"),
      percentile(v, lit(0.95)).as("__p95"),
      percentile(v, lit(0.46)).as("__p46"),
      percentile(v, lit(0.54)).as("__p54"),
      percentile(v, lit(0.91)).as("__p91"),
      percentile(v, lit(0.99)).as("__p99"),
      graft.functions.HashFunctions.kll_values_summary(v, ranks, k)
        .as("__r"))
    // a group whose values are ALL NULL has an empty sketch (quantiles
    // array null) and NULL exact percentiles — its band comparison is
    // three-valued NULL, which would neither match the oracle's literal
    // TRUE nor read as a failure. There is nothing to bound for n == 0,
    // so the boolean is DEFINED as true there (r18 ADVICE)
    def inBand(q: Column, lo: Column, hi: Column): Column =
      when(col("__exact_n") === 0, lit(true)).otherwise(q.between(lo, hi))
    unioned.join(exact, groupCol).select(
      col(groupCol), col("n_rows"),
      round(col("__p50"), 6).as("exact_p50"),
      round(col("__p95"), 6).as("exact_p95"),
      (col("__u.n") === col("__exact_n") && col("__r.n") === col("__exact_n"))
        .as("union_n_eq_rebuild"),
      inBand(element_at(col("__u.quantiles"), 1), col("__p46"), col("__p54"))
        .as("p50_within_bound"),
      inBand(element_at(col("__u.quantiles"), 2), col("__p91"), col("__p99"))
        .as("p95_within_bound"),
      inBand(element_at(col("__r.quantiles"), 1), col("__p46"), col("__p54"))
        .as("rebuild_p50_within_bound"),
      inBand(element_at(col("__r.quantiles"), 2), col("__p91"), col("__p99"))
        .as("rebuild_p95_within_bound"))
  }

  private val ManifestPrefix = "_shards_manifest."

  /** Every stamp seq currently on disk — the ONE stamp-name scan the
    * resolver, the seq allocator, and the sweep all share (a parse
    * rule diverging between them would silently break resolution or
    * leak stale stamps). */
  private def stampSeqs(shardsDir: String): Seq[Long] =
    graft.util.Fs.listChildren(shardsDir).collect {
      case (name, false) if name.startsWith(ManifestPrefix) =>
        name.stripPrefix(ManifestPrefix).toLongOption
    }.flatten

  /** The live shard set under `shardsDir`, resolved through the
    * VALUE-STAMPED manifest (`_shards_manifest.<seq>` — highest seq
    * wins, the `_changefeed_horizon` posture: a new stamp INSTALLS by
    * rename and is written before stale ones are swept, so a reader
    * always sees a complete stamp, never a truncation window). Entries
    * are `(id, dirname)` lines ordered here by NUMERIC id. None if no
    * stamp exists (a pre-manifest layout). List-then-read races the
    * sweep (a commit can delete the stamp this listing chose before
    * the read lands), so a vanished stamp re-resolves rather than
    * crashing a consistent reader. */
  private def shardManifest(shardsDir: String): Option[Seq[(Long, String)]] = {
    var attempts = 3
    while (true) {
      stampSeqs(shardsDir).maxOption match {
        case None => return None
        case Some(seq) =>
          try {
            return Some(graft.util.Fs
              .readLines(s"$shardsDir/$ManifestPrefix$seq")
              .filter(_.nonEmpty).map { l =>
                val Array(id, dir) = l.split(" ", 2)
                (id.toLong, dir)
              }.sortBy(_._1))
          } catch {
            case e: java.io.FileNotFoundException =>
              // swept between the listing and the read — a NEWER stamp
              // exists by the sweep's ordering; re-resolve (bounded:
              // each retry needs a whole concurrent commit to land in
              // the window, so 3 misses means something else is wrong)
              attempts -= 1
              if (attempts <= 0) throw e
          }
      }
    }
    None // unreachable
  }

  /** `shard<id>` dirs directly under `shardsDir` by LISTING — the
    * pre-manifest resolution, kept as the fallback for layouts whose
    * writers predate the manifest (the first manifest commit migrates
    * them). Prefix REQUIRED before stripping: stripPrefix is a no-op
    * on a non-matching name, so a digits-only stranger dir would
    * parse. */
  private def listedShards(shardsDir: String): Seq[(Long, String)] =
    graft.util.Fs.listChildren(shardsDir).flatMap { case (name, isDir) =>
      if (isDir && name.startsWith("shard"))
        name.stripPrefix("shard").toLongOption.map(id => (id, name))
      else None
    }.sortBy(_._1)

  /** The current (id, dirname) shard set: the manifest when one exists,
    * the dir listing otherwise. */
  private def shardEntries(shardsDir: String): Seq[(Long, String)] =
    shardManifest(shardsDir).getOrElse(listedShards(shardsDir))

  private def nextManifestSeq(shardsDir: String): Long =
    stampSeqs(shardsDir).maxOption.getOrElse(-1L) + 1L

  /** Install a new manifest stamp naming `entries` as the live set:
    * the stamp body assembles under a dot-prefixed temp name and
    * RENAMES into place (a direct create would be visible ZERO-LENGTH
    * on local/HDFS before its body lands — a reader picking it as the
    * max stamp would resolve an empty live set; r20 review #2), then
    * stale stamps sweep — a reader can never observe zero stamps once
    * one exists, and always reads a COMPLETE set (the consistent-
    * reader guarantee the r19 verdict named as the artifact family's
    * one remaining silent-wrong-answer window: a reader listing
    * `shards/` mid-compaction or mid-wave-landing could see a partial
    * or double set). Writers and compaction are serialized by the
    * lease, so stamps never race each other. */
  private def commitShardManifest(shardsDir: String,
      entries: Seq[(Long, String)]): Unit = {
    import graft.util.Fs
    val seq = nextManifestSeq(shardsDir)
    val tmp = s"$shardsDir/.tmp-manifest-$seq"
    Fs.deleteIfExists(tmp)
    Fs.writeString(tmp,
      entries.sortBy(_._1).map { case (id, d) => s"$id $d" }
        .mkString("", "\n", "\n"))
    Fs.move(tmp, s"$shardsDir/$ManifestPrefix$seq")
    stampSeqs(shardsDir).filter(_ < seq).foreach(old =>
      Fs.deleteIfExists(s"$shardsDir/$ManifestPrefix$old"))
  }

  /** Land one wave artifact at `path` under the live-set manifest,
    * commit included. FIRST landing of a `shard<id>` writes the
    * caller's dir directly — invisible until the manifest commit (the
    * current set is the manifest, or — first commit on a pre-manifest
    * layout — the dir listing, which migrates it). A REPLAY of an
    * already-listed wave lands under a FRESH `.r<seq>`-suffixed dir
    * and FLIPS the manifest entry: an in-place overwrite would empty
    * the live dir mid-rewrite, and a concurrent reader resolving the
    * still-current manifest would silently read the union MINUS that
    * wave (r20 review #2 — the exact window the manifest exists to
    * close); the superseded dir deletes only after the flip, so a
    * reader mid-scan fails loudly and re-resolves (the compaction
    * posture). A wave id already owned by a MERGED artifact refuses:
    * replacing the merge's entry would silently drop every other
    * compacted wave from the live set (the stopped-writer-window
    * compaction precondition, made loud). Non-`shard<id>` names are
    * standalone artifacts read by explicit path; they never enter a
    * manifest. */
  private def writeShardArtifact(df: DataFrame, path: String): Unit = {
    import graft.util.Fs
    val p = new org.apache.hadoop.fs.Path(path)
    val name = p.getName
    val idOpt =
      if (name.startsWith("shard")) name.stripPrefix("shard").toLongOption
      else None
    idOpt match {
      case None =>
        df.coalesce(1).write.mode("overwrite").parquet(path)
      case Some(id) =>
        val root = p.getParent.toString
        val entries = shardEntries(root)
        val existing = entries.find(_._1 == id)
        existing.filterNot(_._2.startsWith(name)).foreach { e =>
          throw new IllegalArgumentException(
            s"writeShard: wave id $id already lives in ${e._2} — a wave " +
              "replayed after a compaction that merged it; committing " +
              s"$name would replace the merge (and every wave inside " +
              "it) in the live set. Run compaction only with the " +
              "stream's checkpoint committed through its max wave")
        }
        val dirname =
          if (existing.isEmpty) name
          else s"$name.r${nextManifestSeq(root)}"
        df.coalesce(1).write.mode("overwrite").parquet(s"$root/$dirname")
        commitShardManifest(root,
          entries.filterNot(_._1 == id) :+ ((id, dirname)))
        existing.foreach { case (_, old) => Fs.rmTree(s"$root/$old") }
    }
  }

  /** Every live shard artifact dir under `shardsDir`, ordered by
    * NUMERIC batch id — resolved through the live-set MANIFEST when one
    * exists (writers commit each wave to it, compaction swaps it), so a
    * reader racing a wave landing or a compaction always resolves a
    * CONSISTENT pre- or post-set; dirs the manifest does not list
    * (half-written waves, a compaction's staged merge, post-swap
    * garbage) are invisible. Falls back to the dir listing on a
    * pre-manifest layout. */
  def shardPaths(shardsDir: String): Seq[String] =
    shardEntries(shardsDir).map { case (_, d) => s"$shardsDir/$d" }

  /** COMPACT the HLL distinct-count shards under `shardsDir` into ONE
    * artifact — the retention pass the shard family needs on a
    * long-running stream (one `shard<batchId>` dir accrues per arrival
    * wave forever otherwise: the small-files problem the postings
    * compaction solves, here for profiling artifacts). Per-group
    * partial counts SUM and sketches UNION register-wise, so the
    * compacted shard answers every later [[distinctFromShards]] read
    * identically — HLL union is associative, the merged registers are
    * byte-identical to any other merge order — and stays APPENDABLE:
    * later waves union against it like any other shard.
    *
    * The compacted artifact keeps the MAX shard ID in the manifest (the
    * [[graft.streaming]] serving-compaction convention): the stream's
    * next batch id exceeds it, so wave numbering continues unchanged.
    * PRECONDITION, same as compactServing: run in a stopped-writer
    * window with the checkpoint committed through the max wave — a
    * foreachBatch REPLAY of a compacted wave afterwards would
    * double-count (a lower-id wave re-enters the manifest beside the
    * merge that already contains it) or, for the max-id wave, try to
    * REPLACE the merge's manifest entry — that one the commit refuses
    * loudly, since it would silently drop every other compacted wave
    * from the live set.
    *
    * Crash protocol (MANIFEST-SWAPPED — the serving table's posture
    * scaled down, replacing the r19 parked-dir protocol; every reader
    * RESOLVES a consistent set at every instant — a reader whose scan
    * of the pre-set is still in flight when the post-swap deletes land
    * fails LOUDLY on the vanished files and re-resolves, never reads a
    * partial set silently; the r19 verdict's #1): the merged
    * artifact stages in `.tmp-compact-shards` while every old dir is
    * intact (the write executes the multi-shard read), installs under
    * a FRESH seq-named `merged<seq>` dir — invisible, the manifest
    * does not list it — and then ONE value-stamped manifest commit flips the
    * live set from the old shards to the merge: both sets are fully on
    * disk at the flip, so a reader resolving either stamp reads a
    * complete, consistent set. Only after the swap do the old dirs
    * (now unreferenced garbage) delete. A crash anywhere leaves a
    * readable layout: before the swap the old manifest still governs
    * (the staged/installed merge is invisible; the next run sweeps
    * unreferenced dirs and redoes the merge), after it the new one
    * does (undeleted old dirs are garbage the next run sweeps).
    * Nothing is ever displaced-then-restored, so this pass parks
    * nothing and [[graft.util.MaintenanceLease.recover]] has nothing
    * to do beyond releasing; the legacy `shards_old_compact` park (a
    * crash under the pre-manifest binary) still refuses a fresh run
    * until recovered. The whole pass runs under the maintenance
    * lease. */
  def compactDistinctShards(s: org.apache.spark.sql.SparkSession,
      shardsDir: String, groupCol: String): Unit =
    compactDistinctShardsHooked(s, shardsDir, groupCol)

  /** [[compactDistinctShards]] with interleaving hooks (test-only — the
    * LeaseRaceSpec posture): `afterInstall` fires with the merge
    * installed but the manifest not yet swapped, `afterSwap` with the
    * manifest swapped but the old dirs not yet deleted — the two
    * windows a concurrent reader must stay consistent through. */
  private[graft] def compactDistinctShardsHooked(
      s: org.apache.spark.sql.SparkSession, shardsDir: String,
      groupCol: String, afterInstall: () => Unit = () => (),
      afterSwap: () => Unit = () => ()): Unit =
    compactShardsWith(s, shardsDir, afterInstall, afterSwap)(
      _.groupBy(groupCol).agg(
        sum(col("n_rows")).as("n_rows"),
        hll_union_agg(col("sketch")).as("sketch")))

  /** [[compactDistinctShards]] for the KLL quantile shards: partial
    * counts sum, sketches merge via [[graft.functions.KllMergeSketchAgg]]
    * back into ONE binary sketch per group. KLL merge is exact in the
    * update count N — the union-N pin is unchanged through a
    * compaction — and the ±rank-band contract absorbs its randomized
    * compaction (byte equality was never the KLL gate). Same id
    * convention, stopped-writer precondition, crash protocol, and
    * lease as the HLL pass. */
  def compactQuantileShards(s: org.apache.spark.sql.SparkSession,
      shardsDir: String, groupCol: String, k: Int = 200): Unit =
    compactQuantileShardsHooked(s, shardsDir, groupCol, k)

  /** [[compactQuantileShards]] with interleaving hooks (test-only —
    * see [[compactDistinctShardsHooked]]). */
  private[graft] def compactQuantileShardsHooked(
      s: org.apache.spark.sql.SparkSession, shardsDir: String,
      groupCol: String, k: Int = 200, afterInstall: () => Unit = () => (),
      afterSwap: () => Unit = () => ()): Unit =
    compactShardsWith(s, shardsDir, afterInstall, afterSwap)(
      _.groupBy(groupCol).agg(
        sum(col("n_rows")).as("n_rows"),
        graft.functions.HashFunctions
          .kll_merge_sketch(col("sketch"), k).as("sketch")))

  /** The legacy (pre-manifest) compaction park's install marker —
    * produced by no current shard pass, still recognized by
    * [[graft.util.MaintenanceLease.recover]]'s marker-keyed rule for
    * layouts that crashed under the r19 binary. ONE definition: the
    * delete passes' seal-and-dismantle teardown writes the same name,
    * and recovery keys on it — a diverging copy here would turn
    * install-landed parks into wholesale restores (r20 review #5). */
  private[graft] val InstallCompleteMarker: String =
    graft.util.MaintenanceLease.ParkInstallMarker

  /** Does `name` match a shard-family artifact dir this module itself
    * names (`shard<id>` waves, their `.r<seq>` replay variants,
    * `merged<seq>` compaction outputs)? Anything else — stranger dirs,
    * standalone artifacts — is never swept. */
  private def isShardArtifactName(name: String): Boolean = {
    def num(s: String) = s.nonEmpty && s.forall(_.isDigit)
    val shardRest = name.stripPrefix("shard")
    val wave = name.startsWith("shard") && (num(shardRest) || {
      val i = shardRest.indexOf(".r")
      i > 0 && num(shardRest.take(i)) && num(shardRest.drop(i + 2))
    })
    wave ||
      (name.startsWith("merged") && num(name.stripPrefix("merged")))
  }

  private def compactShardsWith(s: org.apache.spark.sql.SparkSession,
      shardsDir: String, afterInstall: () => Unit,
      afterSwap: () => Unit)(merge: DataFrame => DataFrame): Unit = {
    import graft.util.Fs
    // legacy parked-dir precondition BEFORE the lease (the index
    // deletes' posture): a refusal-to-start must not strand a fresh
    // marker on top of the crash signal it reports
    val parked = s"$shardsDir/shards_old_compact"
    require(!Fs.exists(parked),
      s"$parked exists — a pre-manifest compaction crashed mid-swap; " +
        "run MaintenanceLease.recover (marker-keyed: a park containing " +
        s"$InstallCompleteMarker deletes, one without restores), then retry")
    graft.util.MaintenanceLease.withLease(shardsDir, "compactShards") {
      // sweep garbage a crashed prior run left — shard-family dirs the
      // manifest does not reference (old shards a post-swap crash never
      // deleted, an installed merge whose swap never landed). Safe
      // under the lease: no writer is mid-commit (a crashed writer's
      // marker blocks this acquisition; a FAILED writer's un-committed
      // dir is rebuilt by its replay). Only when a manifest exists —
      // on a pre-manifest layout the listing IS the live set.
      shardManifest(shardsDir).foreach { entries =>
        val live = entries.map(_._2).toSet
        Fs.listChildren(shardsDir).foreach {
          case (name, true)
            if isShardArtifactName(name) && !live.contains(name) =>
            Fs.rmTree(s"$shardsDir/$name")
          case _ => ()
        }
      }
      // the shard set resolves INSIDE the lease — a wave committed in
      // the acquire gap would be dropped from the swapped manifest
      // without being merged
      val entries = shardEntries(shardsDir)
      if (entries.size > 1) {
        val maxId = entries.map(_._1).max
        // named by the strictly-increasing manifest SEQ, not by maxId:
        // a live merge keeps its maxId across later compactions (a
        // replayed old wave can re-enter at a lower id), so an id-named
        // dir could collide with the LIVE merge it is about to replace
        // — seq-named dirs collide at most with swept garbage
        val merged = s"merged${nextManifestSeq(shardsDir)}"
        val tmp = s"$shardsDir/.tmp-compact-shards"
        Fs.rmTree(tmp)
        // the write EXECUTES the multi-shard read — old dirs stay
        // intact until it finishes; artifact size is O(groups), one file
        merge(s.read.parquet(entries.map { case (_, d) => s"$shardsDir/$d" }: _*))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        // install under a FRESH name (never a live one — `merged<id>`
        // collides at most with swept garbage): invisible until the swap
        Fs.rmTree(s"$shardsDir/$merged")
        Fs.move(tmp, s"$shardsDir/$merged")
        afterInstall()
        // THE commit point: one value-stamped manifest write flips the
        // live set — both sets fully on disk, readers consistent either
        // side of it (atomic everywhere: a small-object write, no
        // directory rename in the visibility path)
        commitShardManifest(shardsDir, Seq((maxId, merged)))
        afterSwap()
        // old dirs are unreferenced garbage now; a crash mid-delete
        // leaves some for the next run's sweep
        entries.foreach { case (_, d) => Fs.rmTree(s"$shardsDir/$d") }
      }
    }
  }

  /** Misra-Gries heavy hitters over an item column
    * ([[graft.functions.MisraGriesAgg]]): at most `capacity` counters per
    * aggregation buffer, whatever the item cardinality — the
    * frequent-items profile when the exact groupBy's key space is the
    * problem (raw shingles, URLs, user ids at 100 TB). One row per
    * surviving item with its (under-)estimate; guarantees (any merge
    * order): `true − n/(capacity+1) ≤ est_count ≤ true`, and every item
    * with `true > n/(capacity+1)` survives.
    *
    * 100 TB shape: a single partial-aggregated pass — each task carries
    * one ≤ capacity-entry map and ships one compact summary, the
    * mergeable-summaries posture of [[profile]]'s HLL++. With
    * `capacity ≥ |distinct|` the sketch degenerates to EXACT counts
    * (nothing is ever evicted), which is what makes q91 oracle-comparable
    * while SketchesSpec pins the compressed regime's bounds. */
  def heavyHitters(items: DataFrame, column: String, capacity: Int): DataFrame =
    items.agg(graft.functions.HashFunctions.misra_gries(col(column), capacity).as("__hh"))
      .select(explode(col("__hh")).as("h"))
      .select(col("h.item").as("item"), col("h.est").as("est_count"))
}
