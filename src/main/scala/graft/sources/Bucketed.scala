package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink — the co-location primitive for repeated large-×-large
  * joins at 100 TB. Writing both sides bucketed (and sorted) on the join key
  * pins their physical layout to the same hash partitioning, so every later
  * join on that key plans WITHOUT an Exchange on either side (and without a
  * Sort when `sortCols` covers the key): the per-query shuffle cost of a fact
  * ↔ fact join is paid ONCE at write time and amortized across every
  * downstream query — the difference between re-shuffling 100 TB per join
  * and streaming co-located buckets.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable` — plain
  * parquet data source tables, no Hive dependency), which is what lets the
  * planner trust the layout; a bare `.parquet(path)` write cannot record it.
  * `numBuckets` sizes the parallel read: pick buckets ≈ cluster cores ×
  * small multiple, with per-bucket files comfortably over the HDFS block
  * size at the target scale.
  */
object Bucketed {

  /** Write `df` as a bucketed (+ optionally bucket-sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (the layout travels via the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Hive-style partitioned parquet layout (`path/col=value/...`) — the
    * other write-time layout lever: a filter on the partition column prunes
    * whole directories at PLANNING time (`PartitionFilters` in the scan,
    * zero I/O for excluded partitions), where bucketing co-locates join
    * keys WITHIN files. Partition by low-cardinality selection columns
    * (language, date, source); high-cardinality keys belong in bucketing —
    * a directory per key would drown the filesystem in small files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitioned write needs at least one partition column")
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }

  /** Z-ORDER (Morton-curve) layout — the third write-time lever, for
    * MULTI-column range predicates where partitioning (one low-cardinality
    * column) and bucketing (equi-join keys) don't fit: rows sort by the
    * bit-interleaving of their columns' quantile-bucket ranks, so rows close
    * in EVERY z-column cluster into the same files/row-groups and a
    * predicate on ANY subset of them skips most row-groups via parquet
    * min/max stats. A plain sort clusters only its leading column — the
    * trailing columns' per-file spans stay ~100% (ZOrderSpec measures
    * exactly this against the z-ordered layout).
    *
    * Normalization is quantile-based (Delta/Iceberg practice): 2^bits − 1
    * cut points per column from one `approxQuantile` pass (driver-held,
    * ~KBs — embedded as literals, no broadcast state), so skewed columns
    * still spread across the full bucket range. Per row the bucket is a
    * codegen'd count-of-bounds-below fold; the z-key is a pure bit
    * interleave. One range repartition + in-partition sort writes the
    * layout — the same shuffle a plain global sort would pay. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, outFiles: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs at least two columns (use a plain sort for one)")
    require(bits >= 1 && bits * zCols.size <= 63, s"bits * nCols must fit a long, got $bits × ${zCols.size}")
    val n = 1 << bits
    val buckets = zCols.map { c =>
      val cuts = df.stat.approxQuantile(c, (1 until n).map(_.toDouble / n).toArray, 0.001)
        .distinct // repeated quantiles on skewed data would double-count a bound
      val bounds = array(cuts.map(lit): _*)
      val raw = aggregate(transform(bounds, b => (col(c) > b).cast("long")), lit(0L), _ + _)
      // rescale to the FULL bit range: a low-cardinality column yields few
      // distinct cuts, and an unscaled 0..m bucket would leave the HIGH
      // interleave bits constant — the file split (top z bits) would then
      // cluster only the high-cardinality columns. Integer-exact for these
      // magnitudes; order-preserving.
      if (cuts.isEmpty) lit(0L) else floor(raw * (n - 1) / cuts.length).cast("long")
    }
    val zkey = (0 until bits).foldLeft(lit(0L)) { (acc, bit) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (bc, ci)) =>
        a.bitwiseOR(shiftleft(
          shiftright(bc, bit).bitwiseAND(lit(1L)), bit * zCols.size + ci))
      }
    }
    df.withColumn("__z", zkey)
      .repartitionByRange(outFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Measurement end of [[writeZOrdered]]'s promise: execute `df` and read
    * the parquet scan's own metrics — (rows surfaced by the scan, files
    * touched). Vanilla Spark prunes parquet at ROW-GROUP granularity (the
    * reader drops row groups whose min/max stats exclude the pushed
    * predicate; file-level pruning needs a stats catalog like Delta's), so
    * "rows surfaced" is the I/O-skip number: on a z-ordered layout a range
    * predicate on ANY z-column leaves most row groups skipped, while a
    * plain sort skips only on its leading column. */
  def scanStats(df: DataFrame): (Long, Long) = scanStats(df, _ => true)

  /** As [[scanStats]], restricted to scans whose root paths satisfy
    * `pathFilter` — for plans that read several tables (e.g. an IVF probe
    * scans centroids + queries + cells) where the skipping claim concerns
    * one of them. */
  def scanStats(df: DataFrame, pathFilter: String => Boolean): (Long, Long) = {
    df.collect()
    // AQE wraps the executed tree (AdaptiveSparkPlanExec) and materialized
    // stages (QueryStageExec) are leaf nodes — both hide their subtrees
    // from TreeNode.collect, so recurse through them explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      }.flatten
    val found = scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(p => pathFilter(p.toString)))
    require(found.nonEmpty, "no matching parquet scan in the plan — scanStats needs a file-backed df")
    (found.map(_.metrics("numOutputRows").value).sum,
      found.map(_.metrics("numFiles").value).sum)
  }
}
