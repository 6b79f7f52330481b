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
}
