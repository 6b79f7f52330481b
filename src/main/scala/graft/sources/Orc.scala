package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar interchange format next to parquet
  * (Hive-ecosystem corpora and older warehouse exports ship as ORC). Unlike
  * the text formats ([[Csv]], [[Jsonl]]) the file is self-describing and
  * columnar, so no schema is declared: the footer carries types, reads prune
  * columns, and predicates push down to stripe/row-group skipping exactly as
  * with parquet (OrcPipelineSpec pins PushedFilters + ReadSchema).
  *
  * Scale notes: splittable by stripe regardless of compression (zlib/zstd
  * compress per-stream inside the stripe), so one 100 TB corpus fans out to
  * one task per stripe range with no gzip whole-file caveat. Bloom filters
  * (`bloomFilterColumns`) buy point-lookup stripe skipping on high-cardinality
  * keys — the right sink option for a corpus keyed by doc_id/content hash. */
object Orc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** `bloomFilterColumns`: comma-separated column names to bloom-index at
    * write time (stripe skipping for equality probes on those columns). */
  def write(df: DataFrame, path: String, bloomFilterColumns: Seq[String] = Nil,
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (bloomFilterColumns.nonEmpty)
      w.option("orc.bloom.filter.columns", bloomFilterColumns.mkString(","))
    else w).orc(path)
  }
}
