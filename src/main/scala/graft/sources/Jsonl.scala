package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines source/sink — the de-facto interchange format for LLM training
  * corpora (one document object per line; WebText/C4/RedPajama-style dumps
  * all ship this way). Schema is declared, not inferred, for the same
  * reasons as [[Csv]]: inference double-reads the data, which is wrong at
  * scale, and a corpus contract should be explicit.
  *
  * Corrupt lines (truncated uploads, interleaved logging) are the norm in
  * crawled corpora, so neither read mode fails the job (FAILFAST kills a
  * 100 TB job for one bad line): [[read]] drops malformed lines
  * (DROPMALFORMED — the scan-level equivalent of filtering the corrupt
  * column, which Spark disallows as a standalone pruned query,
  * QUERY_ONLY_CORRUPT_RECORD_COLUMN), and auditable pipelines use
  * [[readWithCorrupt]] (PERMISSIVE) to split clean rows from quarantined
  * ones in one pass instead of silently changing row counts.
  *
  * Scale notes: JSONL is splittable when uncompressed or zstd/bzip2-framed
  * (one task per input split, like CSV); gzip'd shards read whole-file —
  * shard the corpus at write time (maxRecordsPerFile) rather than relying
  * on post-hoc splitting. */
object Jsonl {

  val corruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Clean rows plus a `_corrupt_record` column holding the raw line for
    * rows that failed to parse (null for clean rows). */
  def readWithCorrupt(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"declared schema must not contain $corruptCol; it is added by the reader")
    spark.read
      .schema(schema.add(StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  def write(df: DataFrame, path: String, maxRecordsPerFile: Long = 0L): Unit =
    df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .json(path)
}
