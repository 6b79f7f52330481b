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

  /** Exactly k rows per stratum, chosen by deterministic md5 order with the
    * key as tiebreak. Spark plans this as WindowGroupLimit: only k rows per
    * stratum survive to the final sort — no full-stratum materialization. */
  def stratifiedSample(df: DataFrame, stratum: String, key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
