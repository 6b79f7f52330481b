package graft.operators

import org.apache.spark.sql.DataFrame
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
}
