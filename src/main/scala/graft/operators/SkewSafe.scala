package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe alternative to whole-partition window aggregates.
  *
  * `sum(x) OVER (PARTITION BY k)` plans as WindowExec: every row of a
  * partition lands in ONE task and gets sorted there. A hot key (think 40%
  * of 100 TB sharing one `k`) makes that task the job — and AQE cannot split
  * a window sort. For frame-less, order-free aggregates the same result is
  * a groupBy + join-back:
  *
  *  - the groupBy side condenses map-side (partial aggregation), so the hot
  *    key arrives at its reducer as one row per upstream task, not raw rows;
  *  - the join back is a plain equi-join, which AQE's skew-join handling CAN
  *    split into multiple tasks;
  *  - no sort anywhere.
  *
  * Only valid for aggregates that ignore order and frame (the engine's
  * ACCUMULATE with no order clause, counts, min/max, avg). Running
  * (ordered) aggregates are inherently sequential per partition and must
  * keep the window form — salt upstream if they skew.
  */
object SkewSafe {

  /** Attach whole-partition aggregate values to every row, window-free.
    * `aggs` are (alias, aggregate-expression) pairs evaluated per key group,
    * e.g. `Seq("total_qty" -> sum(col("l_quantity")))`.
    * Joins back with null-safe equality, so NULL-keyed rows form their own
    * group and survive — matching `agg OVER (PARTITION BY k)` semantics. */
  def partitionAgg(df: DataFrame, keys: Seq[String], aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val totals = df.groupBy(keys.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
      // rename keys so the join condition can reference both sides
      .select(keys.map(k => col(k).as(s"__$k")) ++ aggs.map(a => col(a._1)): _*)
    val cond = keys.map(k => df(k) <=> col(s"__$k")).reduce(_ && _)
    df.join(totals, cond).drop(keys.map(k => s"__$k"): _*)
  }
}
