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

  /** Two-phase RUNNING sum (ACCUMULATE) for skewed ordered windows — the
    * utility behind the engine scaladoc's "pre-salt upstream" guidance
    * (engine.scala): a running aggregate is inherently sequential per
    * partition, so a hot key serializes into one sorted task. Splitting the
    * partition into order-aligned CHUNKS restores parallelism:
    *
    *  1. local running sum within (keys, chunk) — the shuffle+sort is keyed
    *     by (keys, chunk), so the hot key spreads over its chunks;
    *  2. per-chunk totals (map-side combined, tiny);
    *  3. per-chunk OFFSET = running total of strictly-prior chunks (a window
    *     over one row per chunk — negligible);
    *  4. equi-join the offset back on (keys, chunk) and add.
    *
    * Contract: `chunkCol` must be a NON-DECREASING function of the order
    * key(s) within each partition (e.g. a coarse time bucket when ordering
    * by time) — equal order keys must share a chunk, or cross-chunk peers
    * would break the default RANGE frame's tie semantics. Result is cast to
    * the value column's type, matching ACCUMULATE's declared output.
    * Property-tested equal to the unsalted engine ACCUMULATE. */
  def saltedAccumulate(
      df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      chunkCol: String, valueCol: String, alias: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val valueType = df.schema(valueCol).dataType
    val localW = Window.partitionBy((keys :+ chunkCol).map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val withLocal = df.withColumn(alias, sum(col(valueCol)).over(localW))
    val totals = df.groupBy((keys :+ chunkCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__chunk_total"))
    val chunkW = Window.partitionBy(keys.map(col): _*).orderBy(col(chunkCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__offset", sum(col("__chunk_total")).over(chunkW))
      .select((keys :+ chunkCol).map(k => col(k).as(s"__$k")) :+ col("__offset"): _*)
    val cond = (keys :+ chunkCol).map(k => withLocal(k) <=> col(s"__$k")).reduce(_ && _)
    // NULL semantics must match windowed SUM: the running value is NULL only
    // while the WHOLE prefix (local chunk AND all prior chunks) is null-free
    // of values — a null local sum with a non-null offset means the current
    // chunk's prefix is all-NULL but prior chunks contributed, so the total
    // is the offset, not NULL.
    withLocal.join(offsets, cond)
      .withColumn(alias,
        when(col(alias).isNull && col("__offset").isNull, lit(null))
          .otherwise(coalesce(col(alias), lit(0)) + coalesce(col("__offset"), lit(0)))
          .cast(valueType))
      .drop((keys :+ chunkCol).map(k => s"__$k") :+ "__offset": _*)
  }

  /** Salted equi-join for a skewed FACT key against a dim table too large
    * to broadcast: the fact side salts each row into one of `saltBuckets`
    * sub-keys (deterministic hash of `saltSource`, so reruns place rows
    * identically), the dim side replicates each row across ALL buckets,
    * and the join runs on (key, salt) — a hot fact key spreads over
    * `saltBuckets` reducers instead of serializing into one.
    *
    * Semantically identical to `fact.join(dim, key)` (inner); the salt
    * never survives into the output. Cost: dim shuffles ×`saltBuckets` —
    * worth it exactly when the hot key's single-task time exceeds the
    * replicated dim shuffle. AQE's skew-join split handles MODERATE skew
    * without any of this; explicit salting is for the pathological key
    * (think 40% of 100 TB on one key) where even a split task inherits the
    * whole build side, and for engines/joins AQE won't split (e.g. the
    * build side of a shuffled hash join, or pre-AQE checkpoints).
    *
    * `dim` must carry the join key under the SAME name as `fact`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 8, saltSource: String = null): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val src = if (saltSource == null) key else saltSource
    val fs = fact.withColumn("__salt",
      pmod(xxhash64(col(src)), lit(saltBuckets)).cast("int"))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }
}
