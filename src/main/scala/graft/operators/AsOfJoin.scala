package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the LATEST right row
  * with the same key and right time <= left time (inclusive).
  *
  * Spark-first formulation — no join operator at all: tag and union the two
  * sides, hash-partition by key once, sort by (time, tag) so a right row at
  * the exact left timestamp sorts first, and carry the payload forward with
  * last(ignoreNulls) over a running ROW frame. Cost is ONE shuffle of
  * (key, time, payload) — compare a range join's quadratic bucket blow-up or
  * a custom SparkStrategy, neither of which is needed.
  *
  * Right rows must be unique per (key, time) — pre-aggregate otherwise
  * (e.g. max_by) or the carried payload is pick-any among equals.
  */
object AsOfJoin {

  /** @param left       driving rows; all its columns survive
    * @param right      lookup rows: key, time, payload columns
    * @param leftKey    join key column name on the left
    * @param leftTime   event-time column name on the left (any orderable type;
    *                   must be comparable with rightTime's type)
    * @param rightKey   join key column name on the right
    * @param rightTime  effective-time column name on the right
    * @param payload    right columns to attach (null when no right row yet)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      payload: Seq[String]): DataFrame = {

    val leftStruct = struct(left.columns.map(col): _*)
    val payloadStruct = struct(payload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftType = left.select(leftStruct).schema.head.dataType

    val taggedLeft = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__tag"),
      leftStruct.as("__l"), lit(null).cast(payloadType).as("__p"))
    // SQL join semantics: a right row with a NULL key or time can never
    // match (it would otherwise sort nulls-first and leak its payload into
    // every row of the partition).
    val taggedRight = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__tag"),
        lit(null).cast(leftType).as("__l"), payloadStruct.as("__p"))

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("__asof", last("__p", ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val payloadCols = payload.map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.select(leftCols ++ payloadCols: _*)
  }

  /** Interval join: every (left, right) pair with equal keys whose times lie
    * within `tolerance` of each other (|lt − rt| <= tolerance, inclusive) —
    * the batch form of a Flink-style interval join, for enrichment where
    * "nearest in time" ([[asOf]]) is too strict and "same key ever" explodes.
    *
    * Spark-first formulation: writing the raw `abs(lt − rt) <= d` next to the
    * key equality makes Catalyst keep the time predicate as a post-join
    * filter on the key-equi join — a per-key cartesian that dies on hot keys.
    * Bucketize instead: right rows land in bucket rt div d; any left partner
    * within d sits in lt div d ± 1, so the left side explodes to its three
    * candidate buckets and the join is a pure EQUI-join on (key, bucket) with
    * the exact |Δt| filter applied to candidates only. Cost: 3× left
    * replication (one extra long per row) + one shuffle per side; candidate
    * volume tracks rows per (key, time-bucket), never rows per key.
    *
    * Times must be non-negative integral (bucket math uses floor division;
    * both engines agree there only for non-negatives). Right payload columns
    * come back prefixed `right_`. Self-joins: pass the same frame twice and
    * filter self-pairs downstream. */
  def interval(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      tolerance: Long, payload: Seq[String]): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    // integral `div`, not `/`: double division drops low bits past 2^53 —
    // nanosecond epochs (~1.8e18) would mis-bucket at exactly the boundaries
    // the equi-join depends on
    // null-key/time rows can never match — drop them BEFORE the 3× bucket
    // explode (symmetric with the right side; without this they triple and
    // shuffle only for the join condition to discard them)
    val lb = left
      .filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .withColumn("__lb",
        explode(array(Seq(-1L, 0L, 1L).map(off =>
          expr(s"CAST(`$leftTime` AS BIGINT) div ${tolerance}L") + off): _*)))
    val rb = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__rk") +: col(rightTime).cast("long").as("__rt") +:
        payload.map(c => col(c).as(s"right_$c")): _*)
      .withColumn("__rb", expr(s"__rt div ${tolerance}L"))
    lb.join(rb,
        col(leftKey) === col("__rk") && col("__lb") === col("__rb") &&
          abs(col(leftTime).cast("long") - col("__rt")) <= tolerance)
      .drop("__lb", "__rk", "__rt", "__rb")
  }
}
