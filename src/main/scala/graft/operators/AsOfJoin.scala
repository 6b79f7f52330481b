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
}
