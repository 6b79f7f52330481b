package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("sketch profile stays within error bounds of the exact answers") {
    val li = Tables.lineitem(spark, dir)
    val approx = Sketches.profile(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val exact = li.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      countDistinct(col("l_orderkey")).as("orders"),
      countDistinct(col("l_partkey")).as("parts"),
      percentile(col("l_quantity"), lit(0.5)).as("median"),
      percentile(col("l_quantity"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap

    for ((flag, (n, orders, parts, median, p95)) <- exact) {
      val (aN, aOrders, aParts, aMedian, aP95) = approx(flag)
      assert(aN == n, s"$flag n_rows is exact")
      // HLL++ default rsd = 5%; allow 3 sigma
      assert(math.abs(aOrders - orders).toDouble / orders < 0.15, s"$flag orders")
      assert(math.abs(aParts - parts).toDouble / parts < 0.15, s"$flag parts")
      // quantities are integers 1..50; accuracy 10000 on ~thousands of rows is near-exact
      assert(math.abs(aMedian - median) <= 1.0, s"$flag median")
      assert(math.abs(aP95 - p95) <= 1.0, s"$flag p95")
    }
  }
}
