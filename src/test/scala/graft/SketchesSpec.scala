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

  test("misra-gries degenerates to exact counts when capacity covers the items") {
    import spark.implicits._
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(items).toDF("item").repartition(4)
    val r = Sketches.heavyHitters(df, "item", capacity = 8).collect()
      .map(x => x.getString(0) -> x.getLong(1))
    assert(r.toSeq == Seq("a" -> 30L, "b" -> 20L, "c" -> 5L)) // est desc order
  }

  test("misra-gries compressed regime keeps every true heavy hitter within bounds") {
    import spark.implicits._
    // n = 1000 + 500 + 400: three hot items, plus 300 singletons; capacity
    // 10 ⇒ error ≤ n/11 ≈ 200 — each hot item's true count clears the
    // presence threshold by construction
    val hot = Seq.fill(1000)("hot1") ++ Seq.fill(500)("hot2") ++ Seq.fill(400)("hot3")
    val tail = (0 until 300).map(i => s"cold$i")
    val all = hot ++ tail
    val n = all.length
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(13))
      .shuffle(all).toDF("item").repartition(8)
    val r = Sketches.heavyHitters(df, "item", capacity = 10).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.size <= 10, "never more than capacity survivors")
    val truth = Map("hot1" -> 1000L, "hot2" -> 500L, "hot3" -> 400L)
    val bound = n / 11 // n/(capacity+1)
    truth.foreach { case (item, t) =>
      assert(r.contains(item), s"$item (true $t > $bound) must survive")
      assert(r(item) <= t, s"$item must undercount")
      assert(r(item) >= t - bound, s"$item est ${r(item)} within $bound of $t")
    }
    // every estimate is a lower bound for every survivor, including tail ones
    r.foreach { case (item, est) =>
      val t = truth.getOrElse(item, 1L)
      assert(est <= t, s"$item overcounted: est $est > true $t")
    }
  }
}
