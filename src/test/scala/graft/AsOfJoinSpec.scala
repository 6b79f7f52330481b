package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
    (2L, 7L, "e4"),
    (3L, 9L, "e5") // key with no right rows at all
  ).toDF("k", "t", "ev")

  private lazy val right = Seq(
    (1L, 10L, 100.0), (1L, 15L, 150.0),
    (2L, 1L, 20.0), (2L, 8L, 28.0)
  ).toDF("k", "t", "price")

  test("attaches the latest right payload at or before each left time") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out("e1").isEmpty)          // t=5 before any right row for key 1
    assert(out("e2").contains(100.0))  // inclusive: right at t=10 visible at left t=10
    assert(out("e3").contains(150.0))  // latest <= 20 is t=15
    assert(out("e4").contains(20.0))   // t=7: only the t=1 row qualifies
    assert(out("e5").isEmpty)          // no right rows for key 3
  }

  test("right rows with null key or time never match") {
    val dirtyRight = Seq(
      (Some(1L), Some(10L), 100.0),
      (Some(1L), Option.empty[Long], 999.0), // null time must not leak
      (Option.empty[Long], Some(1L), 888.0)  // null key must not match
    ).toDF("k", "t", "price")
    val out = AsOfJoin.asOf(left, dirtyRight, "k", "t", "k", "t", Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("e1").isEmpty)                // t=5: nothing but the null rows "before" it
    assert(out("e2").contains(100.0))
  }

  test("left columns survive untouched and single shuffle") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "k", "t", Seq("price"))
    assert(out.columns.toSeq == Seq("k", "t", "ev", "asof_price"))
    val p = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(!p.contains("Join"), "as-of is union+window, not a join")
  }

  test("interval join: inclusive bounds, cross-bucket matches, key isolation") {
    // tolerance 10: buckets are [0,10), [10,20), ... — t=9 and t=15 sit in
    // DIFFERENT buckets but are 6 apart (must match via the ±1 exploration);
    // t=5 and t=15 are exactly tolerance apart (inclusive bound must match);
    // t=5 and t=16 are 11 apart (must not)
    val l = Seq((1L, 5L, "a"), (1L, 9L, "b"), (2L, 9L, "c")).toDF("k", "t", "ev")
    val r = Seq((1L, 15L, "x"), (1L, 16L, "y"), (2L, 100L, "z")).toDF("k", "t", "rv")
    val out = AsOfJoin.interval(l, r, "k", "t", "k", "t", tolerance = 10L, payload = Seq("rv"))
      .collect().map(x => (x.getString(2), x.getString(3))).toSet
    assert(out == Set(
      ("a", "x"),           // Δ=10, inclusive
      ("b", "x"), ("b", "y") // Δ=6 cross-bucket, Δ=7
    ))                       // ("a","y") Δ=11 excluded; key 2 pair Δ=91 excluded
    // plan: equi-join on (key, bucket), never a cartesian/BNLJ
    val p = AsOfJoin.interval(l, r, "k", "t", "k", "t", 10L, Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
