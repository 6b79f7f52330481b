package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** Pins the custom codegen'd expressions: results must be identical between
  * the interpreted (nullSafeEval) and generated-code paths, and must agree
  * with the pure-Catalyst formulations they replaced. */
class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withCodegen[T](on: Boolean)(f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val fallback = "spark.sql.codegen.factoryMode"
    val old = spark.conf.get(key)
    spark.conf.set(key, on.toString)
    spark.conf.set(fallback, if (on) "CODEGEN_ONLY" else "NO_CODEGEN")
    try f finally { spark.conf.set(key, old); spark.conf.set(fallback, "FALLBACK") }
  }

  test("dot_product matches the HOF formulation on doubles and floats") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.5, 2.25), Array(-2.0, 3.0, 0.125))
    ).toDF("a", "b")
    val expected = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .collect().map(_.getDouble(0))
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(VectorFunctions.dot_product($"a", $"b")).collect().map(_.getDouble(0))
      assert(got.toSeq == expected.toSeq, s"codegen=$codegen")
    }
    // float arrays widen exactly
    val f = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
    assert(f.select(VectorFunctions.dot_product($"a", $"b")).collect()(0).getDouble(0) == 13.0)
  }

  test("two dot_products in one projection compile under forced codegen") {
    // regression: fixed local names in doGenCode collided when two instances
    // shared an unbraced codegen scope (non-nullable children)
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    withCodegen(true) {
      val r = df.select(
        VectorFunctions.dot_product($"a", $"b").as("d1"),
        VectorFunctions.dot_product($"b", $"b").as("d2"),
        HashFunctions.simhash_signature(array(lit(1L), lit(2L))).as("s1"),
        HashFunctions.simhash_signature(array(lit(3L))).as("s2")).collect()(0)
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
    }
  }

  test("dot_product propagates null input") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(VectorFunctions.dot_product($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("simhash_signature: interpreted == codegen, sign semantics") {
    val df = Seq(Array(0xFFL, 0xFFL, 0x01L), Array.emptyLongArray).toDF("hs")
    val results = Seq(true, false).map { cg =>
      withCodegen(cg)(df.select(HashFunctions.simhash_signature($"hs")).collect().map(_.getLong(0)).toSeq)
    }
    assert(results(0) == results(1))
    // bits 0..7 have counts {+3.. for bit0: h bits: 1,1,1 → +3>0 set}; bit 1: 1,1,0 → +1 set; bit 8+: -3 unset
    assert(results(0)(0) == 0xFFL)
    assert(results(0)(1) == 0L) // empty → all counts 0 → no bits
  }

  test("minhash_signature: interpreted == codegen, min semantics, sentinel on empty") {
    val df = Seq(Array(7L, 42L, 99L), Array.emptyLongArray).toDF("hs")
    val results = Seq(true, false).map { cg =>
      withCodegen(cg)(df.select(HashFunctions.minhash_signature($"hs", 8)).collect()
        .map(_.getSeq[Long](0)).toSeq)
    }
    assert(results(0) == results(1))
    assert(results(0)(0).size == 8)
    assert(results(0)(1).forall(_ == Long.MaxValue))
    // each slot is the min over elements of the per-slot rehash
    val manual = (0 until 8).map { j =>
      Seq(7L, 42L, 99L).map(h =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(h, j.toLong)).min
    }
    assert(results(0)(0) == manual)
  }

  test("word_gram_hashes: equal word windows hash equal; short input empty") {
    val df = Seq(
      Tuple1(Array("a", "b", "c", "d")),
      Tuple1(Array("x", "b", "c", "d")),
      Tuple1(Array("a", "b"))
    ).toDF("ws")
    val rows = df.select(HashFunctions.word_gram_hashes($"ws", 3)).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).size == 2 && rows(1).size == 2 && rows(2).isEmpty)
    assert(rows(0)(1) == rows(1)(1)) // shared window (b,c,d)
    assert(rows(0)(0) != rows(1)(0)) // differing window
    // duplicate grams preserved (minhash relies on multiset being harmless)
    val dup = Seq(Tuple1(Array("a", "a", "a", "a"))).toDF("ws")
      .select(HashFunctions.word_gram_hashes($"ws", 2)).collect()(0).getSeq[Long](0)
    assert(dup.distinct.size == 1 && dup.size == 3)
  }
}
