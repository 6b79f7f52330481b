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

  test("md5_word_hashes: interpreted == codegen == the conv/substring HOF") {
    val df = Seq(
      Array("the", "quick", "brown", "fox", ""),
      Array("unicode", "naïve", "日本語", "emoji🎉"),
      Array.empty[String]
    ).toDF("ws")
    val hof = df.select(
      transform($"ws", w => conv(substring(md5(w), 1, 15), 16, 10).cast("long")))
      .collect().map(_.getSeq[Long](0))
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(HashFunctions.md5_word_hashes($"ws"))
        .collect().map(_.getSeq[Long](0))
      assert(got.toSeq == hof.toSeq, s"codegen=$codegen")
    }
    // null elements map to null, like the HOF
    val withNull = spark.sql("select array('a', cast(null as string), 'b') ws")
    val r = withNull.select(HashFunctions.md5_word_hashes($"ws")).collect()(0)
      .getSeq[Any](0)
    val h = withNull.select(
      transform($"ws", w => conv(substring(md5(w), 1, 15), 16, 10).cast("long")))
      .collect()(0).getSeq[Any](0)
    assert(r == h && r(1) == null)
  }

  test("intersect_count == size(array_intersect) on dups, nulls, empties") {
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L)),
      (Array(1L, 1L, 2L, 2L), Array(2L, 2L, 1L)),          // duplicates both sides
      (Array.emptyLongArray, Array(1L, 2L)),               // empty left
      (Array(7L), Array.emptyLongArray),                   // empty right
      (Array(0L, -1L, Long.MinValue), Array(Long.MinValue, 0L)), // sentinels
      ((1L to 500L).toArray, (250L to 750L).toArray)       // bigger than table seed
    ).toDF("a", "b")
    val expected = df.select(size(array_intersect($"a", $"b")))
      .collect().map(_.getInt(0))
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(HashFunctions.intersect_count($"a", $"b"))
        .collect().map(_.getInt(0))
      assert(got.toSeq == expected.toSeq, s"codegen=$codegen")
    }
    // null ELEMENTS: a shared null counts once, like array_intersect
    val withNulls = spark.sql(
      "select array(1L, cast(null as bigint), 2L) a, " +
        "array(cast(null as bigint), 2L, null) b " +
      "union all select array(1L, cast(null as bigint)) a, array(2L) b")
    val en = withNulls.select(size(array_intersect($"a", $"b")))
      .collect().map(_.getInt(0))
    val gn = withNulls.select(HashFunctions.intersect_count($"a", $"b"))
      .collect().map(_.getInt(0))
    assert(gn.toSeq == en.toSeq)
    // null ARRAY propagates null
    val na = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(na.select(HashFunctions.intersect_count($"a", $"b")).collect()(0).isNullAt(0))
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

  test("hyperplane_signature: codegen == interpreted == original HOF formulation") {
    val df = Seq(
      Array(0.3f, -1.2f, 4.5f, 0.01f, -2.2f),
      Array(-0.5f, -0.5f, -0.5f),
      Array(1e-8f, -1e-8f),
      Array.emptyFloatArray
    ).toDF("v")
    // the HOF chain it replaced is the independent semantic reference —
    // bit-for-bit equality locks the signature so existing buckets survive
    val reference = df.select(
      graft.operators.Similarity.lshSignatureInterpreted($"v", 12).as("sig"))
      .collect().map(_.getLong(0)).toSeq
    for (cg <- Seq(true, false)) withCodegen(cg) {
      val got = df.select(VectorFunctions.hyperplane_signature($"v", 12).as("sig"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == reference, s"codegen=$cg")
    }
    // empty vector → null-padded zip nulls every dot → zero signature (locked quirk)
    assert(reference(3) == 0L)
    // doubles agree with floats widened exactly
    val d = Seq(Array(0.25, -0.5)).toDF("v")
      .select(VectorFunctions.hyperplane_signature($"v", 12)).collect()(0).getLong(0)
    val f = Seq(Array(0.25f, -0.5f)).toDF("v")
      .select(VectorFunctions.hyperplane_signature($"v", 12)).collect()(0).getLong(0)
    assert(d == f)
  }

  test("hyperplane_signature: seedOffset yields independent plane families") {
    val df = Seq(Tuple1(Array(0.3f, -1.2f, 4.5f, 0.01f, -2.2f, 1.7f, -0.9f, 2.3f))).toDF("v")
    val sigs = df.select(
      VectorFunctions.hyperplane_signature($"v", 8, 0).as("t0"),
      VectorFunctions.hyperplane_signature($"v", 8, 8).as("t1"),
      VectorFunctions.hyperplane_signature($"v", 8, 16).as("t2")).collect()(0)
    // distinct tables disagree somewhere (2^-8 odds per pair of colliding by chance)
    assert(Set(sigs.getLong(0), sigs.getLong(1), sigs.getLong(2)).size == 3)
    // table t's plane j IS global plane t*b+j: the 16-plane signature's high
    // byte equals table 1's signature (construction, not chance)
    val wide = df.select(VectorFunctions.hyperplane_signature($"v", 16, 0)).collect()(0).getLong(0)
    assert((wide >>> 8) == sigs.getLong(1))
    assert((wide & 0xFFL) == sigs.getLong(0))
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

  test("nfc_normalize: composes NFD, passes through ASCII and NFC, null-safe") {
    val nfd = "cafe\u0301 de\u0301ja\u0300 vu" // e + combining acute/grave
    val nfc = "caf\u00e9 d\u00e9j\u00e0 vu" // precomposed
    val hangulNfd = "\u1100\u1161" // conjoining jamo
    val hangulNfc = "\uac00" // composed syllable GA
    val df = Seq(Some(nfd), Some(nfc), Some("plain ascii"), Some(hangulNfd), None)
      .toDF("t")
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(operators.TextAnalysis.nfcNormalizeCol($"t")).collect()
        .map(r => if (r.isNullAt(0)) null else r.getString(0))
      assert(got.toSeq == Seq(nfc, nfc, "plain ascii", hangulNfc, null),
        s"codegen=$codegen")
    }
    // NFD and NFC spellings collapse to one hash — the property dedup needs
    val hashes = Seq(nfd, nfc).toDF("t")
      .select(md5(operators.TextAnalysis.nfcNormalizeCol($"t"))).collect()
      .map(_.getString(0))
    assert(hashes(0) == hashes(1))
  }

  test("max_sorted_run_length matches the array_sort + fold formulation") {
    val df = Seq(
      Array(3L, 1L, 3L, 2L, 3L, 1L), // max multiplicity 3
      Array(7L),                     // singleton
      Array.empty[Long],             // empty → 0
      Array(5L, 5L, 5L, 5L),         // all equal
      Array(-1L, Long.MinValue, -1L, Long.MaxValue, Long.MinValue)
    ).toDF("a")
    // the pre-r21 formulation: fold over the sorted array
    val fold = aggregate(
      array_sort($"a"),
      struct(lit(0L).as("prev"), lit(0).as("run"), lit(0).as("mx"), lit(true).as("first")),
      (acc, x) => {
        val run = when(acc("first") || x =!= acc("prev"), 1).otherwise(acc("run") + 1)
        struct(x.as("prev"), run.as("run"),
          greatest(acc("mx"), run).as("mx"), lit(false).as("first"))
      },
      acc => acc("mx"))
    val expected = df.select(fold).collect().map(_.getInt(0))
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(RunFunctions.max_sorted_run_length($"a"))
        .collect().map(_.getInt(0))
      assert(got.toSeq == expected.toSeq, s"codegen=$codegen")
    }
    assert(expected.toSeq == Seq(3, 1, 0, 4, 2)) // the fold itself is sane
  }

  test("sorted_run_nlnn is bit-identical to the runNLnN fold over array_sort") {
    val df = Seq(
      "the quick brown fox the the".split(" "),
      Array("z", "a", "z", "a", "z"),
      Array("solo"),
      Array.empty[String],
      "a b c d e f g a b c a b a".split(" ")
    ).toDF("a")
    val expected = df
      .select(operators.TextAnalysis.runNLnN(array_sort($"a")))
      .collect().map(_.getDouble(0))
    for (codegen <- Seq(true, false)) withCodegen(codegen) {
      val got = df.select(RunFunctions.sorted_run_nlnn($"a"))
        .collect().map(_.getDouble(0))
      // BIT-identical, not approximately equal — the entropy round-6 sits
      // downstream and must see the same double
      assert(got.toSeq == expected.toSeq, s"codegen=$codegen")
    }
  }
}
