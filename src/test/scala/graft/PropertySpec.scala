package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over randomly generated partitions (SURVEY §5): the
  * rank-family algebra, lead/lag inversion, and aggregate/percentile
  * invariants that must hold for ANY input, not just the fixtures.
  * Raw ScalaCheck generators with fixed seeds (the scalatest bridge isn't in
  * the offline dependency cache) — deterministic across runs. */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T])(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    for (i <- 0 until 10)
      body(g.apply(params, org.scalacheck.rng.Seed(i.toLong))
        .getOrElse(fail(s"generator exhausted at seed $i")))
  }
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(String, Int, Double)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(-50, 50)
      x <- Gen.choose(-100, 100)
    } yield (k, v, x.toDouble))
  } yield rows.zipWithIndex.map { case ((k, v, x), i) => (k, v * 1000 + i, x) } // unique order key

  private def runAggs(rows: List[(String, Int, Double)], aggs: Seq[AggregateSpec]) = {
    val df = rows.toDF("k", "ord", "x")
    WindowEngine.run(df, WindowQuerySpec(Seq("k"), Seq(OrderSpec("ord")), aggregates = aggs))
      .collect()
  }

  test("rank/dense_rank/row_number algebra holds on any partition") {
    forAll(rowsGen) { rows =>
      val out = runAggs(rows, Seq(
        AggregateSpec("r", WindowFn.Rank, "ord"),
        AggregateSpec("d", WindowFn.DenseRank, "ord"),
        AggregateSpec("n", WindowFn.RowNumber, "ord")))
      val byPart = out.groupBy(_.getString(0))
      for ((_, part) <- byPart) {
        val rs = part.map(r => (r.getInt(3), r.getInt(4), r.getInt(5)))
        // dense_rank <= rank <= row_number; row_number is a 1..n permutation
        assert(rs.forall { case (r, d, n) => d <= r && r <= n && d >= 1 })
        assert(rs.map(_._3).sorted.toSeq == (1 to part.length))
        // order key unique here → rank == row_number
        assert(rs.forall { case (r, _, n) => r == n })
      }
    }
  }

  test("accumulate's last running value equals the partition sum; lead/lag invert") {
    forAll(rowsGen) { rows =>
      val out = runAggs(rows, Seq(
        AggregateSpec("run", WindowFn.Accumulate, "x"),
        AggregateSpec("nxt", WindowFn.Lead, "x", Seq("1")),
        AggregateSpec("prv", WindowFn.Lag, "x", Seq("1"))))
      for ((_, part0) <- out.groupBy(_.getString(0))) {
        val part = part0.sortBy(_.getInt(1))
        val xs = part.map(_.getDouble(2))
        assert(part.last.getDouble(3) == xs.sum)
        // lead at i == x at i+1; lag at i+1 == x at i
        for (i <- part.indices.dropRight(1)) {
          assert(part(i).getDouble(4) == xs(i + 1))
          assert(part(i + 1).getDouble(5) == xs(i))
        }
        assert(part.last.isNullAt(4) && part.head.isNullAt(5))
      }
    }
  }

  test("percent_rank = (rank-1)/(n-1); cume_dist reaches exactly 1") {
    forAll(rowsGen) { rows =>
      val out = runAggs(rows, Seq(
        AggregateSpec("r", WindowFn.Rank, "ord"),
        AggregateSpec("pr", WindowFn.PercentRank, "ord"),
        AggregateSpec("cd", WindowFn.CumulativeDistribution, "x")))
      for ((_, part) <- out.groupBy(_.getString(0))) {
        val n = part.length
        for (row <- part) {
          val expected = if (n == 1) 0.0f else ((row.getInt(3) - 1).toDouble / (n - 1)).toFloat
          assert(row.getFloat(4) == expected)
        }
        assert(part.map(_.getDouble(5)).max == 1.0)
      }
    }
  }

  test("ROW-frame sliding sum equals a Scala sliding-window computation") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "ord", "x")
      val out = WindowEngine.run(df, WindowQuerySpec(Seq("k"), Seq(OrderSpec("ord")),
        FrameSpec(FrameType.Row, preceding = Some(-2L), following = Some(1L)),
        Seq(AggregateSpec("s", WindowFn.Accumulate, "x")))).collect()
      for ((_, part0) <- out.groupBy(_.getString(0))) {
        val part = part0.sortBy(_.getInt(1))
        val xs = part.map(_.getDouble(2))
        for (i <- part.indices) {
          val lo = math.max(0, i - 2); val hi = math.min(part.length - 1, i + 1)
          assert(part(i).getDouble(3) == xs.slice(lo, hi + 1).sum,
            s"frame [-2,1] at row $i of ${part.length}")
        }
      }
    }
  }

  test("discrete percentile bounds: p=0 gives min, p=1 gives max, monotone in p") {
    // running-frame semantics (reference UDAF over the ordered spec): every
    // row's value is the percentile of its ordered PREFIX — check the
    // invariants per prefix, which subsumes the whole-partition case on the
    // last row
    forAll(rowsGen) { rows =>
      val out = runAggs(rows, Seq(
        AggregateSpec("p0", WindowFn.DiscretePercentile, "x", Seq("0.0")),
        AggregateSpec("p5", WindowFn.DiscretePercentile, "x", Seq("0.5")),
        AggregateSpec("p1", WindowFn.DiscretePercentile, "x", Seq("1.0"))))
      for ((_, part) <- out.groupBy(_.getString(0))) {
        val prefix = scala.collection.mutable.ArrayBuffer.empty[Double]
        for (r <- part.sortBy(_.getInt(1))) {
          prefix += r.getDouble(2)
          val (p0, p5, p1) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
          assert(p0 == prefix.min && p1 == prefix.max)
          assert(p0 <= p5 && p5 <= p1)
          assert(prefix.contains(p5)) // discrete percentile is always an actual value
        }
      }
    }
  }

  test("quality rules match an independent Scala reference on random word soups") {
    // small vocab forces heavy repetition — the regime the sorted-hash
    // longest-run fold must count exactly (ties, runs at array ends,
    // single-word docs with no bigrams)
    val docsGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 30)
        ws <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(docsGen) { docs =>
      val df = docs.map { case (id, t) => (id, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val got = operators.TextAnalysis.qualityRules(df).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
      docs.foreach { case (id, text) =>
        val ws = text.split(" ").toSeq
        val bgs = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val expTop = if (bgs.isEmpty) 0.0
          else bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size
        val expDup = (ws.size - ws.distinct.size).toDouble / ws.size
        assert(got(id) == ((ws.size, expDup, expTop)), s"doc '$text'")
      }
    }
  }
}
