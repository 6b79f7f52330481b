package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Data-selection operators: DSIR importance weights, the distributed
  * CCNet perplexity ntile, soft-dedup reweighting, anchor-text signals,
  * cross-source vocabulary overlap. */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alpha beta gamma alpha", "en", "s0"),
    (1L, "alpha beta delta", "en", "s0"),
    (2L, "zeta eta theta iota", "de", "s1"),
    (3L, "alpha alpha alpha alpha", "en", "s1"),
    (4L, "zeta eta beta", "de", "s2")
  ).toDF("doc_id", "text", "lang", "source")

  // ---- dsirWeights ------------------------------------------------------

  test("dsirWeights: hand-computed log-ratio on a collision-free bucketing") {
    // 65536 buckets → these 8 distinct words land in distinct buckets
    // (verified below), so bucket counts == word counts and the formula
    // is computable by hand
    val r = Selection.dsirWeights(docs, col("lang") === "en", buckets = 65536)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r.size == 5 && r(0L)._1 == 4 && r(4L)._1 == 3)
    // target slice = docs 0,1,3: counts alpha 7, beta 2, gamma 1, delta 1
    // (Tt = 11); source adds docs 2,4: zeta 2, eta 2, theta 1, iota 1,
    // beta 3 total (Ts = 18)
    val B = 65536.0
    def lt(c: Long) = math.log((c + 1.0) / (11 + B))
    def ls(c: Long) = math.log((c + 1.0) / (18 + B))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2: zeta/eta/theta/iota never in target (ct = 0)
    val exp2 = r6(lt(0) - ls(2) + (lt(0) - ls(2)) + (lt(0) - ls(1)) + (lt(0) - ls(1)))
    assert(math.abs(r(2L)._2 - exp2) < 2e-6,
      s"got ${r(2L)._2}, want ~$exp2")
    // doc 3: 4 × alpha, ct = 7, cs = 7
    val exp3 = r6(4 * (lt(7) - ls(7)))
    assert(math.abs(r(3L)._2 - exp3) < 2e-6)
    // target-looking docs outscore the out-of-slice docs
    assert(r(3L)._2 > r(2L)._2 && r(0L)._2 > r(2L)._2)
  }

  test("dsirWeights: empty target slice is defined (uniform-smoothed target)") {
    val r = Selection.dsirWeights(docs, col("lang") === "xx", buckets = 512)
      .collect()
    assert(r.length == 5 && r.forall(!_.isNullAt(2)))
  }

  test("dsirWeights: rejects bad knobs") {
    intercept[IllegalArgumentException](
      Selection.dsirWeights(docs, col("lang") === "en", buckets = 1))
    intercept[IllegalArgumentException](
      Selection.dsirWeights(docs, col("lang") === "en", alpha = 0.0))
  }

  // ---- perplexityTiles --------------------------------------------------

  /** The decomposed ntile must equal the plain single-window form on the
    * same (score desc, doc_id) key — across tile counts and bucket
    * granularities, on a corpus big enough for every lang × bucket × tile
    * boundary interaction to occur. */
  test("perplexityTiles: equals the naive ntile window, all knobs") {
    val corpus = (0L until 300L).map { i =>
      (i, s"w${i % 7} w${i % 13} w${i % 3} w${i % 31}", if (i % 3 == 0) "en" else "de", "s")
    }.toDF("doc_id", "text", "lang", "source")
    for (tiles <- Seq(1, 3, 7); dec <- Seq(0, 1, 3)) {
      val got = Selection.perplexityTiles(corpus, tiles = tiles, bucketDecimals = dec)
        .select("doc_id", "tile").as[(Long, Long)].collect().toMap
      val want = TextAnalysis.lmScore(corpus)
        .join(corpus.select("doc_id", "lang"), "doc_id")
        .withColumn("tile", ntile(tiles).over(
          Window.partitionBy("lang").orderBy(col("avg_logprob").desc, col("doc_id"))))
        .select(col("doc_id"), col("tile").cast("long")).as[(Long, Long)].collect().toMap
      assert(got == want, s"tiles=$tiles dec=$dec")
    }
  }

  test("perplexityTiles: fewer rows than tiles degenerates like ntile") {
    val tiny = Seq((0L, "a b", "en", "s"), (1L, "a c", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Selection.perplexityTiles(tiny, tiles = 5)
      .select("doc_id", "tile").as[(Long, Long)].collect().toMap
    assert(r.values.toSet == Set(1L, 2L)) // ntile gives 1..n when n < k
  }

  // ---- softDedupWeights -------------------------------------------------

  test("softDedupWeights: reciprocal group weights, rows preserved") {
    val d = Seq((0L, "x"), (1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"), (5L, "z"))
      .toDF("doc_id", "text")
    val r = Dedup.softDedupWeights(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.size == 6) // nothing dropped
    assert(r(0L) == (3L, 333333L) && r(1L) == (3L, 333333L) && r(2L) == (3L, 333333L))
    assert(r(3L) == (2L, 500000L) && r(5L) == (1L, 1000000L))
  }

  // ---- anchorSignals ----------------------------------------------------

  test("anchorSignals: counts, argmax tie-break, case folding, skips") {
    val pages = Seq(
      // two "docs" links + one "download" to the same target; case-variant
      // host and scheme must pool; relative + mailto + nested-markup skip
      (0L, """<a href="http://A.com/x">docs</a> <A HREF="HTTP://a.COM/x">docs</A>""" +
        """<a href="http://a.com/x">download</a>"""),
      (1L, """<a href="/rel">rel</a> <a href="mailto:u@h">m</a>""" +
        """<a href="http://a.com/x"><b>bold</b></a>""" + // nested markup: no match
        """<a href="http://b.com/">  b site  </a>"""), // trimmed
      // count tie at target c: "aa" vs "bb" once each → lexicographic win
      (2L, """<a href="https://c.com/">bb</a> <a href="https://c.com/">aa</a>""")
    ).toDF("doc_id", "html")
    val r = LinkGraph.anchorSignals(pages).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getString(3), x.getLong(4)))
      .toMap
    assert(r.size == 3)
    assert(r("http://a.com/x") == (3L, 2L, "docs", 2L))
    assert(r("http://b.com/") == (1L, 1L, "b site", 1L))
    assert(r("https://c.com/") == (2L, 2L, "aa", 1L)) // tie → lexicographic
  }

  // ---- entropyStats -----------------------------------------------------

  test("entropyStats: hand-computed entropies, degenerate and empty edges") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d = Seq(
      (0L, "aaaa"), // one char class → H = 0; one word → H = 0
      (1L, "ab ab"), // chars: a2 b2 ' '1 (N=5); words: "ab"×2 → H = 0
      (2L, "abcd"), // uniform 4 chars → ln 4
      (3L, "") // empty: excluded
    ).toDF("doc_id", "text").withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val r = TextAnalysis.entropyStats(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getLong(3), x.getDouble(4)))
      .toMap
    assert(r.size == 3 && !r.contains(3L))
    assert(r(0L) == ((4L, 0.0, 1L, 0.0)))
    val h1 = r6(math.log(5) - (2 * math.log(2) + 2 * math.log(2)) / 5.0)
    assert(r(1L)._1 == 5L && math.abs(r(1L)._2 - h1) < 2e-6 && r(1L)._4 == 0.0)
    assert(math.abs(r(2L)._2 - r6(math.log(4))) < 2e-6)
  }

  // ---- bitextMine -------------------------------------------------------

  test("bitextMine: hand-computed margins, hub normalization, best-per-source") {
    // en: x1=(1,0), x2=(.6,.8); de: t1=(1,0), t2=(.8,.6) a "hub", t3=(0,1)
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.6f, 0.8f)),
      (10L, Array(1f, 0f)), (11L, Array(0.8f, 0.6f)), (12L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val langs = Seq((0L, "en"), (1L, "en"), (10L, "de"), (11L, "de"), (12L, "de"))
      .toDF("doc_id", "lang")
    val r = Similarity.bitextMine(emb, langs, "en", "de", k = 2, minMarginE6 = 1000000L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // x1→t1: cos 1.0; sx=1.8e6, sy(t1)=1.6e6 → 8e12 div 6.8e6 = 1176470
    assert(r(0L) == ((10L, 1000000L, 1176470L)))
    // x2's best is the SPARSE-neighborhood t3 (cos .8, margin 1.25) over
    // the hub t2 (higher cos .96 but margin 1.09) — exactly the hubness
    // correction the ratio margin exists for
    assert(r(1L) == ((12L, 800000L, 1250000L)))
    assert(r.size == 2)
  }

  // ---- crossSourceDupMatrix ---------------------------------------------

  test("crossSourceDupMatrix: cross-source pair counts, within-source dups ignored") {
    val d = Seq(
      (0L, "t1", "A"), (1L, "t1", "A"), // within-A dup: must NOT appear alone
      (2L, "t1", "B"), // shares t1 with A's 2 copies → 2 cross pairs
      (3L, "t2", "B"), (4L, "t2", "C"), // B-C share t2
      (5L, "t3", "C") // unique
    ).toDF("doc_id", "text", "source")
    val r = Dedup.crossSourceDupMatrix(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r(("A", "B")) == (1L, 2L)) // one shared text, 2·1 duplicate pairs
    assert(r(("B", "C")) == (1L, 1L))
    assert(!r.contains(("A", "C")))
    assert(r.size == 2)
  }

  // ---- sourceOverlap ----------------------------------------------------

  test("sourceOverlap: exact pairwise Jaccard, empty intersections absent") {
    val d = Seq(
      (0L, "a b c", "en", "s0"), (1L, "b c d", "en", "s1"),
      (2L, "x y", "en", "s2"), (3L, "c b a", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val r = TextAnalysis.sourceOverlap(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getLong(3))).toMap
    // s0 = {a,b,c}, s1 = {b,c,d}, s2 = {x,y}
    assert(r((s"s0", s"s1")) == (2L, 500000L)) // 2 / (3+3-2)
    assert(!r.contains(("s0", "s2")) && !r.contains(("s1", "s2")))
    assert(r.size == 1)
  }

  test("robustOutliers: median/MAD flags the tail, even-count interpolation exact") {
    val fx = Seq(
      // group a: scores 0,10,20,30,1000 → med 20, devs 20/10/0/10/980,
      // MAD 10 → only the 980 deviation clears 3·MAD = 30
      (0L, "a", 0L), (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 1000L),
      // group b (even count): 0,10,20,40 → med 15, devs 15/5/5/25,
      // sorted devs 5,5,15,25 → MAD = (5+15)/2 = 10 → none clear 30
      (5L, "b", 0L), (6L, "b", 10L), (7L, "b", 20L), (8L, "b", 40L)
    ).toDF("doc_id", "source", "s")
    val got = Selection.robustOutliers(fx, "source", col("s")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("med_e6"), r.getAs[Double]("mad_e6"),
          r.getAs[Boolean]("is_outlier")))).toMap
    assert(got(0L) == ((20.0, 10.0, false)))
    assert(got(4L) == ((20.0, 10.0, true)))
    assert((0L to 3L).forall(!got(_)._3))
    assert(got(5L) == ((15.0, 10.0, false)))
    assert((5L to 8L).forall(!got(_)._3))
  }

  test("naiveBayesClassify: recovers planted classes, unseen words fall back, name ties") {
    val fx = Seq(
      // train: two classes with disjoint signature words + shared filler
      (0L, "cat", "meow purr meow the the"),
      (1L, "cat", "purr meow purr the"),
      (2L, "dog", "woof bark woof the the"),
      (3L, "dog", "bark woof bark the"),
      // held out: signature words decide; 'zzz' is unseen everywhere
      (10L, "cat", "meow purr zzz"),
      (11L, "dog", "woof bark zzz")
    ).toDF("doc_id", "label", "text")
    val got = Selection.naiveBayesClassify(fx, "label", col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(10L) == (("cat", "cat")))
    assert(got(11L) == (("dog", "dog")))
    // all-unseen doc: both classes score identically (same sizes by
    // construction) → the name tie must pick 'cat' deterministically
    val tie = Selection.naiveBayesClassify(
      fx.unionByName(Seq((12L, "dog", "zzz qqq")).toDF("doc_id", "label", "text")),
      "label", col("doc_id") >= 10L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tie(12L) == "cat")
  }

  test("naiveBayesClassify on the q178 fixture: planted language recovered on holdout") {
    import org.apache.spark.sql.functions._
    val fx = SparkEntry.langIdDocuments(spark, "/root/testdata/sf0.001")
      .withColumn("label", element_at(
        array(SparkEntry.langIdPhrases.map(p => lit(p._1)): _*),
        (col("doc_id") % 5).cast("int") + 1))
    val got = Selection.naiveBayesClassify(fx, "label", col("doc_id") % 7 === 0)
      .collect()
    assert(got.nonEmpty)
    val acc = got.count(r => r.getString(1) == r.getString(2)).toDouble / got.length
    assert(acc >= 0.99, s"planted-language recovery should be ~perfect, got $acc")
  }
}
