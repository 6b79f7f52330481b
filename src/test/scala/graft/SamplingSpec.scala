package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
    .toDF("id", "grp")

  test("hash split is deterministic, stable, and near the requested fractions") {
    val s1 = Sampling.hashSplit(df, col("id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Sampling.hashSplit(df, col("id")).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    assert(s1("train") > 1500 && s1("train") < 1700) // ~80% of 2000
    assert(s1.values.sum == 2000)
    // per-row assignment is a pure function of the key: subsetting can't move rows
    val subset = Sampling.hashSplit(df.filter($"id" < 100), col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val full = Sampling.hashSplit(df, col("id"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(subset.forall { case (id, split) => full(id) == split })
  }

  test("cluster-safe split: cluster members share a split, singletons key by themselves") {
    val docs = (0L until 2000L).toDF("doc_id")
    // clusters: docs 0–599 in triples {0,1,2} → canonical 0, {3,4,5} → 3, ...
    val clusters = (0L until 600L).map(d => (d, d / 3 * 3)).toDF("doc_id", "cluster_id")
    val split = Sampling.clusterSafeSplit(docs, clusters)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("split_key"), r.getAs[String]("split")))).toMap
    assert(split.size == 2000)
    // every cluster's members share the canonical key AND the split
    (0L until 600L).foreach { d =>
      assert(split(d)._1 == d / 3 * 3)
      assert(split(d)._2 == split(d / 3 * 3)._2,
        s"doc $d must ride its canonical's coin")
    }
    // unclustered docs key by themselves — identical to plain hashSplit
    val plain = Sampling.hashSplit(docs.filter($"doc_id" >= 600L), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    (600L until 2000L).foreach { d =>
      assert(split(d)._1 == d && split(d)._2 == plain(d))
    }
    // the doc-keyed coin WOULD have straddled at least one cluster —
    // the leak this operator exists to close
    val docCoin = Sampling.hashSplit(docs.filter($"doc_id" < 600L), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert((0L until 600L).exists(d => docCoin(d) != docCoin(d / 3 * 3)),
      "expected at least one cluster straddled under independent doc coins")
    // the cluster frame joins BROADCAST — a checkpoint-leaf cluster table
    // has no stats, and unhinted it sort-merge-shuffles the full corpus
    val plan = Sampling.clusterSafeSplit(docs, clusters)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"clusters must broadcast:\n${plan.take(1500)}")
  }

  test("deterministic shuffle: dense per-shard positions, partition-invariant, seed-sensitive") {
    val out = Sampling.deterministicShuffle(df, col("id"), shards = 4, seed = "s1")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.length == 2000)
    // positions are dense 1..n within every shard (a dataloader can walk them)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // physical partitioning cannot change the order (determinism contract)
    val repart = Sampling.deterministicShuffle(df.repartition(13), col("id"),
      shards = 4, seed = "s1")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSet == repart.toSet)
    // a different seed is a genuinely different order
    val reseed = Sampling.deterministicShuffle(df, col("id"), shards = 4, seed = "s2")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(reseed.toSet != out.toSet)
    // and the order "shuffles": ids in shard-0 pos-order are not id-sorted
    val shard0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.toSeq != shard0.sorted.toSeq)
  }

  test("epoch mix: most-over-weighted source runs once, others repeat at T*w/n") {
    // a: 4 rows at w=0.5 -> n/w = 8 = T -> rate 1.0 (one epoch, no extras)
    // b: 2 rows at w=0.5 -> rate 8*0.5/2 = 2.0 (exactly two epochs)
    val mix = (0L until 4L).map((_, "a")) ++ (100L until 102L).map((_, "b"))
    val mdf = mix.toDF("doc_id", "src")
    val out = Sampling.epochMix(mdf, Map("a" -> 0.5, "b" -> 0.5), sourceCol = "src")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Int]("epoch")))
    val perRow = out.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    (0L until 4L).foreach(i => assert(perRow((i, "a")) == Seq(0)))
    (100L until 102L).foreach(i => assert(perRow((i, "b")) == Seq(0, 1)))

    // fractional rate: a 3@0.5 -> n/w = 6 = T -> rate 1.0; b 2@0.5 -> rate 1.5:
    // one full epoch + the md5(":up")-bucket half gets a second copy
    val mix2 = (0L until 3L).map((_, "a")) ++ (100L until 102L).map((_, "b"))
    val out2 = Sampling.epochMix(mix2.toDF("doc_id", "src"),
      Map("a" -> 0.5, "b" -> 0.5), sourceCol = "src")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Int]("epoch")))
    val copies2 = out2.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    assert((0L until 3L).forall(i => copies2((i, "a")) == 1))
    // b rows get 1 or 2 copies, decided by the independent ":up" coin
    import java.security.MessageDigest
    def upExtra(id: Long): Int = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$id:up".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.take(4), 16) < 32768) 1 else 0
    }
    (100L until 102L).foreach(i => assert(copies2((i, "b")) == 1 + upExtra(i)))
    // nothing ever drops: every input row appears at epoch 0
    assert(out2.count(_._3 == 0) == 5)
  }

  test("stratified sample takes exactly k per stratum, deterministically") {
    val out = Sampling.stratifiedSample(df, "grp", col("id"), 7)
    val counts = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 7, "b" -> 7))
    val again = Sampling.stratifiedSample(df, "grp", col("id"), 7)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == again.collect().map(_.getLong(0)).sorted.toSeq)
    // pushes the limit below the shuffle
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("tokenBudget: exact prefix selection at every boundary placement") {
    val fx = Seq(
      (0L, 10.0, 100L), (1L, 9.0, 100L), (2L, 8.0, 100L),
      (3L, 7.0, 100L), (4L, 6.0, 100L), (5L, 5.0, 100L)
    ).toDF("doc_id", "quality_score", "n_tokens")
    def ids(b: Long, buckets: Int) = Sampling.tokenBudget(fx, b, buckets = buckets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the selection is invariant to where the quantile buckets fall
    for (nb <- Seq(2, 3, 6)) {
      assert(ids(250, nb) == Set(0L, 1L), s"buckets=$nb")   // 3rd row would overflow
      assert(ids(300, nb) == Set(0L, 1L, 2L), s"buckets=$nb") // exact fit keeps
      assert(ids(10000, nb) == fx.collect().map(_.getLong(0)).toSet) // all fit
      assert(ids(0, nb) == Set.empty)
      assert(ids(50, nb) == Set.empty)                       // first row overflows
    }
  }

  test("tokenBudget: equal scores break ties by md5 order, rerun-stable") {
    val ties = Seq.tabulate(10)(i => (i.toLong, 1.0, 10L))
      .toDF("doc_id", "quality_score", "n_tokens")
    def run() = Sampling.tokenBudget(ties, 50L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = run()
    assert(got == run() && got.size == 5)
    val md5Prefix = ties.withColumn("m", md5(col("doc_id").cast("string")))
      .orderBy("m").collect().map(_.getLong(0)).take(5).toSet
    assert(got == md5Prefix)
  }

  test("tokenBudget: null scores sort LAST, never into the kept prefix") {
    // nulls sit after every scored row in (score DESC nulls-last, …)
    // order, so a budget that covers only the scored rows must exclude
    // them — the regression was bucket-0 (top, fully-kept) placement
    val fx = Seq[(Long, Option[Double], Long)](
      (0L, Some(5.0), 100L), (1L, None, 100L), (2L, Some(4.0), 100L),
      (3L, None, 100L), (4L, Some(3.0), 100L)
    ).toDF("doc_id", "quality_score", "n_tokens")
    def ids(b: Long) = Sampling.tokenBudget(fx, b, buckets = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(300) == Set(0L, 2L, 4L)) // scored rows exactly fill the budget
    assert(ids(200) == Set(0L, 2L))
    assert(ids(400) == Set(0L, 2L, 4L) + 1L) // first null (md5 order) joins
    assert(ids(500) == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("uniMaxMix: ascending walk, cap binds small sources, rollover funds large ones") {
    // sizes 10 / 40 / 100, budget 120, cap 2 epochs. Walk ascending:
    //   a (10): min(20, 120//3=40) = 20  → rem 100
    //   b (40): min(80, 100//2=50) = 50  → rem 50
    //   c (100): min(200, 50//1)   = 50  → rem 0
    // a is CAPPED (2 epochs exactly); its unused fair share rolls to b, c.
    val fx = (Seq.fill(10)("a") ++ Seq.fill(40)("b") ++ Seq.fill(100)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "w") }
      .toDF("doc_id", "source", "text") // 1 word per doc → n_tokens = rows
    val got = Sampling.uniMaxMix(fx, budget = 120L, epochCap = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((10L, 20L, 2000000L, 166666L)))
    assert(got("b") == ((40L, 50L, 1250000L, 416666L)))
    assert(got("c") == ((100L, 50L, 500000L, 416666L)))
    // caps bind everywhere → total allocation is the capped corpus, not
    // the budget (nothing left to roll anywhere)
    val capped = Sampling.uniMaxMix(fx, budget = 1000L, epochCap = 2)
      .collect().map(r => r.getLong(2)).sum
    assert(capped == 300L)
  }

  test("uniMaxMix: n_tokens near Long.MaxValue does not overflow the epoch cap") {
    // one doc whose weight is Long.MaxValue/2: n·epochCap would wrap negative
    // unguarded; the saturating cap must leave min() picking the fair share
    val fx = Seq((0L, "big", "x"), (1L, "small", "x")).toDF("doc_id", "source", "text")
    val big = org.apache.spark.sql.functions.when(
      org.apache.spark.sql.functions.col("source") === "big",
      Long.MaxValue / 2).otherwise(1L)
    val got = Sampling.uniMaxMix(fx, budget = 100L, epochCap = 4, weight = big)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("small") == 4L)  // capped at 1 token × 4 epochs
    assert(got("big") == 96L)   // the rolled-over remainder, NOT a negative cap
  }

  test("proportionalSplit: exact total, largest-remainder seats, md5-stable picks") {
    // strata 10/20/30, k=7: quotas 1.16/2.33/3.5 → floors 1/2/3 (=6),
    // 1 leftover goes to the largest remainder (c: k·n mod N = 210 mod 60
    // = 30 vs a:10, b:20) → seats 1/2/4
    val fx = (Seq.fill(10)("a") ++ Seq.fill(20)("b") ++ Seq.fill(30)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val got = Sampling.proportionalSplit(fx, k = 7L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(got.length == 7)
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 1, "b" -> 2, "c" -> 4))
    // rerun-stability: same draw, any partitioning
    val again = Sampling.proportionalSplit(fx.repartition(7), k = 7L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    assert(got.toSet == again.toSet)
    // k = N degenerates to everything; k > N refuses
    assert(Sampling.proportionalSplit(fx, k = 60L).count() == 60)
    intercept[IllegalArgumentException](Sampling.proportionalSplit(fx, k = 61L))
  }

  test("uniMaxApply: floor copies exact, fractional copy = the md5 coin, zero-alloc absent") {
    val fx = (Seq.fill(10)("a") ++ Seq.fill(40)("b") ++ Seq.fill(100)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "w") }
      .toDF("doc_id", "source", "text")
    // walk (see uniMaxMix test): epochs_e6 = a 2000000 / b 1250000 / c 500000
    val rows = Sampling.uniMaxApply(fx, budget = 120L, epochCap = 2)
      .groupBy("doc_id", "source").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._2)
    // a: exactly 2 epochs for every doc; no fractional coin (thr 0)
    assert(bySrc("a").length == 10 && bySrc("a").forall(_._3 == 2L))
    // b: 1 or 2 copies; the 2-copy set is exactly the docs whose md5 coin
    // clears ceil(0.25·65536) = 16384
    val thrB = 16384L
    bySrc("b").foreach { case (id, _, n) =>
      val coin = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id:up").take(4), 16)
      assert(n == (if (coin < thrB) 2L else 1L), s"doc $id coin $coin n $n")
    }
    // c: 0 or 1 copies (floor 0) — zero-copy docs are ABSENT, never epoch -1
    assert(bySrc.get("c").forall(_.forall(_._3 == 1L)))
    assert(rows.forall(_._3 > 0))
    // epochs are dense 0..n-1 per doc
    val eps = Sampling.uniMaxApply(fx, budget = 120L, epochCap = 2)
      .filter($"source" === "a").groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.collect_set("epoch").as("es")).collect()
    assert(eps.forall(_.getSeq[Int](1).sorted == Seq(0, 1)))
    // a budget too small for the smallest source's fair share → alloc 0 →
    // that source contributes nothing at all
    val tiny = Sampling.uniMaxApply(fx, budget = 2L, epochCap = 2)
      .filter($"source" === "a").count()
    assert(tiny == 0L)
  }
}
