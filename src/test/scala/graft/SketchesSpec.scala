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

  test("persisted HLL shards: union == rebuild, within bound, counts exact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sketch_shards").toFile
    try {
      val events = Tables.events(spark, dir)
      val waves = (0 until 3).map(i =>
        events.filter(col("event_id") % 3 === i))
      waves.zipWithIndex.foreach { case (w, i) =>
        Sketches.writeDistinctShard(w, "event_type", "user_id",
          s"${tmp.getAbsolutePath}/shard$i")
      }
      // a shard artifact is rows ∝ groups, with a binary sketch column
      val shard0 = spark.read.parquet(s"${tmp.getAbsolutePath}/shard0")
      assert(shard0.schema("sketch").dataType ==
        org.apache.spark.sql.types.BinaryType)
      assert(shard0.count() ==
        waves(0).select("event_type").distinct().count())
      val checked = Sketches.distinctShardsChecked(spark,
        (0 until 3).map(i => s"${tmp.getAbsolutePath}/shard$i"),
        events, "event_type", "user_id").collect()
      assert(checked.nonEmpty)
      val exact = events.groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      checked.foreach { r =>
        val et = r.getAs[String]("event_type")
        assert(r.getAs[Long]("n_rows") == exact(et)._1, s"$et summed counts exact")
        assert(r.getAs[Long]("exact_uniques") == exact(et)._2)
        assert(r.getAs[Boolean]("union_within_bound"), s"$et within 5%")
        assert(r.getAs[Boolean]("union_eq_rebuild"),
          s"$et shard-union must equal the one-pass rebuild")
      }
      // dropping a shard must be VISIBLE — the gate the booleans exist
      // for. The events corpus can't show it (every user appears in
      // every wave), so a synthetic corpus plants wave-unique users:
      // ids 0–99 in wave 0, 100–199 in wave 1
      import spark.implicits._
      val synth = (0L until 200L).map(u => ("g", u, u / 100L))
        .toDF("grp", "uid", "wave")
      (0 until 2).foreach(i => Sketches.writeDistinctShard(
        synth.filter(col("wave") === i), "grp", "uid",
        s"${tmp.getAbsolutePath}/synth$i"))
      val partial = Sketches.distinctShardsChecked(spark,
        Seq(s"${tmp.getAbsolutePath}/synth0"), synth, "grp", "uid").collect()
      assert(partial.forall(r => !r.getAs[Boolean]("union_eq_rebuild") &&
        !r.getAs[Boolean]("union_within_bound")),
        "a dropped shard must break both booleans when the shard held unique users")
      val both = Sketches.distinctShardsChecked(spark,
        (0 until 2).map(i => s"${tmp.getAbsolutePath}/synth$i"),
        synth, "grp", "uid").collect()
      assert(both.forall(r => r.getAs[Boolean]("union_eq_rebuild") &&
        r.getAs[Boolean]("union_within_bound")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("persisted KLL quantile shards: union N exact, ranks in band, drops visible") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kll_shards").toFile
    try {
      val events = Tables.events(spark, dir)
      (0 until 3).foreach(i => Sketches.writeQuantileShard(
        events.filter(col("event_id") % 3 === i), "event_type", "value",
        s"${tmp.getAbsolutePath}/shard$i"))
      val paths = (0 until 3).map(i => s"${tmp.getAbsolutePath}/shard$i")
      // the artifact reader: exact row counts + in-band quantiles from
      // the shards alone
      val fromShards = Sketches.quantilesFromShards(spark, paths,
        "event_type", Seq(0.5, 0.95)).collect()
      val exact = events.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        percentile(col("value"), lit(0.46)).as("p46"),
        percentile(col("value"), lit(0.54)).as("p54"),
        percentile(col("value"), lit(0.91)).as("p91"),
        percentile(col("value"), lit(0.99)).as("p99")).collect()
        .map(r => r.getString(0) -> r).toMap
      fromShards.foreach { r =>
        val e = exact(r.getAs[String]("event_type"))
        assert(r.getAs[Long]("n_rows") == e.getAs[Long]("n"))
        assert(r.getAs[Long]("sketch_n") == e.getAs[Long]("n"),
          "the union sketch's update count is exact and order-insensitive")
        assert(r.getAs[Double]("approx_q50") >= e.getAs[Double]("p46") &&
          r.getAs[Double]("approx_q50") <= e.getAs[Double]("p54"))
        assert(r.getAs[Double]("approx_q95") >= e.getAs[Double]("p91") &&
          r.getAs[Double]("approx_q95") <= e.getAs[Double]("p99"))
      }
      // shard ORDER must not matter (merge is commutative): reversed
      // paths give the same exact N per group
      val rev = Sketches.quantilesFromShards(spark, paths.reverse,
        "event_type", Seq(0.5)).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("sketch_n")).toMap
      fromShards.foreach(r => assert(
        rev(r.getAs[String]("event_type")) == r.getAs[Long]("sketch_n")))
      // the checked reader passes every contract on the full corpus
      val checked = Sketches.quantileShardsChecked(spark, paths, events,
        "event_type", "value").collect()
      assert(checked.nonEmpty)
      checked.foreach { r =>
        assert(r.getAs[Boolean]("union_n_eq_rebuild"))
        assert(r.getAs[Boolean]("p50_within_bound") &&
          r.getAs[Boolean]("p95_within_bound"))
        assert(r.getAs[Boolean]("rebuild_p50_within_bound") &&
          r.getAs[Boolean]("rebuild_p95_within_bound"))
      }
      // a dropped shard must be VISIBLE: a synthetic corpus whose
      // wave-1 values dominate the upper tail — losing that shard
      // breaks the N pin AND pulls p95 out of band
      import spark.implicits._
      val synth = (0L until 300L).map(i => ("g", i.toDouble, i / 150L))
        .toDF("grp", "v", "wave")
      (0 until 2).foreach(i => Sketches.writeQuantileShard(
        synth.filter(col("wave") === i), "grp", "v",
        s"${tmp.getAbsolutePath}/qsynth$i"))
      val partial = Sketches.quantileShardsChecked(spark,
        Seq(s"${tmp.getAbsolutePath}/qsynth0"), synth, "grp", "v").collect()
      assert(partial.forall(r => !r.getAs[Boolean]("union_n_eq_rebuild") &&
        !r.getAs[Boolean]("p95_within_bound")),
        "a dropped shard must break the N pin and the upper-tail band")
      // an all-NULL group has an empty sketch and NULL exact
      // percentiles — its contract booleans must be DEFINED (true, the
      // n==0 case bounds nothing), never three-valued NULL (r18 ADVICE)
      val withNulls = ((1 to 100).map(i => ("a", Some(i.toDouble))) ++
        Seq(("b", Option.empty[Double]), ("b", Option.empty[Double])))
        .toDF("grp", "v")
      Sketches.writeQuantileShard(withNulls, "grp", "v",
        s"${tmp.getAbsolutePath}/nullshard")
      val nullChecked = Sketches.quantileShardsChecked(spark,
        Seq(s"${tmp.getAbsolutePath}/nullshard"), withNulls, "grp", "v")
        .collect().map(r => r.getAs[String]("grp") -> r).toMap
      val b = nullChecked("b")
      assert(!b.isNullAt(b.fieldIndex("p50_within_bound")) &&
        b.getAs[Boolean]("p50_within_bound") &&
        b.getAs[Boolean]("p95_within_bound") &&
        b.getAs[Boolean]("rebuild_p50_within_bound") &&
        b.getAs[Boolean]("rebuild_p95_within_bound") &&
        b.getAs[Boolean]("union_n_eq_rebuild"),
        "all-NULL group booleans must be literal TRUE, not NULL")
      assert(nullChecked("a").getAs[Boolean]("p50_within_bound"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("shard compaction: one artifact at the max id, both contracts invisible, appendable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_shards").toFile
    try {
      val events = Tables.events(spark, dir)
      val hllDir = s"${tmp.getAbsolutePath}/hll"
      val kllDir = s"${tmp.getAbsolutePath}/kll"
      (0 until 3).foreach { i =>
        Sketches.writeDistinctShard(events.filter(col("event_id") % 3 === i),
          "event_type", "user_id", s"$hllDir/shard$i")
        Sketches.writeQuantileShard(events.filter(col("event_id") % 3 === i),
          "event_type", "value", s"$kllDir/shard$i")
      }
      val before = Sketches.distinctFromShards(spark,
        Sketches.shardPaths(hllDir), "event_type").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any](2))).toMap
      // a digits-only stranger dir must never parse as a shard (it
      // would be read, parked, and deleted as if it were a wave)
      graft.util.Fs.mkdirs(s"$hllDir/20260816")
      assert(!Sketches.shardPaths(hllDir).exists(_.endsWith("20260816")))
      Sketches.compactDistinctShards(spark, hllDir, "event_type")
      Sketches.compactQuantileShards(spark, kllDir, "event_type")
      assert(graft.util.Fs.exists(s"$hllDir/20260816"),
        "compaction must leave non-shard dirs untouched")
      // structure: exactly ONE live artifact survives (seq-named merge,
      // carrying the MAX wave id in the manifest), and the old wave
      // dirs are gone from disk
      assert(Sketches.shardPaths(hllDir).map(_.split("/").last) == Seq("merged3"))
      assert(Sketches.shardPaths(kllDir).map(_.split("/").last) == Seq("merged3"))
      assert((0 until 3).forall(i => !graft.util.Fs.exists(s"$hllDir/shard$i")),
        "compacted wave dirs must be reclaimed")
      // HLL: union is associative — counts and estimates identical
      val after = Sketches.distinctFromShards(spark,
        Sketches.shardPaths(hllDir), "event_type").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any](2))).toMap
      assert(after == before, "compaction must be invisible to the reader")
      // both checked contracts hold verbatim over the compacted artifact
      Sketches.distinctShardsChecked(spark, Sketches.shardPaths(hllDir),
        events, "event_type", "user_id").collect().foreach { r =>
        assert(r.getAs[Boolean]("union_within_bound") &&
          r.getAs[Boolean]("union_eq_rebuild"))
      }
      Sketches.quantileShardsChecked(spark, Sketches.shardPaths(kllDir),
        events, "event_type", "value").collect().foreach { r =>
        assert(r.getAs[Boolean]("union_n_eq_rebuild") &&
          r.getAs[Boolean]("p50_within_bound") &&
          r.getAs[Boolean]("p95_within_bound"))
      }
      // appendable: a LATER wave (batch id past the compacted one)
      // unions against the compacted artifact like any other shard —
      // here a re-profile of wave 0 doubles its rows in the sum
      Sketches.writeDistinctShard(events.filter(col("event_id") % 3 === 0),
        "event_type", "user_id", s"$hllDir/shard3")
      val wave0 = events.filter(col("event_id") % 3 === 0)
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val appended = Sketches.distinctFromShards(spark,
        Sketches.shardPaths(hllDir), "event_type").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      appended.foreach { case (k, n) =>
        assert(n == after(k)._1 + wave0.getOrElse(k, 0L),
          s"appended partial counts must sum on top of the compacted shard for $k")
      }
      // a compaction attempt mid-lease refuses in both directions
      val token = graft.util.MaintenanceLease.acquireToken(hllDir,
        graft.util.MaintenanceLease.MaintenanceKind, "test-pass")
      intercept[IllegalArgumentException] {
        Sketches.compactDistinctShards(spark, hllDir, "event_type")
      }
      intercept[IllegalArgumentException] {
        Sketches.writeDistinctShard(events.limit(1), "event_type",
          "user_id", s"$hllDir/shard4")
      }
      assert(graft.util.MaintenanceLease.release(hllDir, token))
      // a LEGACY parked dir (pre-manifest crash) refuses a fresh compaction
      graft.util.Fs.mkdirs(s"$kllDir/shards_old_compact")
      val e = intercept[IllegalArgumentException] {
        Sketches.compactQuantileShards(spark, kllDir, "event_type")
      }
      assert(e.getMessage.contains("crashed mid-swap"), e.getMessage)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("shard manifest: readers stay consistent mid-compaction; unlisted dirs are invisible") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_shard_manifest").toFile
    try {
      import spark.implicits._
      val root = s"${tmp.getAbsolutePath}/shards"
      // wave-unique users, so a partial or double set is NUMERICALLY
      // visible in the union estimate, not just in n_rows
      val synth = (0L until 300L).map(u => ("g", u, u / 100L))
        .toDF("grp", "uid", "wave")
      (0 until 3).foreach(i => Sketches.writeDistinctShard(
        synth.filter(col("wave") === i), "grp", "uid", s"$root/shard$i"))
      def read(): (Int, Map[String, (Long, Any)]) = {
        val paths = Sketches.shardPaths(root)
        (paths.size, Sketches.distinctFromShards(spark, paths, "grp")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Any](2))).toMap)
      }
      val pre = read()
      assert(pre._1 == 3 && pre._2("g")._1 == 300L)
      // a dir on disk that no manifest stamp lists — a half-landed wave,
      // a stranger — must be INVISIBLE to the resolver
      synth.filter(col("wave") === 0).groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), hll_sketch_agg(col("uid")).as("sketch"))
        .coalesce(1).write.parquet(s"$root/shard99")
      assert(read() == pre, "an uncommitted shard dir must not be read")
      graft.util.Fs.rmTree(s"$root/shard99")
      // the two compaction windows a concurrent reader can land in:
      // merge installed / manifest not yet swapped -> the PRE set;
      // manifest swapped / old dirs not yet deleted -> the POST set —
      // never a partial or double set (the r19 verdict's #1)
      var post: (Int, Map[String, (Long, Any)]) = null
      Sketches.compactDistinctShardsHooked(spark, root, "grp",
        afterInstall = () => {
          assert(graft.util.Fs.listChildren(root).exists(_._1.startsWith("merged")),
            "the merge must be on disk before the swap")
          assert(read() == pre,
            "a reader between install and swap must resolve the complete PRE set")
        },
        afterSwap = () => {
          assert((0 until 3).forall(i => graft.util.Fs.exists(s"$root/shard$i")),
            "old dirs must still be on disk at the swap instant")
          post = read()
          assert(post._1 == 1 && post._2 == pre._2,
            "a reader after the swap must resolve the complete POST set " +
              "with identical answers (associative union)")
        })
      assert(read() == post)
      assert((0 until 3).forall(i => !graft.util.Fs.exists(s"$root/shard$i")))
      // post-swap-crash garbage (an old dir the deletes never reached)
      // is swept by the next run — even a no-op one — not re-merged
      synth.filter(col("wave") === 0).groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), hll_sketch_agg(col("uid")).as("sketch"))
        .coalesce(1).write.parquet(s"$root/shard0")
      assert(read() == post, "garbage is invisible to readers")
      Sketches.compactDistinctShards(spark, root, "grp") // 1 live entry: no-op + sweep
      assert(!graft.util.Fs.exists(s"$root/shard0"), "garbage swept")
      assert(read() == post)
      // and the compacted root stays APPENDABLE through the manifest
      Sketches.writeDistinctShard(synth.filter(col("wave") === 0),
        "grp", "uid", s"$root/shard3")
      val appended = read()
      assert(appended._1 == 2 && appended._2("g")._1 == 400L)
      // a REPLAY of a committed wave never overwrites its live dir in
      // place (a reader mid-rewrite would silently read the union minus
      // that wave): it lands under a fresh .r<seq> dir, the manifest
      // entry flips, the superseded dir deletes, answers unchanged
      Sketches.writeDistinctShard(synth.filter(col("wave") === 0),
        "grp", "uid", s"$root/shard3")
      assert(!graft.util.Fs.exists(s"$root/shard3"),
        "the replayed wave's superseded dir must be reclaimed")
      assert(Sketches.shardPaths(root).exists(_.contains("shard3.r")),
        s"replay must land under a fresh dir: ${Sketches.shardPaths(root)}")
      assert(read() == appended, "a replay is invisible to readers")
      // a wave id already merged into a compacted artifact REFUSES —
      // committing it would replace the merge (and every wave inside
      // it) in the live set; the merged artifact here carries max id 2
      val eMerged = intercept[IllegalArgumentException] {
        Sketches.writeDistinctShard(synth.filter(col("wave") === 0),
          "grp", "uid", s"$root/shard2")
      }
      assert(eMerged.getMessage.contains("already lives in"), eMerged.getMessage)
      assert(read() == appended, "a refused replay must change nothing")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
