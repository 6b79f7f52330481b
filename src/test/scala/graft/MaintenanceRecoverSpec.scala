package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.util.{Fs, MaintenanceLease}

/** MaintenanceLease.recover must be the EXECUTABLE form of every
  * parking pass's documented crash recovery (the r19 verdict's
  * "recovery is prose, not code"): for each pass, this suite crashes
  * it at EVERY rename boundary (a counted fault injected through
  * Fs.beforeMove — the same interleaving-hook posture as
  * LeaseRaceSpec), runs recover, retries the pass with the same
  * inputs, and requires the pass's own oracle to hold — so the rule
  * recover executes is proven at every crash point, not just the ones
  * a hand recovery happened to exercise. */
class MaintenanceRecoverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withTempDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    try body(dir.getAbsolutePath)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  private class InjectedCrash extends RuntimeException("injected crash")

  /** Run `pass`, crashing the k-th rename under `root` (k = 1-based;
    * k = 0 runs clean). Returns how many renames under `root` the run
    * attempted (including the crashed one). The hook filters on the
    * layout root so concurrently-running suites' moves pass through. */
  private def crashAtMove(root: String, k: Int)(pass: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    Fs.beforeMove = (src, dst) =>
      if (src.startsWith(root) || dst.startsWith(root)) {
        val i = n.incrementAndGet()
        if (k > 0 && i == k) throw new InjectedCrash
      }
    try {
      if (k > 0) intercept[InjectedCrash](pass) else pass
      n.get()
    } finally Fs.beforeMove = (_, _) => ()
  }

  /** The full per-pass drill: learn the clean run's rename count on a
    * fresh layout, then for every boundary k rebuild, crash at k,
    * recover, retry, and check the oracle. */
  private def drill(prefix: String)(build: String => Unit)(
      pass: String => Unit)(oracle: String => Unit): Unit = {
    val totalMoves = withTempDir(prefix) { root =>
      build(root)
      val moves = crashAtMove(root, 0)(pass(root))
      oracle(root) // the clean run itself must satisfy the oracle
      moves
    }
    assert(totalMoves >= 2, s"$prefix: expected a multi-rename swap, got $totalMoves")
    (1 to totalMoves).foreach { k =>
      withTempDir(s"${prefix}_k$k") { root =>
        build(root)
        crashAtMove(root, k)(pass(root))
        assert(Fs.exists(s"$root/_maintenance_lease"),
          s"crash at rename $k must leave the lease marker")
        if (k == 1) {
          // the liveness guard: this marker is seconds old, so an
          // UN-forced recovery must refuse (the owning pass might
          // merely be slow) — the spec plays the operator who just
          // killed it, hence force below
          val e = intercept[IllegalArgumentException](
            MaintenanceLease.recover(root))
          assert(e.getMessage.contains("LIVE"), e.getMessage)
        }
        MaintenanceLease.recover(root, force = true)
        assert(!Fs.exists(s"$root/_maintenance_lease"),
          s"recover must release after restoring (crash at rename $k)")
        assert(MaintenanceLease.inspect(root).parkedDirs.isEmpty,
          s"recover must clear every park (crash at rename $k)")
        pass(root) // retry with the SAME inputs
        oracle(root)
      }
    }
  }

  test("recover: MinHash-index delete crashed at every rename boundary") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "beta gamma delta epsilon zeta"),
      (3L, "gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    drill("graft_rec_mh") { root =>
      operators.Dedup.writeMinHashIndex(docs, root, n = 3, numHashes = 8,
        bands = 4)
    } { root =>
      operators.Dedup.deleteFromMinHashIndex(spark, root,
        Seq(2L).toDF("doc_id"), outFiles = 2)
    } { root =>
      Seq("bands", "grams").foreach { sub =>
        assert(spark.read.parquet(s"$root/$sub").select("doc_id")
          .distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L),
          s"$sub must hold exactly the survivors")
      }
    }
  }

  test("recover: inverted-index delete crashed at every rename boundary") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "delta epsilon")).toDF("doc_id", "text")
    // the manifest counters are the reason recover must restore the
    // FULL pre-delete state (not just missing pieces): a retry against
    // a half-installed table would under-decrement them
    drill("graft_rec_inv") { root =>
      operators.TextAnalysis.writeInvertedIndex(docs, root, buckets = 4)
    } { root =>
      operators.TextAnalysis.deleteFromInvertedIndex(spark, root,
        Seq(2L).toDF("doc_id"))
    } { root =>
      assert(spark.read.parquet(s"$root/postings").select("doc_id")
        .distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L))
      val m = spark.read.parquet(s"$root/manifest").head()
      assert(m.getAs[Long]("n_docs") == 2L, "manifest n_docs must decrement exactly once")
      assert(m.getAs[Long]("sum_dl") == 3L + 2L,
        "manifest sum_dl must equal the survivors' lengths")
    }
  }

  test("recover: IVF-index delete crashed at every rename boundary") {
    val emb = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 40L)
    val doomed = Seq(3L, 7L, 11L).toDF("vec_id")
    drill("graft_rec_ivf") { root =>
      operators.Similarity.writeIvfIndex(emb, root, nCells = 4)
    } { root =>
      operators.Similarity.deleteFromIvfIndex(spark, root, doomed)
    } { root =>
      val left = spark.read.parquet(s"$root/cells").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(left == (0L until 40L).toSet -- Set(3L, 7L, 11L),
        "cells must hold exactly the surviving vectors")
    }
  }

  test("recover: legacy shard-compaction park is marker-keyed") {
    // the pre-manifest compaction parked old shard dirs and keyed its
    // recovery on an _install_complete marker INSIDE the park; the
    // manifest-swapped protocol parks nothing, so these states only
    // arise from a layout that crashed under the old binary —
    // hand-built here exactly as that binary left them
    val waves = (0 until 3).map(i =>
      (0L until 300L).map(u => ("g", u, u / 100L)).toDF("grp", "uid", "wave")
        .filter(col("wave") === i))
    def shardOf(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      df.groupBy("grp").agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col("uid")).as("sketch"))
        .coalesce(1).write.parquet(path)
    def uniques(root: String): (Long, Long) = {
      val r = operators.Sketches.distinctFromShards(spark,
        operators.Sketches.shardPaths(root), "grp").head()
      (r.getAs[Long]("n_rows"), r.getAs[Long]("approx_uniques"))
    }
    // marker ABSENT: the install did not complete — a live shard2 is a
    // partial rename remnant (delete it, restore every parked dir)
    withTempDir("graft_rec_legacy_absent") { root =>
      (0 until 2).foreach(i => shardOf(waves(i), s"$root/shard$i"))
      Fs.mkdirs(s"$root/shards_old_compact")
      shardOf(waves(2), s"$root/shards_old_compact/shard2")
      shardOf(waves(2).limit(10), s"$root/shard2") // the remnant
      Fs.mkdirs(s"$root/.tmp-compact-shards")
      Fs.writeString(s"$root/_maintenance_lease", "maintenance\nx\ncrashed\n")
      MaintenanceLease.recover(root)
      assert(!Fs.exists(s"$root/shards_old_compact") &&
        !Fs.exists(s"$root/.tmp-compact-shards") &&
        !Fs.exists(s"$root/_maintenance_lease"))
      assert(uniques(root) == ((300L, 300L)),
        "restored waves must answer the full corpus")
      // and the retry (the NEW manifest-swapped pass) compacts cleanly
      operators.Sketches.compactDistinctShards(spark, root, "grp")
      assert(operators.Sketches.shardPaths(root).size == 1)
      assert(uniques(root) == ((300L, 300L)))
    }
    // marker PRESENT: the install landed — the park deletes (restoring
    // would double-count its waves beside the merge that contains them)
    withTempDir("graft_rec_legacy_present") { root =>
      shardOf(waves(0).unionByName(waves(1)).unionByName(waves(2)),
        s"$root/shard2") // the landed merge, at the old max-id name
      Fs.mkdirs(s"$root/shards_old_compact")
      (0 until 3).foreach(i =>
        shardOf(waves(i), s"$root/shards_old_compact/shard$i"))
      Fs.writeString(
        s"$root/shards_old_compact/${operators.Sketches.InstallCompleteMarker}",
        "installed\n")
      Fs.writeString(s"$root/_maintenance_lease", "maintenance\nx\ncrashed\n")
      MaintenanceLease.recover(root)
      assert(!Fs.exists(s"$root/shards_old_compact"))
      assert(operators.Sketches.shardPaths(root).map(_.split("/").last)
        == Seq("shard2"), "the landed merge must be untouched")
      assert(uniques(root) == ((300L, 300L)))
    }
  }

  test("recover: a marker-sealed park deletes WITHOUT restoring (no double-decrement)") {
    // the r20 review #1 scenario: the pass fully installed (manifest
    // already decremented) and crashed INSIDE the park teardown — the
    // marker-last teardown guarantees any surviving park still carries
    // the marker, and recover must treat its contents as stale
    // displaced state, never restore them (a restore would put the
    // deleted doc's postings back beside the decremented manifest, and
    // the mandated retry would decrement AGAIN)
    withTempDir("graft_rec_sealed") { root =>
      val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"),
        (3L, "delta epsilon")).toDF("doc_id", "text")
      operators.TextAnalysis.writeInvertedIndex(docs, root, buckets = 4)
      val preManifest = spark.read.parquet(s"$root/manifest").head()
      operators.TextAnalysis.deleteFromInvertedIndex(spark, root,
        Seq(2L).toDF("doc_id")) // completes: manifest decremented, park gone
      // reconstruct the teardown-crash state: park with the marker and
      // a stale piece (the pre-delete manifest, the worst one to restore)
      val park = s"$root/postings_old_del"
      Fs.mkdirs(park)
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(preManifest.getAs[Long]("n_docs"),
          preManifest.getAs[Long]("sum_dl"), preManifest.getAs[Int]("buckets")))),
        preManifest.schema).coalesce(1).write.parquet(s"$park/manifest")
      Fs.writeString(s"$park/_install_complete", "installed\n")
      Fs.writeString(s"$root/_maintenance_lease", "maintenance\nx\ncrashed\n")
      MaintenanceLease.recover(root)
      assert(!Fs.exists(park) && !Fs.exists(s"$root/_maintenance_lease"))
      val m = spark.read.parquet(s"$root/manifest").head()
      assert(m.getAs[Long]("n_docs") == 2L && m.getAs[Long]("sum_dl") == 5L,
        "recover must NOT restore a sealed park's stale manifest")
      // the mandated retry is a no-op on the already-deleted set
      operators.TextAnalysis.deleteFromInvertedIndex(spark, root,
        Seq(2L).toDF("doc_id"))
      val m2 = spark.read.parquet(s"$root/manifest").head()
      assert(m2.getAs[Long]("n_docs") == 2L && m2.getAs[Long]("sum_dl") == 5L,
        "retry after a sealed-park recovery must not double-decrement")
    }
  }

  test("recover: unknown park refuses; re-running after a mid-recovery crash completes") {
    withTempDir("graft_rec_unknown") { root =>
      Fs.mkdirs(s"$root/future_pass_old_del")
      val e = intercept[IllegalArgumentException](MaintenanceLease.recover(root))
      assert(e.getMessage.contains("future_pass_old_del"), e.getMessage)
      assert(Fs.exists(s"$root/future_pass_old_del"),
        "an unknown park must stay blocked, not be guessed at")
      // even a MARKED unknown park refuses: this build cannot know the
      // owning pass follows the marker convention
      Fs.writeString(s"$root/future_pass_old_del/_install_complete", "x\n")
      intercept[IllegalArgumentException](MaintenanceLease.recover(root))
      assert(Fs.exists(s"$root/future_pass_old_del"))
      Fs.rmTree(s"$root/future_pass_old_del")
    }
    // crash recover ITSELF mid-restore: the parked piece moves back only
    // after its live twin is deleted, so a second recover completes
    withTempDir("graft_rec_rerun") { root =>
      val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text")
      operators.Dedup.writeMinHashIndex(docs, root, n = 3, numHashes = 8,
        bands = 4)
      // crash at rename 2: bands is parked, grams still live — the park
      // holds a piece recover must move back
      crashAtMove(root, 2)(operators.Dedup.deleteFromMinHashIndex(spark,
        root, Seq(2L).toDF("doc_id"), outFiles = 2))
      // first recover crashes on its own first restore rename (forced:
      // the marker is seconds old and the spec IS the operator who
      // killed the pass)
      crashAtMove(root, 1)(MaintenanceLease.recover(root, force = true))
      assert(MaintenanceLease.inspect(root).parkedDirs.nonEmpty,
        "a crashed recovery must leave the park (and so stay blocked)")
      MaintenanceLease.recover(root, force = true)
      operators.Dedup.deleteFromMinHashIndex(spark, root,
        Seq(2L).toDF("doc_id"), outFiles = 2)
      Seq("bands", "grams").foreach { sub =>
        assert(spark.read.parquet(s"$root/$sub").select("doc_id")
          .distinct().collect().map(_.getLong(0)).toSet == Set(1L))
      }
    }
  }
}
