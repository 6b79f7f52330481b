package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingWindows
import graft.util.MaintenanceLease

/** The maintenance lease turns the documented stopped-writer
  * precondition into an enforced one: a writer racing a maintenance
  * pass must fail loudly in BOTH directions — the writer refuses while
  * a pass owns the layout, and a second pass refuses while the first
  * does. A failed pass leaves the marker (the layout may be
  * mid-mutation); only a successful pass releases it, and every release
  * is owner-compared. Acquisition-race coverage lives in LeaseRaceSpec;
  * this suite pins the contract surfaces. */
class MaintenanceLeaseSpec extends AnyFunSuite {
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

  test("upsertBatch refuses while a maintenance pass holds the lease") {
    withTempDir("graft_lease_upsert") { serving =>
      val b0 = Seq((1L, 1L, 10L)).toDF("user_id", "n_events", "last_us")
      StreamingWindows.upsertBatch(serving)(b0, 0L)
      val token = MaintenanceLease.acquireToken(serving,
        MaintenanceLease.MaintenanceKind, "test-pass")
      val e = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving)(
          Seq((1L, 2L, 20L)).toDF("user_id", "n_events", "last_us"), 1L)
      }
      assert(e.getMessage.contains("maintenance"), e.getMessage)
      // the blocked write must have left NO trace — v1 never assembles
      assert(StreamingWindows.readServingAsOf(spark, serving, 99L).get
        .collect().map(_.getAs[Long]("n_events")).toSeq == Seq(1L))
      // recovery: release, and the same write goes through
      assert(MaintenanceLease.release(serving, token))
      StreamingWindows.upsertBatch(serving)(
        Seq((1L, 2L, 20L)).toDF("user_id", "n_events", "last_us"), 1L)
      assert(StreamingWindows.readServingAsOf(spark, serving, 99L).get
        .collect().map(_.getAs[Long]("n_events")).toSeq == Seq(2L))
    }
  }

  test("a second maintenance pass refuses while the first holds the lease") {
    withTempDir("graft_lease_maint") { serving =>
      StreamingWindows.upsertBatch(serving)(
        Seq((1L, 1L, 10L)).toDF("user_id", "n_events", "last_us"), 0L)
      val token = MaintenanceLease.acquireToken(serving,
        MaintenanceLease.MaintenanceKind, "first-pass")
      intercept[IllegalArgumentException] {
        StreamingWindows.vacuumServing(serving, keepLast = 1)
      }
      intercept[IllegalArgumentException] {
        StreamingWindows.compactServing(spark, serving)
      }
      assert(MaintenanceLease.release(serving, token))
      // the lease CYCLES: a successful pass releases, writers resume
      StreamingWindows.compactServing(spark, serving)
      StreamingWindows.upsertBatch(serving)(
        Seq((2L, 1L, 30L)).toDF("user_id", "n_events", "last_us"), 1L)
      assert(StreamingWindows.readServingSnapshot(spark, serving).get.count() == 2)
    }
  }

  test("writer lease: replay takes over its own crashed marker; maintenance never does") {
    withTempDir("graft_lease_takeover") { serving =>
      StreamingWindows.upsertBatch(serving)(
        Seq((1L, 1L, 10L)).toDF("user_id", "n_events", "last_us"), 0L)
      // a crashed WRITER's marker (owner "writer"): the foreachBatch
      // replay IS the recovery path and must not be blocked by its own
      // wreckage — the write takes over, succeeds, and releases
      graft.util.Fs.writeString(s"$serving/_maintenance_lease", "writer\n")
      StreamingWindows.upsertBatch(serving)(
        Seq((1L, 2L, 20L)).toDF("user_id", "n_events", "last_us"), 1L)
      assert(StreamingWindows.readServingSnapshot(spark, serving).get
        .collect().map(_.getAs[Long]("n_events")).toSeq == Seq(2L))
      assert(!graft.util.Fs.exists(s"$serving/_maintenance_lease"),
        "a successful write releases the lease")
      // but MAINTENANCE must not take over a writer's marker — the
      // writer may be live mid-batch
      graft.util.Fs.writeString(s"$serving/_maintenance_lease", "writer\n")
      intercept[IllegalArgumentException] {
        StreamingWindows.vacuumServing(serving, keepLast = 1)
      }
      MaintenanceLease.forceRelease(serving)
    }
  }

  test("release is owner-compared: a stale holder never deletes a later pass's marker") {
    withTempDir("graft_lease_owner") { layout =>
      val first = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "pass-1")
      // an operator force-releases mid-pass (wrongly) and a second pass acquires
      MaintenanceLease.forceRelease(layout)
      val second = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "pass-2")
      // the stale first holder's release must NOT un-gate pass-2's marker
      assert(!MaintenanceLease.release(layout, first))
      assert(graft.util.Fs.exists(s"$layout/_maintenance_lease"),
        "pass-2's marker must survive pass-1's stale release")
      assert(MaintenanceLease.release(layout, second))
    }
  }

  test("a takeover write's release leaves a maintenance marker installed mid-write") {
    withTempDir("graft_lease_advice1") { layout =>
      // the r18 ADVICE scenario: a crashed writer marker is taken over;
      // mid-write an operator force-releases and a maintenance pass
      // acquires — the write's final release must not delete the pass's
      // marker (before the takeover re-stamp, it did)
      graft.util.Fs.writeString(s"$layout/_maintenance_lease", "writer\n")
      var maintToken: String = null
      MaintenanceLease.withWriterLease(layout, "test-writer") {
        MaintenanceLease.forceRelease(layout)
        maintToken = MaintenanceLease.acquireToken(layout,
          MaintenanceLease.MaintenanceKind, "mid-write-pass")
      }
      assert(graft.util.Fs.exists(s"$layout/_maintenance_lease"),
        "the maintenance pass's marker must survive the write's release")
      assert(MaintenanceLease.release(layout, maintToken))
    }
  }

  test("index appends refuse while a maintenance pass holds the lease") {
    withTempDir("graft_lease_idx") { path =>
      val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text")
      operators.TextAnalysis.writeInvertedIndex(docs, path, buckets = 4)
      val token = MaintenanceLease.acquireToken(path,
        MaintenanceLease.MaintenanceKind, "test-pass")
      val e = intercept[IllegalArgumentException] {
        operators.TextAnalysis.appendToInvertedIndex(
          Seq((3L, "delta epsilon")).toDF("doc_id", "text"), path)
      }
      assert(e.getMessage.contains("appendToInvertedIndex"), e.getMessage)
      assert(MaintenanceLease.release(path, token))
      operators.TextAnalysis.appendToInvertedIndex(
        Seq((3L, "delta epsilon")).toDF("doc_id", "text"), path)
      assert(spark.read.parquet(s"$path/postings")
        .select("doc_id").distinct().count() == 3)
    }
  }

  test("lease age: acquisition is stamped, takeover re-stamps, force-release clears") {
    withTempDir("graft_lease_age") { layout =>
      val t0 = System.currentTimeMillis()
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "aged-pass")
      val held = MaintenanceLease.inspect(layout)
      assert(held.ownerSinceEpochMs.exists(s => s >= t0 &&
        s <= System.currentTimeMillis()), s"stamp in-window: $held")
      assert(held.ownerAgeMillis.exists(_ >= 0L),
        "age must be derivable from the stamp")
      assert(MaintenanceLease.release(layout, token))
      // a WRITER takeover of a crashed marker re-stamps: fresh time,
      // takeover-marked owner — the operator can tell "held 3 s" from
      // "stale 3 days" (reported, never auto-expired)
      graft.util.Fs.writeString(s"$layout/_maintenance_lease", "writer\nx\nold\n1\n")
      assert(MaintenanceLease.inspect(layout).ownerAgeMillis.exists(_ > 1000L),
        "a year-old stamp must read as old")
      val t1 = System.currentTimeMillis()
      MaintenanceLease.withWriterLease(layout, "replayer") {
        val mid = MaintenanceLease.inspect(layout)
        assert(mid.ownerDescription.exists(_.contains("(takeover)")), mid.toString)
        assert(mid.ownerSinceEpochMs.exists(_ >= t1),
          s"takeover must re-stamp the acquisition time: $mid")
      }
      // a hand-written / legacy marker has no stamp: age is None, loud
      // in the status rather than fabricated
      graft.util.Fs.writeString(s"$layout/_maintenance_lease", "writer\n")
      val legacy = MaintenanceLease.inspect(layout)
      assert(legacy.ownerKind.contains("writer") &&
        legacy.ownerSinceEpochMs.isEmpty && legacy.ownerAgeMillis.isEmpty)
      MaintenanceLease.forceRelease(layout)
      val cleared = MaintenanceLease.inspect(layout)
      assert(cleared.ownerKind.isEmpty && cleared.ownerSinceEpochMs.isEmpty)
    }
  }

  test("inspect + forceRelease: the crashed-lease operability surface") {
    withTempDir("graft_lease_inspect") { layout =>
      // clean layout
      val clean = MaintenanceLease.inspect(layout)
      assert(clean.ownerKind.isEmpty && clean.candidates.isEmpty &&
        clean.parkedDirs.isEmpty)
      assert(clean.recovery.contains("clean"))
      // a held lease names its owner
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "inspect-pass")
      val held = MaintenanceLease.inspect(layout)
      assert(held.ownerKind.contains("maintenance"))
      assert(held.ownerDescription.contains("inspect-pass"))
      // a parked dir (crashed mid-swap) blocks forceRelease…
      graft.util.Fs.mkdirs(s"$layout/mh_old_del")
      val crashed = MaintenanceLease.inspect(layout)
      assert(crashed.parkedDirs == Seq("mh_old_del"))
      assert(crashed.recovery.contains("crash"))
      val e = intercept[IllegalArgumentException] {
        MaintenanceLease.forceRelease(layout)
      }
      assert(e.getMessage.contains("mh_old_del"), e.getMessage)
      assert(graft.util.Fs.exists(s"$layout/_maintenance_lease"),
        "a refused forceRelease must not clear the marker")
      // …while STAGING dirs (inert rewrite outputs) do not
      graft.util.Fs.rmTree(s"$layout/mh_old_del")
      graft.util.Fs.mkdirs(s"$layout/.tmp-v3")
      graft.util.Fs.mkdirs(s"$layout/bands_delete_tmp")
      val staged = MaintenanceLease.inspect(layout)
      assert(staged.parkedDirs.isEmpty)
      assert(staged.stagingDirs == Seq(".tmp-v3", "bands_delete_tmp"))
      MaintenanceLease.forceRelease(layout)
      assert(!graft.util.Fs.exists(s"$layout/_maintenance_lease"))
      // forceRelease also sweeps stranded acquisition candidates
      graft.util.Fs.writeString(
        s"$layout/_maintenance_lease.cand.dead-acquirer", "maintenance\nx\n")
      assert(MaintenanceLease.inspect(layout).candidates.nonEmpty)
      MaintenanceLease.forceRelease(layout)
      assert(MaintenanceLease.inspect(layout).candidates.isEmpty)
      // and the swept layout is acquirable again
      val t2 = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "post-recovery")
      assert(MaintenanceLease.release(layout, t2))
      assert(MaintenanceLease.release(layout, token) == false)
    }
  }
}
