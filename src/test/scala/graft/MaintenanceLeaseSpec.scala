package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingWindows

/** The maintenance lease turns the documented stopped-writer
  * precondition into an enforced one: a writer racing a maintenance
  * pass must fail loudly in BOTH directions — the writer refuses while
  * a pass owns the layout, and a second pass refuses while the first
  * does. A failed pass leaves the marker (the layout may be
  * mid-mutation); only a successful pass releases it. */
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
      graft.util.MaintenanceLease.acquire(serving, "test-pass")
      val e = intercept[IllegalArgumentException] {
        StreamingWindows.upsertBatch(serving)(
          Seq((1L, 2L, 20L)).toDF("user_id", "n_events", "last_us"), 1L)
      }
      assert(e.getMessage.contains("maintenance"), e.getMessage)
      // the blocked write must have left NO trace — v1 never assembles
      assert(StreamingWindows.readServingAsOf(spark, serving, 99L).get
        .collect().map(_.getAs[Long]("n_events")).toSeq == Seq(1L))
      // recovery: release, and the same write goes through
      graft.util.MaintenanceLease.release(serving)
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
      graft.util.MaintenanceLease.acquire(serving, "first-pass")
      intercept[IllegalArgumentException] {
        StreamingWindows.vacuumServing(serving, keepLast = 1)
      }
      intercept[IllegalArgumentException] {
        StreamingWindows.compactServing(spark, serving)
      }
      graft.util.MaintenanceLease.release(serving)
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
      graft.util.MaintenanceLease.release(serving)
    }
  }

  test("index appends refuse while a maintenance pass holds the lease") {
    withTempDir("graft_lease_idx") { path =>
      val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text")
      operators.TextAnalysis.writeInvertedIndex(docs, path, buckets = 4)
      graft.util.MaintenanceLease.acquire(path, "test-pass")
      val e = intercept[IllegalArgumentException] {
        operators.TextAnalysis.appendToInvertedIndex(
          Seq((3L, "delta epsilon")).toDF("doc_id", "text"), path)
      }
      assert(e.getMessage.contains("appendToInvertedIndex"), e.getMessage)
      graft.util.MaintenanceLease.release(path)
      operators.TextAnalysis.appendToInvertedIndex(
        Seq((3L, "delta epsilon")).toDF("doc_id", "text"), path)
      assert(spark.read.parquet(s"$path/postings")
        .select("doc_id").distinct().count() == 3)
    }
  }
}
