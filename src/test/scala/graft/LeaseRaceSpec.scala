package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.MaintenanceLease

/** A RawLocalFileSystem re-registered under `racyfs://`. RawLocal's
  * `create(overwrite = false)` is CHECK-THEN-ACT (an exists() probe
  * followed by an open — no kernel-level O_EXCL through the Hadoop
  * API), the same non-atomicity S3A has: the exact substrate on which
  * the r18 lease — built on exclusive create — silently degraded from
  * a mutex to advisory. The r19 write-then-list candidate protocol must
  * give AT MOST ONE winner here with no atomic primitive at all. */
class RacyTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("racyfs:///")
}

/** Two acquirers racing the lease on a filesystem whose exclusive
  * create is check-then-act (see [[RacyTestFs]]): the contract is a
  * SINGLE winner or a LOUD zero-winner failure — never two silent
  * winners. The pathological interleaving (both candidates written
  * before either arbitration list runs) is driven deterministically
  * through the acquisition's test hook rather than hoped-for thread
  * timing. */
class LeaseRaceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.racyfs.impl", classOf[RacyTestFs].getName)
    graft.util.Fs.invalidateConfCache()
    s
  }

  private def withRacyDir[T](body: String => T): T = {
    spark // force scheme registration
    val local = java.nio.file.Files.createTempDirectory("graft_racy").toFile
    try body(s"racyfs://${local.getAbsolutePath}")
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(local)
    }
  }

  /** Run `acquireToken` on its own thread, returning either the token
    * or the failure. */
  private def acquirer(layout: String, owner: String,
      hook: () => Unit, afterList: () => Unit = () => ())
      : (Thread, () => Either[Throwable, String]) = {
    @volatile var out: Either[Throwable, String] = null
    val t = new Thread(() => {
      out =
        try Right(MaintenanceLease.acquireToken(layout,
          MaintenanceLease.MaintenanceKind, owner, hook, afterList))
        catch { case e: Throwable => Left(e) }
    })
    (t, () => out)
  }

  test("symmetric race: both candidates visible before either lists — zero winners, loudly") {
    withRacyDir { layout =>
      graft.util.Fs.mkdirs(layout)
      // both threads write their candidate, then rendezvous BEFORE the
      // arbitration list — each list must see the rival's candidate —
      // and rendezvous AGAIN after listing, before either loser's
      // candidate cleanup: without the second barrier a loser finishing
      // its whole list+cleanup before the rival's list starts yields a
      // single winner (protocol-legal, but not the zero-winner
      // interleaving this test exists to drive — it flaked exactly so
      // under parallel-suite load, r20)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val hook = () => { barrier.await(10, java.util.concurrent.TimeUnit.SECONDS); () }
      val (ta, ra) = acquirer(layout, "acquirer-a", hook, hook)
      val (tb, rb) = acquirer(layout, "acquirer-b", hook, hook)
      ta.start(); tb.start(); ta.join(30000); tb.join(30000)
      val results = Seq(ra(), rb())
      assert(results.forall(_.isLeft),
        s"symmetric contention must produce ZERO winners, got $results")
      results.foreach { r =>
        val msg = r.left.toOption.get.getMessage
        assert(msg.contains("contention") || msg.contains("acquired concurrently"),
          s"the zero-winner outcome must be loud and named: $msg")
      }
      // both losers must have deleted their own candidates and no
      // marker may exist — the layout is immediately acquirable
      val st = MaintenanceLease.inspect(layout)
      assert(st.ownerKind.isEmpty && st.candidates.isEmpty, st)
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "post-race")
      assert(MaintenanceLease.release(layout, token))
    }
  }

  test("asymmetric race: a completed acquire wins; the late rival fails loudly") {
    withRacyDir { layout =>
      graft.util.Fs.mkdirs(layout)
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "winner")
      val e = intercept[IllegalArgumentException] {
        MaintenanceLease.acquireToken(layout,
          MaintenanceLease.MaintenanceKind, "late-rival")
      }
      assert(e.getMessage.contains("exists"), e.getMessage)
      // the loser left no candidate debris; the winner still holds
      val st = MaintenanceLease.inspect(layout)
      assert(st.ownerKind.contains("maintenance") && st.candidates.isEmpty, st)
      assert(MaintenanceLease.release(layout, token))
    }
  }

  test("promotion race: a rival arriving mid-promotion loses to the installed marker") {
    withRacyDir { layout =>
      graft.util.Fs.mkdirs(layout)
      // A's candidate is written and A is about to list; B runs its
      // WHOLE acquisition inside A's hook. B's arbitration list sees
      // A's candidate → B loses; A then promotes cleanly.
      var bOutcome: Either[Throwable, String] = null
      val hook = () => {
        bOutcome =
          try Right(MaintenanceLease.acquireToken(layout,
            MaintenanceLease.MaintenanceKind, "rival-b"))
          catch { case e: Throwable => Left(e) }
        ()
      }
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "holder-a", hook)
      assert(bOutcome.isLeft,
        s"B listed while A's candidate was visible — it must lose: $bOutcome")
      val st = MaintenanceLease.inspect(layout)
      assert(st.ownerKind.contains("maintenance") && st.candidates.isEmpty, st)
      assert(MaintenanceLease.release(layout, token))
    }
  }

  test("a stranded candidate blocks acquisition loudly until forceRelease sweeps it") {
    withRacyDir { layout =>
      graft.util.Fs.mkdirs(layout)
      // simulate an acquirer that crashed between candidate write and
      // promotion (the sub-second window): its candidate remains
      graft.util.Fs.writeString(
        s"$layout/_maintenance_lease.cand.dead", "maintenance\ndead\ncrashed\n")
      val e = intercept[IllegalArgumentException] {
        MaintenanceLease.acquireToken(layout,
          MaintenanceLease.MaintenanceKind, "next-pass")
      }
      assert(e.getMessage.contains("contention"), e.getMessage)
      MaintenanceLease.forceRelease(layout)
      val token = MaintenanceLease.acquireToken(layout,
        MaintenanceLease.MaintenanceKind, "next-pass")
      assert(MaintenanceLease.release(layout, token))
    }
  }
}
