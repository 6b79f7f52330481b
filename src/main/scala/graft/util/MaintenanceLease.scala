package graft.util

/** Single-writer enforcement for the persisted layouts' maintenance
  * passes. Every compact / expire / vacuum / index-delete documents the
  * same precondition — run inside a stopped-writer window — but until
  * r17 nothing ENFORCED it: a racing foreachBatch replay against a
  * mid-vacuum serving table would corrupt quietly instead of failing
  * loudly. The lease makes the violated precondition an error in both
  * directions:
  *
  *  - a maintenance pass ACQUIRES `_maintenance_lease` at the layout
  *    root before mutating (a concurrent second pass fails to acquire
  *    and stops);
  *  - every writer (serving upserts, index appends) checks the marker
  *    and refuses to write while it exists.
  *
  * ACQUISITION PROTOCOL (write-then-list, no atomic-create needed).
  * `FileSystem.create(overwrite = false)` — the r18 primitive — is
  * namenode-arbitrated on HDFS but CHECK-THEN-WRITE on S3A and on
  * RawLocalFileSystem, so two concurrent acquirers could both "win"
  * off HDFS: exactly the race the lease exists to close, reopened
  * silently. The stamped-candidate scheme closes it with plain writes
  * only (the changefeed horizon's posture applied to mutual
  * exclusion):
  *
  *  1. refuse if the marker exists (held, or crashed-and-unrecovered);
  *  2. write a uniquely-named CANDIDATE `_maintenance_lease.cand.<uuid>`
  *     (unique name — plain write, no exclusivity required);
  *  3. LIST the layout root: if the marker appeared, or ANY other
  *     candidate is visible, delete our own candidate and fail loudly;
  *  4. sole visible candidate → PROMOTE: write the marker, then delete
  *     the candidate (marker first — a late rival's list always sees
  *     our candidate or our marker).
  *
  * At most one acquirer can ever observe itself as the sole candidate:
  * if A's list shows no rival, every rival's candidate-write completed
  * after A's list, so every rival's own list (which follows its write)
  * runs after A's — and at that point A's candidate still exists or
  * A's marker already does (step 4's ordering). Symmetric contention
  * can make BOTH lose — a loud zero-winner outcome, never two silent
  * winners. The guarantee needs only read-after-write consistency and
  * listings that reflect completed writes — which HDFS, local disk,
  * and S3 (strongly consistent since 2020), GCS and ABFS all provide.
  * LeaseRaceSpec drives the pathological interleaving deterministically
  * on a filesystem whose exclusive create IS check-then-act.
  *
  * A candidate stranded by an acquirer that crashed between steps 2
  * and 4 (a sub-second window) blocks later acquisitions LOUDLY —
  * [[inspect]] names it and [[forceRelease]] clears it.
  *
  * The lease releases only on SUCCESS. A failed or crashed pass leaves
  * it in place deliberately: the layout may be mid-mutation (the parked
  * dirs / temp dirs say exactly where), and writers must stay blocked
  * until an operator recovers and removes the marker — the same loud-
  * over-quiet posture as the parked-dir crash protocol. Recovery goes
  * through [[inspect]] (who owns it, what is parked, what to do) and
  * [[forceRelease]] (refuses while parked dirs exist). Every release
  * is OWNER-COMPARED: the marker carries the holder's token, and a
  * release deletes it only if the token is the releaser's own — a
  * stale holder can never delete the marker a later pass owns. Readers
  * are NOT gated: every layout's install order (manifest-last,
  * park-first) keeps concurrent reads consistent mid-pass.
  *
  * This is the plain-parquet reproduction of a table format's
  * commit-conflict detection (Delta/Iceberg reject the losing writer at
  * commit time); with no transaction log to race on, the marker file is
  * the smallest mechanism that turns a silent corruption into an error. */
object MaintenanceLease {

  private[graft] val MarkerName = "_maintenance_lease"
  private val CandidatePrefix = s"$MarkerName.cand."

  private[graft] val MaintenanceKind = "maintenance"
  private[graft] val WriterKind = "writer"

  private def marker(layoutPath: String) = s"$layoutPath/$MarkerName"

  /** marker / candidate content → (kind, token). Content is
    * `<kind>\n<token>\n<description>`; a hand-written or legacy marker
    * (`writer\n`) parses with an empty token. */
  private def parse(content: String): (String, String) = {
    val lines = content.split("\n", -1)
    (lines.headOption.getOrElse("?").trim,
      lines.drop(1).headOption.getOrElse("").trim)
  }

  private def readMarkerKind(layoutPath: String): String =
    try parse(Fs.readString(marker(layoutPath)))._1
    catch { case _: java.io.IOException => "?" }

  /** Take the lease via the write-then-list candidate protocol (object
    * store safe — see the object scaladoc); fails loudly if any holder
    * — live or crashed — still owns it, or if a concurrent acquirer's
    * candidate is visible (contention: possibly zero winners, never
    * two). Returns the holder token [[release]] requires.
    * `afterCandidateWrite` is LeaseRaceSpec's interleaving hook. */
  private[graft] def acquireToken(layoutPath: String, kind: String,
      owner: String, afterCandidateWrite: () => Unit = () => ()): String = {
    val m = marker(layoutPath)
    require(!Fs.exists(m),
      s"$m exists (owner kind: ${readMarkerKind(layoutPath)}) — a " +
        "maintenance pass or writer is running or crashed mid-run; " +
        "recover the layout (MaintenanceLease.inspect names the owner, " +
        "parked dirs, and steps), then MaintenanceLease.forceRelease")
    val token = java.util.UUID.randomUUID().toString
    val cand = s"$layoutPath/$CandidatePrefix$token"
    // a failure OF THE CANDIDATE WRITE (disk full, quota, transient
    // store error) must not strand a half-written candidate that every
    // later acquirer — including this stream's own next batch — would
    // read as a rival and wedge on (the r18 createExclusive kept the
    // same self-cleanup)
    try Fs.writeString(cand, s"$kind\n$token\n$owner\n")
    catch {
      case e: Throwable =>
        // the cleanup must never REPLACE the original failure (Hadoop
        // clients surface RuntimeExceptions too, not just IOException)
        // — swallow anything non-fatal, attach it, rethrow the cause
        try Fs.deleteIfExists(cand)
        catch {
          case c: Throwable if scala.util.control.NonFatal(c) =>
            e.addSuppressed(c)
        }
        throw e
    }
    afterCandidateWrite()
    val visible = Fs.listChildren(layoutPath)
      .collect { case (name, false) if name.startsWith(MarkerName) => name }
    val promoted = visible.contains(MarkerName)
    val rivals = visible.filter(n =>
      n.startsWith(CandidatePrefix) && n != s"$CandidatePrefix$token")
    if (promoted || rivals.nonEmpty) {
      Fs.deleteIfExists(cand)
      require(false,
        if (promoted) s"$m was acquired concurrently — lost the race; " +
          "retry once the holder releases"
        else s"lease contention at $layoutPath: concurrent acquirer " +
          s"candidate(s) ${rivals.mkString(", ")} visible — neither " +
          "proceeds (loud zero-winner outcome); retry")
    }
    // sole visible candidate: promote. Marker BEFORE candidate deletion —
    // a late rival's arbitration list always sees one of the two.
    Fs.writeString(m, s"$kind\n$token\n$owner\n")
    Fs.deleteIfExists(cand)
    token
  }

  /** Owner-compared release: deletes the marker and returns true only
    * if it still carries `token`; returns false (marker untouched) if
    * the marker is gone or owned by someone else — a stale holder must
    * never un-gate writers under a pass it does not own. */
  private[graft] def release(layoutPath: String, token: String): Boolean = {
    val m = marker(layoutPath)
    if (!Fs.exists(m)) false
    else {
      val owned =
        try parse(Fs.readString(m))._2 == token
        catch { case _: java.io.IOException => false }
      if (owned) Fs.deleteIfExists(m)
      owned
    }
  }

  /** Run one maintenance pass under the lease. Released only when
    * `body` SUCCEEDS — a throw leaves the marker as the loud signal
    * that the layout needs inspection before any writer resumes. */
  private[graft] def withLease[T](layoutPath: String, owner: String)(body: => T): T = {
    val token = acquireToken(layoutPath, MaintenanceKind, owner)
    val out = body
    require(release(layoutPath, token),
      s"${marker(layoutPath)} no longer carries this pass's token — " +
        "it was force-released and possibly re-acquired mid-pass; the " +
        "layout needs inspection (MaintenanceLease.inspect)")
    out
  }

  /** Writer-side lease, HELD for the duration of one write (a one-shot
    * check would leave the write's whole multi-job span exposed to a
    * pass acquiring right after it — r18 review #3). Ownership rules:
    *
    *  - marker absent → take it (candidate protocol);
    *  - marker owned by a MAINTENANCE pass → fail loudly (writing now
    *    would race its renames);
    *  - marker owned by `writer` → TAKE OVER: it is this layout's
    *    single writer's own crashed prior attempt, and the replay now
    *    running IS the recovery path (foreachBatch re-delivers the
    *    batch; the layouts' id anti-joins / versioned assembly make it
    *    idempotent) — blocking it on its own wreckage would wedge the
    *    stream. The takeover RE-STAMPS the marker with this attempt's
    *    own token (r18 ADVICE: proceeding under the crashed marker let
    *    the final release delete a marker some other pass had since
    *    installed). Two concurrent writers are outside every layout's
    *    contract (one stream, one table), which is what makes the
    *    takeover read-then-restamp safe.
    *
    * Released on success OR failure: a failed write leaves no
    * half-mutated shared state (versions assemble in temp dirs,
    * appends are replay-absorbed), so unlike a maintenance pass there
    * is nothing for a lingering marker to guard. The release is owner-
    * compared like every other: if the marker no longer carries this
    * write's token (an operator force-released mid-write and a
    * maintenance pass acquired), it is left alone. */
  private[graft] def withWriterLease[T](layoutPath: String,
      writer: String)(body: => T): T = {
    val m = marker(layoutPath)
    val token =
      if (Fs.exists(m)) {
        val kind = readMarkerKind(layoutPath)
        require(kind == WriterKind,
          s"$writer refused: $m exists (owner kind: $kind) — a maintenance " +
            "pass owns this layout (or crashed mid-run); writing now " +
            "would race its renames and corrupt the layout " +
            "(MaintenanceLease.inspect / forceRelease to recover)")
        val t = java.util.UUID.randomUUID().toString
        Fs.writeString(m, s"$WriterKind\n$t\n$writer (takeover)\n")
        t
      } else acquireToken(layoutPath, WriterKind, writer)
    try body finally { release(layoutPath, token); () }
  }

  /** Everything an operator needs to recover a wedged layout, in one
    * read: the marker's owner (kind + free-text description), any
    * stranded acquisition candidates, the parked / temp dirs a crashed
    * pass left (which name the pass — see each operator's crash
    * protocol), and the recovery steps. */
  case class LeaseStatus(ownerKind: Option[String],
      ownerDescription: Option[String], candidates: Seq[String],
      parkedDirs: Seq[String], stagingDirs: Seq[String], recovery: String)

  /** PARKED dirs hold old state a crashed pass moved OUT of the live
    * tree mid-swap — they must be restored (moved back where the live
    * twin is missing) before the lease clears, or the restore is lost.
    * Distinct from STAGING dirs (below), which are inert outputs. */
  private def parkedDirsUnder(layoutPath: String): Seq[String] = {
    val parkedNames = Set("mh_old_del", "postings_old_del", "cells_old_del",
      "shards_old_compact")
    Fs.listChildren(layoutPath).collect {
      case (name, true) if parkedNames.contains(name) => name
    }.sorted
  }

  /** STAGING dirs are half-built rewrite outputs (`.tmp-*`,
    * `*_delete_tmp`) — never read by any resolver, always rmTree'd by
    * the next attempt; safe to delete, listed for visibility only. */
  private def stagingDirsUnder(layoutPath: String): Seq[String] =
    Fs.listChildren(layoutPath).collect {
      case (name, true)
        if name.endsWith("_delete_tmp") || name.startsWith(".tmp-") => name
    }.sorted

  /** Inspect a layout's lease state — the crashed-lease operability
    * entry point (r18 "what's missing" #4): names the owner, stranded
    * candidates, parked dirs, and the recovery steps in one place
    * instead of scattered scaladoc. Read-only. */
  def inspect(layoutPath: String): LeaseStatus = {
    val m = marker(layoutPath)
    val owner =
      if (!Fs.exists(m)) None
      else Some(try {
        val content = Fs.readString(m)
        val lines = content.split("\n", -1).map(_.trim).filter(_.nonEmpty)
        (parse(content)._1, lines.drop(2).headOption.getOrElse(""))
      } catch { case _: java.io.IOException => ("?", "") })
    val cands = Fs.listChildren(layoutPath).collect {
      case (name, false) if name.startsWith(CandidatePrefix) => name
    }.sorted
    val parked = parkedDirsUnder(layoutPath)
    val staging = stagingDirsUnder(layoutPath)
    val recovery =
      if (owner.isEmpty && cands.isEmpty && parked.isEmpty)
        "layout is clean — no lease, no candidates, no parked dirs" +
          (if (staging.isEmpty) ""
           else "; staging dirs are inert leftovers, safe to delete")
      else if (parked.nonEmpty)
        "a pass crashed mid-swap: recover per the OWNING pass's crash " +
          "protocol — the parked dir's name names it (mh_old_del -> " +
          "deleteFromMinHashIndex, postings_old_del -> " +
          "deleteFromInvertedIndex, cells_old_del -> deleteFromIvfIndex: " +
          "move each parked subdir back where its live twin is missing; " +
          "shards_old_compact -> compactDistinctShards/compactQuantileShards: " +
          "keyed on its _install_complete marker — present means delete " +
          "the park, absent means restore; do NOT blanket-move that one " +
          "back). Staging dirs are safe to delete. THEN forceRelease and " +
          "re-run the pass with the same inputs"
      else if (owner.map(_._1).contains(WriterKind))
        "a writer crashed mid-batch: its staging dirs are inert and " +
          "the stream's own replay is the recovery path (it takes the " +
          "marker over) — restart the stream, or forceRelease if it is " +
          "being decommissioned"
      else
        "no parked dirs: the holder crashed outside a swap window (or " +
          "a candidate was stranded mid-acquisition) — verify no pass " +
          "or writer is live, then forceRelease; writers resume and " +
          "the pass can re-run"
    LeaseStatus(owner.map(_._1), owner.map(_._2), cands, parked, staging,
      recovery)
  }

  /** Operator recovery: clear the marker and any stranded acquisition
    * candidates — but REFUSES while parked dirs exist (clearing the
    * lease with a half-swapped layout would un-gate writers straight
    * into the wreckage; restore the parked dirs first, per
    * [[inspect]]'s recovery text). */
  def forceRelease(layoutPath: String): Unit = {
    val parked = parkedDirsUnder(layoutPath)
    require(parked.isEmpty,
      s"refusing to force-release $layoutPath: parked dirs present " +
        s"(${parked.mkString(", ")}) — a pass crashed mid-swap and they " +
        "hold displaced old state; restore them first " +
        "(MaintenanceLease.inspect describes how; inert staging dirs " +
        "never block this)")
    Fs.deleteIfExists(marker(layoutPath))
    Fs.listChildren(layoutPath).foreach {
      case (name, false) if name.startsWith(CandidatePrefix) =>
        Fs.deleteIfExists(s"$layoutPath/$name")
      case _ => ()
    }
  }
}
