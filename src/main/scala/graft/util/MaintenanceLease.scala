package graft.util

/** Single-writer enforcement for the persisted layouts' maintenance
  * passes. Every compact / expire / vacuum / index-delete documents the
  * same precondition — run inside a stopped-writer window — but until
  * now nothing ENFORCED it: a racing foreachBatch replay against a
  * mid-vacuum serving table would corrupt quietly instead of failing
  * loudly. The lease makes the violated precondition an error in both
  * directions:
  *
  *  - a maintenance pass ACQUIRES `_maintenance_lease` at the layout
  *    root before mutating (atomic create-if-absent — a concurrent
  *    second pass fails to acquire and stops);
  *  - every writer (serving upserts, index appends) checks the marker
  *    and refuses to write while it exists.
  *
  * The lease releases only on SUCCESS. A failed or crashed pass leaves
  * it in place deliberately: the layout may be mid-mutation (the parked
  * dirs / temp dirs say exactly where), and writers must stay blocked
  * until an operator recovers and removes the marker — the same loud-
  * over-quiet posture as the parked-dir crash protocol. Readers are NOT
  * gated: every layout's install order (manifest-last, park-first)
  * keeps concurrent reads consistent mid-pass.
  *
  * This is the plain-parquet reproduction of a table format's
  * commit-conflict detection (Delta/Iceberg reject the losing writer at
  * commit time); with no transaction log to race on, the marker file is
  * the smallest mechanism that turns a silent corruption into an error. */
object MaintenanceLease {

  private[graft] val MarkerName = "_maintenance_lease"

  private def marker(layoutPath: String) = s"$layoutPath/$MarkerName"

  /** Take the lease — atomic create-if-absent (`create(overwrite =
    * false)`, namenode-arbitrated on HDFS, so two concurrent passes
    * cannot both win); fails loudly if any holder — live or crashed —
    * still owns it. */
  private[graft] def acquire(layoutPath: String, owner: String): Unit =
    require(Fs.createExclusive(marker(layoutPath), s"$owner\n"),
      s"${marker(layoutPath)} exists — a maintenance pass is running or " +
        "crashed mid-run; recover the layout (see the pass's crash " +
        "protocol), then delete the marker")

  private[graft] def release(layoutPath: String): Unit =
    Fs.deleteIfExists(marker(layoutPath))

  /** Run one maintenance pass under the lease. Released only when
    * `body` SUCCEEDS — a throw leaves the marker as the loud signal
    * that the layout needs inspection before any writer resumes. */
  private[graft] def withLease[T](layoutPath: String, owner: String)(body: => T): T = {
    acquire(layoutPath, owner)
    val out = body
    release(layoutPath)
    out
  }

  private[graft] val WriterOwner = "writer"

  /** Writer-side lease, HELD for the duration of one write (a one-shot
    * check would leave the write's whole multi-job span exposed to a
    * pass acquiring right after it — r18 review #3). Ownership rules:
    *
    *  - marker absent → take it;
    *  - marker owned by a MAINTENANCE pass → fail loudly (writing now
    *    would race its renames);
    *  - marker owned by `writer` → TAKE OVER: it is this layout's
    *    single writer's own crashed prior attempt, and the replay now
    *    running IS the recovery path (foreachBatch re-delivers the
    *    batch; the layouts' id anti-joins / versioned assembly make it
    *    idempotent) — blocking it on its own wreckage would wedge the
    *    stream. Two concurrent writers are outside every layout's
    *    contract (one stream, one table), which is what makes the
    *    takeover read-then-proceed safe.
    *
    * Released on success OR failure: a failed write leaves no
    * half-mutated shared state (versions assemble in temp dirs,
    * appends are replay-absorbed), so unlike a maintenance pass there
    * is nothing for a lingering marker to guard. */
  private[graft] def withWriterLease[T](layoutPath: String,
      writer: String)(body: => T): T = {
    val m = marker(layoutPath)
    if (!Fs.createExclusive(m, s"$WriterOwner\n")) {
      val owner =
        try Fs.readString(m).trim catch { case _: java.io.IOException => "?" }
      require(owner == WriterOwner,
        s"$writer refused: $m exists (owner: $owner) — a maintenance " +
          "pass owns this layout (or crashed mid-run); writing now " +
          "would race its renames and corrupt the layout")
    }
    try body finally release(layoutPath)
  }
}
