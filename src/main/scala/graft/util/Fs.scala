package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Filesystem helpers shared by the persisted-layout writers (serving
  * tables, postings/IVF/MinHash indexes), routed through the Hadoop
  * FileSystem API so every maintenance pass — compaction, retention,
  * vacuum, right-to-be-forgotten deletes — runs wherever the data
  * lives: local disk under test, HDFS or an object store behind an
  * `hdfs://`/`s3a://` path at 100 TB. Resolution follows the path's
  * own scheme against the active session's Hadoop conf, exactly how
  * Spark's parquet reader/writer resolves the same strings, so a
  * layout's data files and its manifests/markers always land on the
  * same filesystem.
  *
  * Atomicity note the commit protocols rely on: [[move]] is
  * `FileSystem.rename` — atomic on HDFS and on local disk (the two
  * substrates the rename-swap install requires it on). On object
  * stores rename is copy+delete; the layouts' manifest-last /
  * park-first orderings are what keep a non-atomic rename safe there
  * (a version without its manifest is never resolvable, a parked dir
  * fails the next run loudly). NOTHING here assumes an atomic
  * create-if-absent — `create(overwrite = false)` is check-then-write
  * on S3A and RawLocalFileSystem, so [[graft.util.MaintenanceLease]]
  * arbitrates with plain writes + listing instead (its write-then-list
  * candidate protocol needs only read-after-write consistency). One
  * definition so a future fix lands everywhere. */
object Fs {

  // memoized per session: newHadoopConf() clones the full SparkConf +
  // Hadoop conf, and the manifest-resolution helpers call into Fs once
  // per version dir — a per-call clone would mean hundreds of copies
  // per micro-batch on a long serving chain (r18 review #7). The cache
  // is a single (session, conf) pair, refreshed when the active
  // session changes; conf objects are read-only here.
  @volatile private var cachedConf:
      (org.apache.spark.sql.SparkSession, org.apache.hadoop.conf.Configuration) = null

  private def conf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession) match {
      case Some(s) =>
        val c = cachedConf
        if (c != null && (c._1 eq s)) c._2
        else {
          val fresh = s.sessionState.newHadoopConf()
          cachedConf = (s, fresh)
          fresh
        }
      case None => new org.apache.hadoop.conf.Configuration()
    }

  /** Drop the memoized conf — for callers that mutate the session's
    * Hadoop configuration after Fs has already been used (tests
    * registering a filesystem scheme; production code should set
    * Hadoop conf before touching any layout). */
  private[graft] def invalidateConfCache(): Unit = cachedConf = null

  private def fsOf(p: Path): FileSystem = p.getFileSystem(conf())

  /** Recursive delete; ignores missing paths. */
  private[graft] def rmTree(path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Test-only fault injection: invoked before every [[move]]. A spec
    * makes it throw after N calls to simulate a crash at each rename
    * boundary of a pass's swap protocol (MaintenanceRecoverSpec drives
    * every boundary of every parking pass through it); production
    * leaves the no-op. */
  @volatile private[graft] var beforeMove: (String, String) => Unit =
    (_, _) => ()

  /** Rename within one filesystem — the layouts' install primitive.
    * Fails loudly when the filesystem refuses (missing source, existing
    * destination on local FS): every caller's protocol depends on the
    * move having happened. */
  private[graft] def move(src: String, dst: String): Unit = {
    beforeMove(src, dst)
    val s = new Path(src)
    require(fsOf(s).rename(s, new Path(dst)),
      s"rename failed: $src -> $dst")
  }

  private[graft] def exists(path: String): Boolean = {
    val p = new Path(path); fsOf(p).exists(p)
  }

  private[graft] def isFile(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isFile
  }

  private[graft] def isDir(path: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  private[graft] def mkdirs(path: String): Unit = {
    val p = new Path(path); fsOf(p).mkdirs(p); ()
  }

  /** Child (name, isDirectory) pairs; empty if the path is missing. */
  private[graft] def listChildren(path: String): Seq[(String, Boolean)] = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(st => (st.getPath.getName, st.isDirectory))
  }

  /** Write a small UTF-8 control file (manifests, horizon markers),
    * replacing any existing one. */
  private[graft] def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val out = fsOf(p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def readString(path: String): String = {
    val p = new Path(path)
    val in = fsOf(p).open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  private[graft] def readLines(path: String): Seq[String] =
    readString(path).split("\n", -1).toSeq

  /** Non-recursive delete of one file; ignores missing paths. */
  private[graft] def deleteIfExists(path: String): Unit = {
    val p = new Path(path)
    val fs = fsOf(p)
    if (fs.exists(p)) { fs.delete(p, false); () }
  }
}
