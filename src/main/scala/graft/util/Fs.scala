package graft.util

/** Local-filesystem helpers shared by the persisted-layout writers
  * (serving tables, postings/IVF/MinHash indexes). One definition so a
  * future fix (symlink handling, error propagation) lands everywhere. */
object Fs {

  /** Recursive delete; ignores missing paths. */
  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Same-filesystem atomic move. */
  private[graft] def move(src: java.io.File, dst: java.io.File): Unit = {
    java.nio.file.Files.move(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}
