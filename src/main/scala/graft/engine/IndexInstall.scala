package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Crash-safe directory install for index relations (zone-map + bloom):
 * the caller writes the new relation at `<dir>.tmp`, then [[install]]
 * swaps it in via MOVE-ASIDE — the live dir becomes `<dir>.old`, the tmp
 * becomes live, the old copy is dropped — so the previous index survives
 * on disk until the new one is fully in place. A crash at any step leaves
 * a restorable state that [[heal]] (run under the writer's lock) repairs;
 * readers ride the two-rename window with [[waitReadable]]'s short retry
 * instead of mistaking a mid-swap index for a missing one.
 */
private[engine] object IndexInstall {

  private def tmpOf(dir: Path) = new Path(dir.getParent, dir.getName + ".tmp")
  private def oldOf(dir: Path) = new Path(dir.getParent, dir.getName + ".old")

  /** Swap `<dir>.tmp` (fully written by the caller) into place. */
  def install(fs: FileSystem, dir: Path): Unit = {
    val (tmp, old) = (tmpOf(dir), oldOf(dir))
    fs.delete(old, true)
    if (fs.exists(dir) && !fs.rename(dir, old))
      throw new java.io.IOException(s"index install: cannot move aside $dir")
    if (!fs.rename(tmp, dir)) {
      if (fs.exists(old)) fs.rename(old, dir) // put the live index back
      throw new java.io.IOException(s"index install: cannot install $tmp -> $dir")
    }
    fs.delete(old, true): Unit
  }

  /** Repair a crashed install (writer-lock holders only): live dir missing
    * with `.old` present means the crash hit between the two renames — the
    * `.tmp` (if present) is the COMPLETE new index (the swap only starts
    * after its write finished), else the old copy comes back. */
  def heal(fs: FileSystem, dir: Path): Unit = {
    val (tmp, old) = (tmpOf(dir), oldOf(dir))
    if (!fs.exists(dir) && fs.exists(old)) {
      if (fs.exists(tmp)) { fs.rename(tmp, dir); fs.delete(old, true): Unit }
      else { fs.rename(old, dir): Unit }
    }
  }

  /** Reader-side: does the index dir exist, riding a concurrent install's
    * sub-ms two-rename window with a short retry? False means genuinely
    * absent (never refreshed, or crashed mid-install — loud error /
    * "refresh first" territory for the caller). */
  def waitReadable(fs: FileSystem, dir: Path): Boolean = {
    var attempt = 0
    while (attempt < 4) {
      if (fs.exists(dir)) return true
      if (!fs.exists(oldOf(dir)) && !fs.exists(tmpOf(dir))) return false
      attempt += 1
      Thread.sleep(2L * attempt)
    }
    fs.exists(dir)
  }
}
