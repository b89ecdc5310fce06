package graft.operators

import java.nio.file.{Files, Path, Paths}

/** Filesystem plumbing for index COMPACTION ([[Similarity.compactIvfIndex]],
  * [[Dedup.compactLshBandIndex]]): swap a freshly-written directory over the
  * one it replaces, and drop a tombstone table. Local-filesystem semantics
  * (the fixtures and bench artifacts live on local disk); on an object store
  * a production deployment would swap a manifest pointer instead of
  * renaming directories — the operator contract (rewrite live rows, retire
  * tombstones, single writer) is storage-independent.
  */
private[graft] object MaintenanceIo {

  /** Replace `dst` with `tmp`: delete the old directory, then an atomic
    * (same-volume) rename of the new one into place. Crash between the
    * two steps loses only the OLD copy — the new data survives at the tmp
    * path and the caller's next compaction re-runs; readers are excluded
    * by the single-writer maintenance contract.
    */
  def swapDir(tmp: String, dst: String): Unit = {
    deleteDir(dst)
    Files.move(Paths.get(tmp), Paths.get(dst))
  }

  def deleteDir(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      def rec(f: Path): Unit = {
        if (Files.isDirectory(f)) {
          val s = Files.list(f)
          try s.forEach(rec(_)) finally s.close()
        }
        Files.delete(f)
      }
      rec(p)
    }
  }
}
