package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Crash-safe directory replacement for the incremental signature
  * stores (same bak-swap discipline as graft.engine.Catalog.overwrite,
  * but for standalone store directories outside any warehouse):
  * compacted data is staged to `<live>.tmp_`, the live dir steps aside
  * to `<live>.bak_`, the staged dir moves in, the backup drops. Every
  * open calls [[recover]] first so a crash in any window restores a
  * complete store — a half-written tmp (no _SUCCESS) is discarded, a
  * completed tmp is rolled forward, a stranded bak is rolled back.
  */
private[streaming] object StoreSwap {

  private def tmpOf(live: Path) = live.resolveSibling(live.getFileName.toString + ".tmp_")
  private def bakOf(live: Path) = live.resolveSibling(live.getFileName.toString + ".bak_")

  private def complete(dir: Path): Boolean =
    Files.exists(dir.resolve("_SUCCESS"))

  /** Restore the live dir after a crash mid-swap; drop stale staging. */
  def recover(live: Path): Unit = {
    val (tmp, bak) = (tmpOf(live), bakOf(live))
    if (!Files.exists(live)) {
      // roll FORWARD a finished compaction, else roll BACK to the backup;
      // a tmp without _SUCCESS is a partial write and must not go live
      if (Files.exists(tmp) && complete(tmp))
        Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
      else if (Files.exists(bak))
        Files.move(bak, live, StandardCopyOption.ATOMIC_MOVE)
    }
    deleteRecursively(tmp)
    deleteRecursively(bak)
  }

  /** Replace `live` with the (complete) contents staged at its tmp dir. */
  def swapIn(live: Path): Unit = {
    val (tmp, bak) = (tmpOf(live), bakOf(live))
    require(complete(tmp), s"staged store at $tmp has no _SUCCESS — refusing swap")
    if (Files.exists(live)) Files.move(live, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(bak)
  }

  def stagePath(live: Path): Path = tmpOf(live)

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(x => Files.delete(x))
      finally walk.close()
    }
}
