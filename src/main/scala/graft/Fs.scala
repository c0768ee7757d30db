package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Leak-safe filesystem helpers. `Files.list`/`Files.walk` return
  * streams backed by an OPEN directory handle that is only released by
  * `close()` — draining the iterator does not release it, and relying
  * on GC finalization exhausts the FD ulimit in exactly the
  * long-running shapes this engine runs (the 1 Hz replication-feed
  * daemon, per-epoch sink manifests). Every directory listing in main
  * code goes through these, which close the stream eagerly. */
object Fs {
  /** List the direct children of `dir` (unsorted), closing the
    * directory handle before returning. Empty if `dir` is absent. */
  def children(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val b = Seq.newBuilder[Path]
      while (it.hasNext) b += it.next()
      b.result()
    } finally s.close()
  }

  /** Delete `p` and everything under it, closing the walk handle. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally s.close()
    }
}
