package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem helpers for scratch-dir lifecycle. */
object Fs {

  /** Delete a directory tree, closing the walk stream (an unclosed
    * `Files.walk` leaks a directory stream per call — the bug class this
    * helper retires: the same try/finally boilerplate was copy-pasted at
    * a dozen scratch-cleanup sites and two copies leaked). Missing
    * entries are ignored (`deleteIfExists`), so concurrent cleanup and
    * absent paths are safe. */
  def deleteRecursively(dir: Path): Unit = {
    if (!Files.exists(dir)) return
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally walk.close()
  }
}
