package graft.util

import java.nio.file.{Files, Path}

/** Temp directories with JVM-exit cleanup. The per-dir `deleteOnExit` trick
  * doesn't recurse, so spool dirs (events conversion, ANN index, CSV
  * round-trips) would otherwise accumulate a scale-factor-sized copy in
  * /tmp on every Verify/Bench/fuzz invocation.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(p))
    }, "graft-tempdir-cleanup"))
  }

  /** Create a temp dir removed (recursively) at JVM exit. */
  def create(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively) finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: Exception => () } // best-effort at shutdown
  }
}
