package graft

import java.nio.file.{Files, Path}

/** Temp-dir factory for the bounded-run harnesses (segment files,
  * punctuated streams, checkpoints, MVCC tables). Every dir is
  * registered for recursive deletion at JVM exit, so repeated
  * Verify/Bench cycles (best-of-3 runs each query 4×) don't
  * accumulate feed copies in /tmp until the box runs dry. */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      } catch { case _: Throwable => () }
    }
  }))

  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}
