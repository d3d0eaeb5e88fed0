package graft

/** JVM-exit removal of scratch directories. Operators that materialize
  * bench-local artifacts (memoized postings indexes, round-trip
  * format scratch) register their base dirs here; one shutdown hook
  * sweeps them so repeated apps in one JVM — and repeated JVMs on one
  * host — never accumulate parquet under /tmp. Deliberately
  * best-effort: a failed delete must not mask the app's own exit. */
object Cleanup {
  private lazy val queue = {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => q.forEach { base =>
      try java.nio.file.Files.walk(base)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case _: Throwable => }
    }))
    q
  }

  /** Registers `path` for recursive removal at JVM exit; returns it. */
  def onExit(path: java.nio.file.Path): java.nio.file.Path = {
    queue.add(path)
    path
  }
}
